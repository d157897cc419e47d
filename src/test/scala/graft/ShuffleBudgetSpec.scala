package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-volume regression pins for the most expensive gates at
  * sf0.01. Wall time on a busy 32-core box swings ±2× run to run, but
  * the BYTES a plan shuffles are a property of the plan — a lost
  * broadcast, an unpruned scan, or a candidate-set blowup shows up here
  * structurally even when seconds are pure noise.
  *
  * Budgets are ~1.5× the values measured when pinned (4-thread session,
  * shuffle.partitions=4, full memoized-model build included — these run
  * on a cold cache because no other suite touches sf0.01). A red here
  * means the plan changed shape, not that the machine was slow; the
  * lower bound guards the measurement itself (a near-zero reading means
  * the listener stopped seeing the gate's stages, or the gate stopped
  * doing its work).
  */
class ShuffleBudgetSpec extends GraftSuite {

  private val sf001 = "/root/testdata/sf0.01"

  private final class ShuffleBytes extends SparkListener {
    @volatile var write = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) write += m.shuffleWriteMetrics.bytesWritten
      }
  }

  /** gate -> (floor, budget) in shuffle-write bytes, for the STEADY-STATE
    * plan: each gate runs once unmeasured first, so per-(session, dir)
    * memoized builds (shared pair set, edge list, models) land outside
    * the measurement and the pin is independent of which tests ran
    * before. Budget = measured × 1.5; floor ≈ ⅓ — measured r7:
    * dbscan_sweep 86,112; dedup_groups 11,048; embed_pairs_lsh 745,133;
    * cc_components 533,975; scc_components 392,217;
    * dbscan_anonymize 463.
    *
    * embed_pairs_lsh's steady state became a pure checkpoint read when
    * round 7 memoized the shared pair graph, so for that gate the thing
    * worth guarding is the BUILD plan: its memo entry is evicted between
    * the warm and measured pass (QueryCache.evict), making the measured
    * pass re-run the banded LSH join the pin was taken from.
    */
  private val budgets: Seq[(String, (Long, Long))] = Seq(
    // round-9 re-pins after ConnectedComponents flipped to the skew-safe
    // combining form by default — measured: dbscan_sweep 86,327;
    // dedup_groups 4,296 isolated / 11,522 in-suite (AQE broadcast of
    // the combined per-src minima depends on what exchanges are already
    // materialized — budget spans both, like ivf_nprobe_curve);
    // cc_components 611,613 (up from 533,975); scc_components 439,050;
    // mst_forest 892,098
    "dbscan_sweep" -> (28000L, 130000L),
    "dedup_groups" -> (1400L, 17500L),
    "embed_pairs_lsh" -> (250000L, 1120000L),
    "cc_components" -> (200000L, 920000L),
    "scc_components" -> (145000L, 660000L),
    "dbscan_anonymize" -> (150L, 700L),
    // round-8 pins — measured: ann_ivf_clustered 13,773 (broadcast query
    // side + O(q·k) rank shuffle; a lost broadcast blows this up);
    // bm25_adhoc 34,397 (postings tf groupBy + per-doc sum, keyed)
    "ann_ivf_clustered" -> (4500L, 21000L),
    "bm25_adhoc" -> (11000L, 52000L),
    // round-9 pins (tools/ShuffleMeasure, same session shape) —
    // measured: bfs_hops 529,644 (per-round frontier join + anti-join);
    // triangles 38,945 (wedge join stays near-linear — a blown budget
    // here means the degree orientation broke); pagerank 645,479
    // (5 rounds × contribution join); lpa_communities 479,119;
    // kcore 218,831; span_dedup 407,827 (5-gram inventory groupBy +
    // keyed mark join); tfidf_topk 297,221. span_strip is NOT pinned:
    // its work is a projection count() prunes away.
    "bfs_hops" -> (175000L, 800000L),
    "triangles" -> (13000L, 59000L),
    "pagerank" -> (215000L, 970000L),
    "lpa_communities" -> (160000L, 720000L),
    "kcore" -> (73000L, 330000L),
    "span_dedup" -> (135000L, 615000L),
    "tfidf_topk" -> (99000L, 450000L),
    // round-8 continuation pins — measured: merge_upsert 6,602 (the one
    // doc_id-keyed merge window over snapshot+delta); zorder_key 718
    // (map-side-combined bucket groupBy over the codegen'd Morton key —
    // the floor catches the interleave collapsing to a constant).
    // NOT pinned: quality_lr is zero-shuffle by design (59-byte count
    // residue only), and bigram_score's model joins are left-outer
    // against distinct-keyed aggregates, which the distinct-keys rule
    // eliminates under the harness's count() — same reason as span_strip.
    "merge_upsert" -> (2200L, 10000L),
    "zorder_key" -> (230L, 1100L),
    // round-8 pipeline-gate pins — measured: overlap_matrix 18,874
    // (bitmask plan: ONE bit_or groupBy on the fused shingle-hash
    // kernel + the tiny mask-count agg; the self-join and collect_set
    // drafts measured 134k/95k bytes and 7× the wall time — a blown
    // budget here means the one-shuffle shape regressed);
    // cms_estimate 2,681 (d·w cell groupBy + exact top-K —
    // the sketch side must stay 1,024 cells regardless of vocab);
    // bloom_prefilter 2,287 (vocab distinct + eval left join — the
    // PROBE itself is a zero-shuffle broadcast-literal projection, which
    // the budget indirectly guards: a probe regression to a join would
    // blow it); bloom_bits 1,510 (bit_or word groupBy); length_curriculum
    // 496 (PrefixScan range partition + per-slice totals). NOT pinned:
    // mlm_mask is a pure projection (59-byte count residue), scd2_history
    // is one user-keyed window that column pruning removes under count(),
    // and validate_rows broadcasts the orders side into one agg pass.
    "overlap_matrix" -> (6000L, 29000L),
    "cms_estimate" -> (900L, 4100L),
    "bloom_prefilter" -> (760L, 3500L),
    "bloom_bits" -> (500L, 2300L),
    "length_curriculum" -> (160L, 760L),
    // round-8 final-batch pins — measured: funnel_steps 196,581 (one
    // user-keyed window shuffle carrying the staged funnel columns);
    // snapshot_diff 119,105 (full-outer key join of snapshot and delta);
    // rank_fusion 10,685 (two PrefixScan range shuffles + the doc_id
    // join); key_skew 1,969 (map-side-combined user groupBy +
    // TakeOrdered); source_trend 448 (tiny-key moment groupBy).
    // bpe_merges is pinned on its BUILD (memo evicted below; measured
    // 57,066): the 3-round fit's pair-count groupBys are the plan worth
    // guarding.
    // NOT pinned: cdc_chunks and mlm_mask are pure projections (59-byte
    // count residue), bpe_apply reads the memoized fit's checkpoint.
    "funnel_steps" -> (65000L, 295000L),
    "snapshot_diff" -> (40000L, 180000L),
    "rank_fusion" -> (3500L, 16000L),
    "key_skew" -> (650L, 3000L),
    "source_trend" -> (150L, 700L),
    "bpe_merges" -> (19000L, 86000L),
    // events-analytics pins — measured: event_transitions 199,220 (the
    // user-keyed lag window shuffle); retention_cohorts 30,900 (distinct
    // (user, day) + per-user min + the join back, all user-keyed)
    "event_transitions" -> (65000L, 300000L),
    "retention_cohorts" -> (10000L, 47000L),
    // max_concurrency 156,440: sessionize's user window + the delta
    // groupBy + PrefixScan's range partition
    "max_concurrency" -> (52000L, 235000L),
    // small-agg pins — anomaly_flags 3,559 (moment groupBy + user-keyed
    // join back); pivot_sources 1,059; ivm_agg 955 (the two partial
    // aggs + merge); dataset_fingerprint 448 (one commutative-sum
    // groupBy)
    "anomaly_flags" -> (1100L, 5400L),
    // decayed_engagement 1,743 (1-row as-of broadcast + keyed groupBy)
    "decayed_engagement" -> (580L, 2700L),
    // collocations 19,382 (unigram + pair groupBys, token-keyed joins)
    "collocations" -> (6400L, 30000L),
    // oov_rate 3,753 (vocab TakeOrdered + doc-keyed coverage agg; the
    // vocab side rides as a broadcast)
    "oov_rate" -> (1200L, 5700L),
    "pivot_sources" -> (350L, 1600L),
    "ivm_agg" -> (300L, 1500L),
    "dataset_fingerprint" -> (150L, 700L),
    // round-9 continuation pins — measured: winnow_pairs 687,973 (the
    // fingerprint inverted-index join + pair groupBy; a blown budget
    // means winnowing stopped sampling and the join sees all shingles);
    // modularity 515,135 (LPA rounds + the two label joins);
    // containment_pairs 232,264 (A-prefix × full-index candidate join +
    // merge-intersect verify, measured with the shared shingle-set memo
    // warm); skipgram_pairs 18,222 (map-side-combined pair groupBy +
    // TakeOrdered — the floor catches the zero-shuffle generation
    // regressing to per-pair rows); ann_refine 5,383 (O(q·RefineN)
    // candidate fetch + O(q·k) rank shuffle — corpus-size-independent by
    // construction); knn_graph 2,496 (memoized pair graph + id-keyed
    // rank window). winnow_fp is NOT pinned: pure projection (59-byte
    // count residue).
    "winnow_pairs" -> (270000L, 1250000L), // re-measured 814,977 with the
    // maxDf boilerplate cap (df groupBy + semi-restriction added)
    "modularity" -> (170000L, 775000L),
    "containment_pairs" -> (75000L, 350000L),
    "skipgram_pairs" -> (6000L, 28000L),
    "ann_refine" -> (1700L, 8100L),
    "knn_graph" -> (800L, 3800L),
    // lang_confusion 454 (one tiny-key confusion groupBy). edit_pairs is
    // NOT pinned: it reads the memoized pair set and its text joins
    // broadcast (59-byte count residue).
    "lang_confusion" -> (150L, 900L),
    // approx_quantile 837 (two tiny source-keyed aggs — the sketch rides
    // map-side; a blown budget means the rank cross-check's broadcast
    // regressed to a shuffle join)
    "approx_quantile" -> (270L, 1300L),
    // simhash_pairs 484 (band-key self-join of 500 fingerprints + the
    // distinct — fingerprints are one codegen'd projection, so the only
    // shuffled payload is (id, fp, band, key) rows)
    "simhash_pairs" -> (160L, 950L),
    // token_drift 11,605 (three token-keyed groupBys + the w-join of
    // pre-aggregated per-(source, token) counts + TakeOrdered)
    "token_drift" -> (3800L, 18000L),
    // round-10 pins — measured: basket_pairs 262,565 (the user-keyed
    // capped-basket self-join + map-side-combined pair groupBy; the item
    // supports ride as broadcasts — a blown budget means the cap or a
    // broadcast broke); block_pairs 21,491 (PrefixScan range partition +
    // the rank-bucket equi-join, fan-out exactly 2); compact_plan 10,363
    // (PrefixScan + the per-file manifest groupBy); degree_hist 1,745 and
    // assortativity 1,390 (keyed degree aggs over the memoized pair set;
    // the degree joins broadcast)
    "basket_pairs" -> (85000L, 395000L),
    // attribution 197,589 (the one user-keyed session window carrying the
    // staged columns + the (user, session)-keyed first/purchase joins)
    "attribution" -> (65000L, 300000L),
    // dsir_weights 110,622 (the (doc, bucket) count groupBy + per-doc
    // sum + the two 256-row bucket-count aggs; the weight table and the
    // lang attach ride as broadcasts, selection is TakeOrdered)
    "dsir_weights" -> (36000L, 170000L),
    // ppr_scores 595,658 (5 rounds x contribution join over the ε-graph,
    // same shape as pagerank; the seed flag rides the vertex table)
    "ppr_scores" -> (195000L, 900000L),
    // bool_retrieval 13,530 (the isin-filtered postings groupBy — one
    // keyed agg, no per-term scans); quantile_norm 17,825 (source-keyed
    // rank window + PrefixScan range partition + the grank equi-join)
    "bool_retrieval" -> (4500L, 21000L),
    "quantile_norm" -> (5900L, 27000L),
    // hash_embed 3,753 (the (doc, bucket) signed-count groupBy + the
    // per-doc fold — bounded at HashDim rows per doc)
    "hash_embed" -> (1200L, 5700L),
    // embed_drift 735 (two label-keyed meanPool aggs + the 10-row
    // count agg; the centroid joins broadcast)
    "embed_drift" -> (240L, 1200L),
    // lsh_recall 33,377 (the minhash banded build + the pair-set
    // semi-join; the brute side reads the shared PPJoin memo)
    "lsh_recall" -> (11000L, 50000L),
    // quality_auc 306 (the distinct-score count agg + PrefixScan range
    // partition + one global reduce; the rank table broadcasts)
    "quality_auc" -> (100L, 1400L),
    // item_recs 163,291 (basket_pairs' capped self-join + the
    // item-partitioned rank window over the symmetrized pair list)
    "item_recs" -> (54000L, 245000L),
    // q11_region_revenue 313 at sf0.01: every join fits broadcast at
    // gate scale, so the only shuffle is the 5-row nation agg — the
    // budget catches a broadcast regressing to a fact-table exchange
    "q11_region_revenue" -> (100L, 1500L),
    // hll_distinct 448 (one (source, bucket) register groupBy + the tiny
    // per-source fold — the sketch side is O(sources·64) by construction)
    "hll_distinct" -> (150L, 700L),
    "block_pairs" -> (7000L, 32000L),
    "compact_plan" -> (3400L, 16000L),
    "degree_hist" -> (580L, 2600L),
    "assortativity" -> (460L, 2100L),
    // round-8 closing pins — measured: link_predict 171,296 (the
    // center-keyed wedge join + pair groupBy + anti-join; a blown budget
    // means the wedge fan-out or the anti-join's key shape broke);
    // ks_test 4,321 (per-value parity groupBy + PrefixScan range
    // partition + TakeOrdered(1)); leakage_split 4,661 (the label join
    // + split-keyed distinct agg + the two doc-keyed pair joins over the
    // memoized jaccard graph)
    "link_predict" -> (56000L, 260000L),
    "ks_test" -> (1400L, 6600L),
    "leakage_split" -> (1500L, 7100L),
    // measured: q12_small_qty 25,224 (the per-part aggregate's one
    // l_partkey exchange; the join back rides a broadcast of the agg, so
    // the fact scan never shuffles — a regression to a fact-side
    // exchange blows this); vocab_growth 15,180 (bigram-keyed
    // first-occurrence groupBy + the 10-row decile agg); event_paths
    // 201,817 (the one user-keyed double-lag window + trigram groupBy);
    // profile_columns 310 (the melt is a projection — only the 4-key
    // profile agg shuffles; a blown budget means the one-scan melt
    // regressed to per-column scans)
    "q12_small_qty" -> (8400L, 38000L),
    "vocab_growth" -> (5000L, 23000L),
    "event_paths" -> (67000L, 305000L),
    "profile_columns" -> (100L, 1500L),
    // attribution_multi 197,574 (the user-keyed session window + the
    // (user, session) position window + purchase join — same order as
    // attribution); robust_scale 15,123 (two source-keyed rank windows;
    // the 20-row median table broadcasts back)
    "attribution_multi" -> (65000L, 300000L),
    "robust_scale" -> (5000L, 23000L),
    // doc_novelty 15,783 (the bigram-keyed first-occurrence groupBy +
    // bigram-keyed join back + doc-keyed agg — all three keyed)
    "doc_novelty" -> (5200L, 24000L),
    // mrr_eval 21,269 (the filtered (term, doc) postings groupBy + the
    // 3-row qrel broadcasts — a blown budget means the term filter
    // stopped pruning the explode); calibration_bins 4,449
    // (distinct-score count agg + PrefixScan range partition + the
    // 10-key bin agg; the rank table broadcasts)
    "mrr_eval" -> (7000L, 32000L),
    "calibration_bins" -> (1400L, 6700L),
    // tau_sweep 552 (four filter legs over the memoized pair set — the
    // tiny residue IS the point: the sweep pays no second candidate
    // join); dup_size_hist 9,819 (label join + two keyed aggs over the
    // memoized components); ivf_nprobe_curve 4,448 (four bucket
    // equi-join probes + O(q·k) rank shuffles — candidate work stays
    // bucket-bounded per leg)
    "tau_sweep" -> (180L, 850L),
    "dup_size_hist" -> (3200L, 15000L),
    // measured 4,448 isolated / 7,222 in-suite (exchange reuse of the
    // brute/probe subplans differs by context) — budget spans both
    "ivf_nprobe_curve" -> (1400L, 11000L),
    // q13_order_dist 12,870 (the customer-keyed left-join agg + the
    // count-domain histogram agg — two keyed exchanges);
    // session_bounce 197,589 (the one user-keyed session window +
    // (user, session) agg, same order as attribution);
    // lsh_precision 1,148 re-pinned in round 12: the full-range MinHash
    // multipliers (Dedup.minhashPerms) killed the min-dominator band
    // collisions, so the candidate stream dropped ~176k → 30 pairs at
    // sf0.01 and the banded self-join + distinct shuffles an order of
    // magnitude less — a blown budget means the band geometry regressed
    // toward the old spurious-collision regime
    "q13_order_dist" -> (4200L, 20000L),
    "session_bounce" -> (65000L, 300000L),
    "lsh_precision" -> (350L, 2400L),
    // moving_window 2,247 ((user, day) daily agg + the user-keyed RANGE
    // window); resample_ffill 354 (capped users: the daily agg + fill
    // window ride the tiny exchange, the day spine is a broadcast)
    "moving_window" -> (740L, 3400L),
    "resample_ffill" -> (110L, 550L),
    // gini_sources 455 (the tiny-key source groupBy; the rank triangle
    // join rides a broadcast of the 20-row aggregate)
    "gini_sources" -> (150L, 700L),
    // rfm_scores 4,266 (the user-keyed purchase agg + three PrefixScan
    // range partitions + the user-keyed score joins)
    "rfm_scores" -> (1400L, 6400L),
    // rank_corr 566 (two distinct-value count aggs + PrefixScan range
    // partitions + one global moment agg; both rank tables broadcast)
    "rank_corr" -> (180L, 900L),
    // dedup_rate 448 (the label join over the memoized components +
    // the tiny-key source agg)
    "dedup_rate" -> (140L, 700L),
    // eigencentrality 186,719 (3 integer walk-count rounds — one
    // edge-keyed join + map-side-combined sum each — over the memoized
    // ε-edge checkpoint; the max normalizer is a 1-row broadcast);
    // ndcg_eval 35,829 (filtered postings groupBy + the two k-bounded
    // top-k aggs — a blown budget means the partial top-k regressed to a
    // full per-term sort); phrase_match 215 (three filtered positional
    // posting legs joined on (doc, start) — at gate scale every leg
    // broadcasts, so only the per-doc hit count shuffles)
    "eigencentrality" -> (62000L, 280000L),
    "ndcg_eval" -> (12000L, 54000L),
    "phrase_match" -> (70L, 330L),
    // TPC-H-shape batch: q14_promo 46 / q19_disjunct 46 (single-row
    // global aggs — the fact⋈part join broadcasts at gate SF, so only
    // the 1-row partial-agg exchange shuffles); q15_topsupp 2,910 (the
    // supplier revenue agg; the max is a 1-row broadcast); q18_large
    // 132,514 (the per-order quantity agg is the gate's real shuffle —
    // a blown budget means the HAVING stopped pruning before the
    // join-back); q22_balance 13,195 (the per-customer order-count agg
    // + the customer-keyed left join; the (Σ,n) threshold pair is a
    // 1-row broadcast)
    // clustering_coeff 63,677 (degree agg + the degree-ordered wedge
    // join from triangles over the memoized ε-edges — a blown budget
    // means the wedge orientation stopped pruning); epoch_shuffle 496
    // (two PrefixScan range partitions of (doc, epoch-hash) keys; at
    // gate scale the per-(partition, epoch) totals dominate)
    "clustering_coeff" -> (21000L, 96000L),
    "epoch_shuffle" -> (160L, 800L),
    "q14_promo" -> (15L, 120L),
    "q15_topsupp" -> (950L, 4400L),
    "q18_large" -> (44000L, 200000L),
    "q19_disjunct" -> (15L, 120L),
    "q22_balance" -> (4400L, 20000L),
    // q16_suppcnt 3,418 (two-phase countDistinct partials on
    // (brand, size, suppkey); the exclusion list is broadcast, the
    // part join broadcasts at gate SF); q20_excess 37,189 (the two
    // partkey-keyed quantity aggs — a blown budget means the semi
    // chain started shuffling the fact table twice); q21_waiting
    // 803,125 (the distinct (order, supplier) sets + orderkey-keyed
    // semi/anti joins — a blown budget means one of the EXISTS legs
    // regressed past line-level dedup)
    "q16_suppcnt" -> (1100L, 5200L),
    "q20_excess" -> (12000L, 56000L),
    "q21_waiting" -> (260000L, 1210000L),
    // chi2_test 2,026 (the (lang, source) cell groupBy; marginals are
    // tiny-key broadcasts); fk_orphans 230 (seven 1-row audit aggs —
    // the joins broadcast at gate SF); matryoshka_recall 59 (both
    // top-k legs are broadcast crossJoins + O(queries·k) TopKAgg
    // partials — a blown budget means a ranking regressed to a
    // corpus-wide sort)
    "chi2_test" -> (650L, 3100L),
    "fk_orphans" -> (70L, 400L),
    "matryoshka_recall" -> (15L, 300L),
    // skip_stats 4,110 (two ≤4096-key zone-map groupBys; the probe
    // join is a broadcast — a blown budget means a zone map stopped
    // combining map-side)
    "skip_stats" -> (1300L, 6200L),
    // harmonic_centrality 478,509 (the per-(seed, id) BFS state over
    // the radius-8 fixpoint rounds — k·V bounded by the 16-seed cap
    // and the radius bound; a blown budget means a cap stopped
    // applying or a frontier stopped anti-joining against visited)
    "harmonic_centrality" -> (150000L, 720000L),
    // avg_precision 444 (one packed PrefixScan range partition of
    // (rank, Σpos) plus the per-(partition, group) totals); reciprocity
    // 41,700 (the distinct edge set + the reversed-edge semi-join over
    // the memoized ε-edges)
    "avg_precision" -> (140L, 700L),
    "reciprocity" -> (13000L, 63000L),
    // lateness_hist 144,415 (the user-keyed running-max window's hash
    // exchange of (user, arrival, us) — a blown budget means the
    // window went global or stopped pruning columns)
    "lateness_hist" -> (45000L, 220000L),
    // jw_pairs 377 (the (noun, initial)-keyed block self-join + the
    // 8-key map-side-combined ppm agg; the Jaro-Winkler scoring itself
    // is a zero-shuffle codegen projection — a blown budget means the
    // blocking join degenerated toward all-pairs)
    "jw_pairs" -> (120L, 800L),
    // corr_matrix 159 (ONE map-side-combined 15-moment agg — the whole
    // matrix is a single 1-row partial-agg exchange; a blown budget
    // means the one-scan moment pass split into per-pair scans);
    // mutual_info 2,026 (the (lang, source) cell groupBy; marginals
    // broadcast — same shape and measurement as chi2_test)
    "corr_matrix" -> (50L, 800L),
    "mutual_info" -> (650L, 3100L),
    // hilbert_key 736 (one map-side-combined 64-bucket groupBy over the
    // codegen'd key; a blown budget means the key stopped folding into
    // the scan projection or the agg lost its partial combine)
    "hilbert_key" -> (240L, 1200L),
    // cube_counts 1,812 (Spark's Expand feeds ALL four grouping sets
    // through ONE partial agg, so the exchange carries only the grouped
    // partials — a blown budget means the cube re-scanned per grouping)
    "cube_counts" -> (600L, 2800L),
    // heavy_hitters 1,466 (the MG candidates' distinct + the token-keyed
    // exact recount agg, both map-side-combined; the token stream itself
    // never shuffles — a blown budget means the semi-join stopped
    // broadcasting and pushed the corpus through an exchange)
    "heavy_hitters" -> (480L, 2300L),
    // rand_walks 26,618 (the gate's vertex-set distinct + outVerts
    // distinct + RwSteps map-side-combined per-walk argmin aggs; the
    // frontier broadcasts both the move join and the stay anti-join — a
    // blown budget means the edge list started shuffling per step)
    "rand_walks" -> (8800L, 40000L),
    // mst_forest 807,441 (the canonical collapse of the ε-pair set +
    // per-round per-component argmin partials + the contracted-graph
    // collapses; the working edge set shrinks geometrically, so later
    // rounds are marginal — a blown budget means contraction stopped
    // shrinking the graph and rounds went edge-scale)
    "mst_forest" -> (300000L, 1340000L),
    // single_linkage 658,627 / hdbscan_stability 3,040,893 (both read
    // the memoized forest; the measured cost is the batched union-CC
    // over 2 / 8 namespaced cut legs — per-leg input is only the V−1
    // forest edges, so the volume is fixpoint rounds × legs, not pair
    // count; a blown budget means a cut leg started walking the pair
    // set instead of the forest)
    "single_linkage" -> (220000L, 990000L),
    "hdbscan_stability" -> (1000000L, 4600000L),
    // hdbscan_extract 143,807 steady-state over the memoized cut-sweep
    // components (per-cut size agg + the per-label death window + the
    // membership joins — all O(labels) or V-bounded; a blown budget
    // means the condensed-tree build started re-walking the sweep)
    "hdbscan_extract" -> (48000L, 216000L),
    // mreach_extract 35,514 steady-state — same extraction over the
    // smaller mutual-reachability sweep (non-core points never enter)
    "mreach_extract" -> (11000L, 54000L),
    // hdbscan_outliers 156,458 steady-state over the memoized sweep
    // (per-point attach/leaf windows + the per-label subtree-min agg —
    // a blown budget means the score went beyond the V-bounded table)
    "hdbscan_outliers" -> (52000L, 235000L),
    // kcenter_coreset 236 (k−1 zero-shuffle scans + TakeOrdered(1)
    // argmins — a blown budget means a round regressed to a join or a
    // corpus sort); mix_temperature 494 (tiny-key source agg + 1-row
    // total broadcast); group_quantiles 470 (HLL domain-guard agg + the
    // two ≤|groups|-row map-agg exchanges — a blowup means the exact
    // path's value→count map went value-scale)
    "kcenter_coreset" -> (70L, 1100L),
    "mix_temperature" -> (160L, 750L),
    "group_quantiles" -> (150L, 710L),
    // hits_scores 24,824 (2 rounds × two edge-keyed joins + two
    // map-side-combined sums over the memoized ε-edges; the max
    // normalizers are a 1-row broadcast — a blown budget means a
    // vertex-keyed left join started exchanging the edge list);
    // k_anon_audit 279 (≤|QI-domain|-key groupBy + 5-key rollup);
    // kendall_tau 435 (one source agg; the 190-pair join broadcasts)
    "hits_scores" -> (8000L, 38000L),
    "k_anon_audit" -> (90L, 450L),
    "kendall_tau" -> (140L, 660L),
    // equidepth_hist 1,799 (boundary agg partials + final (group,
    // bucket) partials; the bucketing join broadcasts — a blown budget
    // means rows started shuffling toward an ntile-style window)
    "equidepth_hist" -> (600L, 2800L),
    // round-9 additions — measured: ktruss 215,824 (two degree-ordered
    // triangle enumerations + edge-keyed support counts; the second
    // round runs on the peeled set — a blown budget means the
    // orientation broke or peeling stopped shrinking the input);
    // graph_diameter 24,783 (CC rollup over the memoized near-dup
    // components + two short frontier-BFS sweeps — per-round volume is
    // frontier-sized, bounded by the component diameter being measured);
    // nbr_pool 23,482 (the id-keyed code join + (id, dim)-keyed sum +
    // id rollup — fan-out bounded at KnnK·dim by construction)
    "ktruss" -> (72000L, 325000L),
    "graph_diameter" -> (8000L, 38000L),
    "nbr_pool" -> (7800L, 36000L),
    // stress_centrality 312,880 (3 σ-BFS rounds — per-(seed, id) sum +
    // anti-join, all keyed — plus the id-keyed σ self-join; the
    // seed-pair distance table broadcasts. A blown budget means the
    // radius/seed caps stopped bounding the σ state or the middle
    // join's fan-out); kn_counts 19,747 (unigram + bigram + the two
    // type-count groupBys — the count tables join onto the broadcast
    // 50-row top list, so a blowup means that direction flipped)
    "stress_centrality" -> (104000L, 470000L),
    "kn_counts" -> (6500L, 30000L),
    // core_distance 64,473 (ONE ε-ball-bounded rank-window exchange over
    // the memoized pair set — a blown budget means the window went
    // global); mreach_mst pins the BUILD (memo evicted below): the
    // core-distance window + the two core joins + the weighted-boruvka
    // contraction rounds
    // measured: core_distance 64,473; mreach_mst build 359,021
    "core_distance" -> (21000L, 97000L),
    "mreach_mst" -> (120000L, 540000L),
    // mreach_stability reads the memoized mreach forest like
    // hdbscan_stability reads the raw one — the measured cost is the
    // 8-leg batched union-CC sweep; density_outliers is the k-NN rank
    // window + two core joins + id rollup over the memoized pair set
    // measured: mreach_stability 329,055 (the restricted graph's forest
    // is smaller than the raw one, so the sweep shuffles ~9× less than
    // hdbscan_stability); density_outliers 58,685
    "mreach_stability" -> (110000L, 495000L),
    "density_outliers" -> (19000L, 89000L),
    // bucket_join steady state 2,038 bytes — ONLY the final 5-key
    // aggregate's partials; the fact-table join itself shuffles ZERO
    // bytes because both inputs read the co-located bucket layout. A
    // blown budget means the join started re-shuffling an input — the
    // exact regression bucketing exists to prevent at 100 TB.
    "bucket_join" -> (600L, 3100L),
    // term_burstiness 159,080 (the (doc, token) count groupBy + the
    // token-keyed three-moment agg + TakeOrdered — a blown budget means
    // the moment pass stopped combining map-side). readability is NOT
    // pinned: pure per-row projection (59-byte count residue).
    "term_burstiness" -> (52000L, 240000L),
    // round-10 pins — measured: semdedup 268 (re-measured identical in
    // round 11 after the triangle-blocking guard: at this SF every
    // bucket fits one slice, so the blocked join degenerates to the
    // plain two-sided form; a blown budget means the cluster-bounded
    // pair join started exchanging the corpus);
    // ari_clusterings 46 (two broadcast-kernel assignments + contingency
    // groupBy partials + 1-row scalars); unimax_alloc 1,427 (the
    // per-source token groupBy + the |sources|-row window exchange)
    "semdedup" -> (80L, 410L),
    "ari_clusterings" -> (15L, 70L),
    "unimax_alloc" -> (470L, 2200L),
    // cluster_purity 1,502 (label join + contingency groupBy + the
    // k·|labels|-row rank window)
    "cluster_purity" -> (500L, 2300L),
    // minhash_err 620 re-pinned in round 12 (was 11,817 under the weak
    // small-multiplier permutations — the spurious-collision candidate
    // stream WAS the shuffle): band-key candidate equi-join + the four
    // id-keyed signature/shingle-set joins over the now-30-pair stream;
    // a blown budget means candidates exploded again
    "minhash_err" -> (200L, 1300L),
    // hard_negatives 2,737 (bucket-probe candidate join + label joins +
    // the per-query rerank window over the TopK·4-bounded stream);
    // rrf_fusion 2,737 (same probe machinery + the id-keyed quality join
    // and two per-query rank windows over the pool — a blown budget
    // means a ranking went corpus-global)
    "hard_negatives" -> (900L, 4200L),
    "rrf_fusion" -> (900L, 4200L),
    // ccnet_buckets 4,695 (surprisal model groupBys + the PrefixScan
    // range partition + the 3-row bucket rollup)
    "ccnet_buckets" -> (1500L, 7100L),
    // round-11 privacy audits over the memoized model — l_diversity
    // 4,599 isolated / 7,648 in-suite (like dedup_groups, the partial
    // distinct-count's exchange shape depends on what AQE already has
    // materialized when the suite reaches it — budget spans both);
    // t_closeness 33,312 (ONE scan of the published table into the
    // checkpointed contingency table; sizes/global/total all roll up
    // from it and the grid joins broadcast — a blown budget means the
    // grid started shuffling the published table itself)
    "l_diversity" -> (1500L, 11500L),
    "t_closeness" -> (11000L, 50000L),
    // round-12 continuous-ingest dedup — the stateful banding BUILD
    // (memo evicted): signature/band-key projection into the (band, key)
    // groupByKey exchange + the two id-keyed verify joins; ~799k at
    // sf0.01 (the band routing rows carry the key prefixes). A blown
    // budget means the routing rows fattened (e.g. full key vectors
    // again) or the verify joins stopped being id-keyed.
    "dedup_stream" -> (260000L, 1600000L),
    // its sign-band sibling over the embeddings (64 bands of 5 bits →
    // more routing rows per item than the 16-band text geometry);
    // ~2.67M at sf0.01, same blow-up semantics
    "embed_stream" -> (900000L, 5400000L),
    // round-13 capped-store gate: dedup_stream's banding + verify build
    // plus the overflow-recovery blocked self-join (size agg + the
    // (band, key, slice) equi-join over the overflow rows). Measured
    // 383k with the MinHash side table memoized by its sibling's pin;
    // the roof covers the standalone build (sibling semantics, ~850k)
    "dedup_stream_capped" -> (130000L, 1700000L),
    // round-14 ml gates — measured: ml_pipeline 59 B (the fitted
    // PipelineModel's transform: the 2k-row assignment join BROADCASTS,
    // so steady state is near-shuffle-free — a lost broadcast reads
    // ~300 KB and trips the roof), ml_kmeans_model 268 B (stateless
    // frozen-centroid kernel projection + the 8-row cluster agg)
    "ml_pipeline" -> (10L, 2000L),
    "ml_kmeans_model" -> (80L, 1500L))

  /** Memo keys to evict after the warm pass so the measured pass runs the
    * gate's build plan instead of reading a checkpoint. dedup_groups
    * keeps its PAIR memo (pinned pre-memo measurement included CC over
    * memoized pairs) but rebuilds the component labels. */
  private val evictBeforeMeasure: Map[String, String] =
    Map("embed_pairs_lsh" -> graft.queries.VectorQueries.EmbPairsKey,
      "dedup_groups" -> graft.queries.TextQueries.JaccardCompKey,
      "bpe_merges" -> graft.queries.PipelineQueries.BpeFitKey,
      "lpa_communities" -> graft.queries.ClusterQueries.LpaKey,
      "modularity" -> graft.queries.ClusterQueries.LpaKey,
      // the forest memo (round 9): the pin was taken from the boruvka
      // build; single_linkage/hdbscan_stability read the memoized forest
      "mst_forest" -> graft.queries.ClusterQueries.MstKey,
      // the cut-sweep component memo (round 11): hdbscan_stability's pin
      // was taken from the 8-leg batched union-CC, which now lives
      // behind StabCompKey shared with hdbscan_extract — rebuild it so
      // the pin still measures the sweep; hdbscan_extract pins the
      // steady-state read (memo kept)
      "hdbscan_stability" -> graft.queries.ClusterQueries.StabCompKey,
      "mreach_stability" -> graft.queries.ClusterQueries.MreachCompKey,
      // the mutual-reachability forest memo: pin the core-distance +
      // weighted-boruvka build, not the checkpoint read
      "mreach_mst" -> graft.queries.ClusterQueries.MreachKey,
      // the stateful band-pair memos (round 12): pin the banding +
      // verify builds, not the checkpoint reads
      "dedup_stream" -> graft.queries.TextQueries.StreamPairsKey,
      "embed_stream" -> graft.queries.VectorQueries.EmbStreamKey,
      "dedup_stream_capped" -> graft.queries.TextQueries.StreamCappedKey)

  for ((q, (lo, hi)) <- budgets)
    test(s"$q shuffle-write volume stays within budget at sf0.01") {
      // warm pass: memoized builds + codegen land here, outside the pin
      SparkEntry.queries(q)(spark, sf001).count()
      evictBeforeMeasure.get(q)
        .foreach(graft.core.QueryCache.evict(_, spark, sf001))
      val l = new ShuffleBytes
      spark.sparkContext.addSparkListener(l)
      try {
        SparkEntry.queries(q)(spark, sf001).count()
        // listener delivery is async: poll until THREE consecutive reads
        // agree — one quiet 50ms window can fall inside a bus stall and
        // undercount
        var prev = -1L
        var stable = 0
        var i = 0
        while (i < 80 && stable < 3) {
          if (l.write == prev) stable += 1 else { stable = 0; prev = l.write }
          Thread.sleep(50); i += 1
        }
        info(s"$q shuffle_write=${l.write}")
        assert(l.write >= lo,
          s"$q shuffle write ${l.write} below floor $lo — measurement " +
            "broke or the gate degenerated")
        assert(l.write <= hi,
          s"$q shuffle write ${l.write} over budget $hi — plan regression " +
            "(lost broadcast? unpruned scan? candidate blowup?)")
      } finally spark.sparkContext.removeSparkListener(l)
    }
}
