package graft.queries

import graft.core.Tables.table
import graft.functions.{PolyHash, TextFunctions => TF}
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication gate queries on the `documents` table.
  *
  * Every hashed operator builds on [[PolyHash]], whose DuckDB mirror is
  * the `list_reduce` formula in [[sqlPolyHash]] — so MinHash/SimHash/
  * fingerprint results are value-level oracle-checked, not rows-only.
  * The oracle SQL is *generated from the same Scala constants* (permutation
  * coefficients, band layout, stopword lists) to keep the two engines in
  * lockstep by construction.
  */
object TextQueries {
  private val ShingleN = 2
  private val SpanN = 5
  private val TfidfTopN = 5
  private val JaccardTau = 0.3
  private val Bands = 16
  private val Rows = 4
  private val P = PolyHash.Prime
  /** tau_sweep threshold grid (all ≥ the JaccardTau candidate floor). */
  private val TauGrid = Seq(0.3, 0.4, 0.5, 0.6)
  private val QualityMin = 0.5
  private val SeqLen = 2048
  private val ChunkLen = 16
  private val ChunkStride = 12
  private val IncrSplit = 400
  private val Bm25Terms = Seq("spark", "merge", "window")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25TopN = 15
  private val ContamTau = 0.05
  /** phrase_match query phrase (positional-index intersection). */
  private val Phrase = Seq("row", "column", "sort")
  /** ndcg_eval ranking depth (top-K cut of the per-term postings). */
  private val NdcgK = 10
  /** ndcg_eval rank discounts 1/log2(rank+1) for ranks 1..NdcgK, baked
    * once in Scala and injected into BOTH engines as literals — the gate
    * never evaluates a transcendental at query time, so engine libm
    * differences can't produce an ulp split. */
  private val NdcgDiscounts: Seq[Double] =
    (1 to NdcgK).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  private val ContainTau = 0.9
  private val WinnowW = 4
  /** block_pairs sorted-neighborhood window size. */
  private val BlockW = 4
  /** hash_embed feature-hashing dimensionality. */
  private val HashDim = 64
  private val WinnowShare = 10L
  /** winnow_pairs boilerplate-fingerprint cap (df ≤ cap survives the
    * index). A no-op at the sf0.01 oracle SF (max fingerprint df 43) —
    * the cap exists for the JOIN's sake at larger SFs, where this
    * tiny-vocab corpus floods the index with corpus-wide fingerprints. */
  private val WinnowMaxDf = 50L
  private val SimhashMaxHam = 3

  // ------------------------------------------------------- SQL fragments

  /** DuckDB mirror of PolyHash.hash over an expression `e`. */
  private[queries] def sqlPolyHash(e: String): String =
    s"""CASE WHEN length($e) = 0 THEN 0 ELSE
       | list_reduce(list_transform(range(1, length($e) + 1),
       |   i -> CAST(ord(substr($e, i, 1)) AS BIGINT)),
       |   (acc, c) -> (acc * 31 + c) % $P) END""".stripMargin

  /** Tokens CTE fragment: doc_id, text, t (whitespace tokens). */
  private[queries] val sqlToks =
    """toks AS (SELECT doc_id, text,
      |  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |       ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents)""".stripMargin

  /** Distinct word-bigram shingles: doc_id, s. */
  private val sqlShingles =
    s"""sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(t) < $ShingleN
       |      THEN CAST([] AS VARCHAR[])
       |      ELSE list_transform(range(1, len(t) - ${ShingleN - 2}),
       |        i -> t[i] || ' ' || t[i + 1]) END) AS s
       |  FROM toks))""".stripMargin

  /** Winnowing selection CTE chain (toks → ordered shingle hashes →
    * per-start window-min → distinct encoded picks): ends at
    * `sel(doc_id, enc)`, shared by the winnow_fp and winnow_pairs
    * oracles. Same enc = h·2^20 + (2^20-1-pos) encoding as the engine. */
  private def sqlWinnowSel =
    s"""$sqlToks,
       |shl AS (SELECT doc_id, CASE WHEN len(t) < $ShingleN
       |    THEN CAST([] AS VARCHAR[])
       |    ELSE list_transform(range(1, len(t) - ${ShingleN - 2}),
       |      i -> t[i] || ' ' || t[i + 1]) END AS ss
       |  FROM toks),
       |hh AS (SELECT doc_id, list_transform(ss, s -> ${sqlPolyHash("s")})
       |    AS hs FROM shl),
       |seq AS (SELECT doc_id, unnest(range(0, len(hs))) AS p,
       |    unnest(hs) AS h, len(hs) AS m FROM hh WHERE len(hs) > 0),
       |win AS (SELECT doc_id, p, m,
       |    min(h * 1048576 + (1048575 - p)) OVER (PARTITION BY doc_id
       |      ORDER BY p ROWS BETWEEN CURRENT ROW
       |      AND ${WinnowW - 1} FOLLOWING) AS enc
       |  FROM seq),
       |sel AS (SELECT DISTINCT doc_id, enc FROM win
       |  WHERE p <= greatest(m - $WinnowW, 0))""".stripMargin

  /** Distinct shingle hashes: doc_id, h (set semantics on the HASH —
    * collisions collapse, exactly like the fused Spark kernel). */
  private def sqlShingleHashes =
    s"""shh AS (SELECT DISTINCT doc_id, ${sqlPolyHash("s")} AS h FROM sh)""".stripMargin

  // --------------------------------------------------------- the queries

  private def docs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")

  /** jaccard_pairs and dedup_groups walk the same near-dup pair set —
    * computed once per (session, dir), eagerly checkpointed, shared via
    * [[graft.core.QueryCache]]. */
  private[graft] val JaccardPairsKey = "text.jaccardPairs"
  private def sharedJaccardPairs(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(JaccardPairsKey, s, dir) {
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", ShingleN, JaccardTau,
        setsOpt = Some(sharedShingleSets(s, dir)))
        .localCheckpoint()
    }

  /** The per-doc rarity-ordered shingle-set table (Dedup.shingleSets)
    * that jaccard_pairs' and containment_pairs' candidate joins and
    * exact verifies all walk — one extraction + df aggregation per
    * (session, dir) instead of one per pair surface. */
  private[graft] val ShingleSetsKey = "text.shingleSets"
  private def sharedShingleSets(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(ShingleSetsKey, s, dir) {
      Dedup.shingleSets(docs(s, dir), "doc_id", "text", ShingleN)
        .localCheckpoint()
    }

  /** The per-doc MinHash side table (id, sig, hash-sorted shs): ONE pass
    * of the shingle/signature kernels — the estimator family's expensive
    * step, previously recomputed once for the banding and once per pair
    * side — shared by minhash_err and lsh_precision. Band keys are cheap
    * slice folds over `sig`; the signature agreement and exact-Jaccard
    * verify read the same checkpoint. (A signature table computed once
    * and reused across tuning runs is also what a real pipeline
    * materializes.) */
  private[graft] val MinhashSideKey = "text.minhashSide"
  private def sharedMinhashSide(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(MinhashSideKey, s, dir) {
      docs(s, dir).select(col("doc_id").as("id"),
          graft.functions.TextKernels.shingle_hashes(col("text"),
            lit(ShingleN)).as("sh"))
        .where(size(col("sh")) > 0)
        .select(col("id"),
          graft.functions.TextKernels.minhash_sig(col("sh"), Bands * Rows)
            .as("sig"),
          sort_array(col("sh")).as("shs"))
        .localCheckpoint()
    }

  /** dedup_stream's verified pair set (stateful banding + exact verify),
    * memoized like the other one-per-ingest builds. */
  private[graft] val StreamPairsKey = "text.streamBandPairs"

  /** dedup_stream_capped's verified pair set (capped store + overflow
    * recovery union), memoized the same way. */
  private[graft] val StreamCappedKey = "text.streamCappedPairs"

  /** dedup_stream_capped's deliberately tiny hot-bucket cap: below the
    * text geometry's measured bucket maxima at every SF (3-18 members,
    * tools/ProbeBuckets), so the overflow path carries real traffic in
    * the gate itself. */
  private val StreamCap = 2

  /** The component labels over [[sharedJaccardPairs]] — dedup_groups and
    * dedup_canonical both walk them, and a real pipeline labels the dup
    * graph once. Memoized like the pair set; the shuffle-budget spec
    * evicts this entry so its pin still measures the CC build plan. */
  private[graft] val JaccardCompKey = "text.jaccardComp"
  private def sharedJaccardComp(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(JaccardCompKey, s, dir) {
      val pairs = sharedJaccardPairs(s, dir)
      graft.graph.ConnectedComponents.run(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
        .localCheckpoint()
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace + BPE-ish), quality scoring, word stats
    "text_stats" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"),
        TF.bpeTokenCount(col("text")).as("bpe_tokens"),
        TF.qualityScore(col("text")).as("quality"),
        round(TF.avgWordLen(col("text")), 6).as("avg_wlen"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic (stopword-marker argmax)
    "lang_id" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // document fingerprint via the custom codegen PolyHash expression
    "fingerprints" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // exact dedup: min-id survivor per distinct text
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(docs(s, dir), "doc_id", "text")
        .select(col("keep_id"), col("n_copies")).orderBy("keep_id")
    }),

    // n-gram Jaccard near-dup pairs (df-ordered prefix filter + exact
    // merge-intersect verify)
    "jaccard_pairs" -> ((s, dir) => {
      sharedJaccardPairs(s, dir).orderBy("id_a", "id_b")
    }),

    // directed containment pairs: |A∩B|/|A| >= 0.9 — the asymmetric
    // quote/subset test Jaccard misses (A-side rarity prefix vs full
    // B-side index + exact merge-intersect verify)
    "containment_pairs" -> ((s, dir) => {
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text", ShingleN,
        ContainTau, setsOpt = Some(sharedShingleSets(s, dir)))
        .orderBy("id_a", "id_b")
    }),

    // winnowing fingerprint selection (Schleimer SIGMOD'03): per-doc
    // window-min over the ordered shingle-hash sequence, zero shuffle;
    // summarized per doc so the whole selected set is value-checked
    "winnow_fp" -> ((s, dir) => {
      val fps = TF.winnowedFingerprints(col("text"), ShingleN, WinnowW)
      docs(s, dir).select(col("doc_id"), fps.as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          coalesce(aggregate(col("fps"), lit(0L),
            (acc, e) => acc + shiftright(e, 20)), lit(0L))
            .as("h_sum"),
          coalesce(aggregate(col("fps"), lit(0L),
            (acc, e) => acc + (lit(1048575L) - pmod(e, lit(1048576L)))), lit(0L))
            .as("pos_sum"))
        .orderBy("doc_id")
    }),

    // MOSS-style local-overlap pairs: >= 10 shared winnowed fingerprint
    // hashes — local copying detection over the ~2/(w+1) fingerprint
    // sample, an inverted-index join that never touches full texts
    "winnow_pairs" -> ((s, dir) => {
      Dedup.winnowPairs(docs(s, dir), "doc_id", "text", ShingleN, WinnowW,
        WinnowShare, WinnowMaxDf).orderBy("id_a", "id_b")
    }),

    // fuzzy-dedup edit-distance verify: the quadratic-DP comparison runs
    // ONLY on the near-dup candidate graph (here the shared Jaccard pair
    // set), never corpus×corpus — the standard two-phase fuzzy-match
    // shape. levenshtein is integer-exact in both engines (this corpus
    // is ASCII; DuckDB's levenshtein counts BYTES where Spark counts
    // codepoints, so a non-ASCII corpus would pin this spec-side only)
    "edit_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = sharedJaccardPairs(s, dir)
      pairs
        .join(d.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
        .join(d.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
        .select(col("id_a"), col("id_b"),
          levenshtein(col("ta"), col("tb")).cast("long").as("edit"),
          round(lit(1.0) - levenshtein(col("ta"), col("tb"))
            .cast("double") / greatest(length(col("ta")), length(col("tb")),
              lit(1)), 6).as("edit_sim"))
        .orderBy("id_a", "id_b")
    }),

    // Misra-Gries heavy hitters over the token stream: a bounded-memory
    // candidate pass (≤ k-1 counters per task — the map-side answer to a
    // groupBy whose DISTINCT-key cardinality is itself data-scale), then
    // an exact recount of the tiny candidate set via broadcast semi-join.
    // The output thresholds on EXACT counts (tf·k > n ⟺ tf > n/k, the
    // precise MG guarantee boundary), so it is deterministic no matter
    // how partitioning shaped the candidate superset.
    "heavy_hitters" -> ((s, dir) => {
      val k = 32
      val toks = docs(s, dir)
        .select(explode(TF.tokens(col("text"))).as("token"))
      val total = toks.agg(count(lit(1)).as("n"))
      val cands = graft.operators.Sketches.mgCandidates(toks, "token", k)
      toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("tf"))
        .crossJoin(broadcast(total))
        .where(col("tf") * k > col("n"))
        .select(col("token"), col("tf"),
          expr("tf * 1000000 div n").as("freq_ppm"))
        .orderBy(col("tf").desc, col("token"))
    }),

    // Record-linkage blocking + native Jaro-Winkler scoring (Winkler
    // 1990): block part names on (noun, adjective initial) so candidate
    // generation is a keyed equi-join — the all-pairs form never
    // materializes — then score each candidate with the codegen
    // byte-level [[graft.functions.JaroWinklerExpr]] whose arithmetic is
    // bit-identical to DuckDB's jaro_winkler_similarity. Scores are
    // folded to integer ppm BEFORE aggregation so the per-block sums are
    // exact integers (order-independent across both engines).
    "jw_pairs" -> ((s, dir) => {
      val p = table(s, dir, "part").select(col("p_partkey"), col("p_name"),
        substring_index(col("p_name"), " ", -1).as("noun"),
        substring(col("p_name"), 1, 1).as("ini"))
      val a = p.select(col("p_partkey").as("id_a"),
        col("p_name").as("name_a"), col("noun"), col("ini"))
      val b = p.select(col("p_partkey").as("id_b"),
        col("p_name").as("name_b"), col("noun"), col("ini"))
      a.join(b, Seq("noun", "ini")).where(col("id_a") < col("id_b"))
        .select(col("noun"),
          round(TF.jaroWinkler(col("name_a"), col("name_b")) * 1e6)
            .cast("long").as("ppm"))
        .groupBy("noun").agg(count(lit(1)).as("n_pairs"),
          sum("ppm").as("sum_jw_ppm"), max("ppm").as("max_jw_ppm"),
          min("ppm").as("min_jw_ppm"))
        .orderBy("noun")
    }),

    // language-ID confusion matrix: declared lang × predicted lang — the
    // classifier-eval shape (one tiny-key groupBy; work distributes over
    // the corpus scan)
    "lang_confusion" -> ((s, dir) => {
      docs(s, dir).select(col("lang"), TF.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "lang_pred")
    }),

    // MinHash-LSH near-dup pairs (banded candidates, exact-Jaccard verify)
    // — kept END-TO-END (no memo) as the pinned build plan; the
    // estimator-evaluation gates below read [[sharedMinhashSide]] instead
    "minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text", ShingleN, JaccardTau,
        Bands, Rows).orderBy("id_a", "id_b")
    }),

    // Sketch-quality evaluation as data: MinHash-LSH recall against the
    // exact Jaccard pair set at the same tau. Because minhashPairs
    // exact-verifies its banded candidates, lsh ⊆ brute and recall_ppm =
    // |lsh ∩ brute|·1e6 div |brute| measures exactly what the banding
    // loses — the number a pipeline owner needs before trusting LSH
    // parameters at scale. All counts integer; the brute side reuses the
    // shared PPJoin pair set.
    "lsh_recall" -> ((s, dir) => {
      val brute = sharedJaccardPairs(s, dir).select("id_a", "id_b")
      val lsh = Dedup.minhashPairs(docs(s, dir), "doc_id", "text", ShingleN,
        JaccardTau, Bands, Rows).select("id_a", "id_b")
      val nb = brute.agg(count(lit(1)).as("n_brute"))
      val nl = lsh.agg(count(lit(1)).as("n_lsh"))
      val nc = brute.join(lsh, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_common"))
      nb.crossJoin(broadcast(nl)).crossJoin(broadcast(nc))
        .select(col("n_brute"), col("n_lsh"), col("n_common"),
          when(col("n_brute") > 0,
            expr("(n_common * 1000000) div n_brute"))
            .otherwise(1000000L).as("recall_ppm"))
    }),

    // The banding's PRECISION — lsh_recall's complement: how much of
    // the raw band-collision candidate stream survives exact-Jaccard
    // verification. Together the two numbers are the (wasted-verify
    // cost, missed-pair risk) trade a band geometry is tuned by;
    // measured on the candidates BEFORE verify (precision is a property
    // of the geometry, not of the verified output). Integer ppm.
    "lsh_precision" -> ((s, dir) => {
      val cand = Dedup.bandedCandidatesFromSigs(
        sharedMinhashSide(s, dir).select(col("id"), col("sig")),
        Bands, Rows)
      val truePairs = sharedJaccardPairs(s, dir).select("id_a", "id_b")
      val nc = cand.agg(count(lit(1)).as("n_candidates"))
      val nt = cand.join(truePairs, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_true"))
      nc.crossJoin(broadcast(nt))
        .select(col("n_candidates"), col("n_true"),
          when(col("n_candidates") > 0,
            expr("(n_true * 1000000) div n_candidates"))
            .otherwise(1000000L).as("precision_ppm"))
    }),

    // MinHash ESTIMATOR calibration — the third sketch-quality number
    // next to lsh_recall/lsh_precision: per banded candidate pair, the
    // signature-agreement Jaccard estimate (matching mins / numHashes,
    // the unbiased MinHash estimator) against the exact Jaccard, both as
    // integer ppm with the absolute error alongside. This is the plot
    // that justifies a numHashes choice before scaling the sketch out;
    // candidate work is band-bounded exactly as in minhash_pairs.
    "minhash_err" -> ((s, dir) => {
      val nh = Bands * Rows
      // ONE memoized doc-side table carrying both the signature and the
      // hash-sorted shingle set: the banding, the per-pair signature
      // agreement and the exact verify all read the same checkpoint —
      // the kernel pass runs once, not once for the candidates plus
      // once per pair side (that shape cost ~2.4 s of repeated
      // shingle/signature work at sf0.1)
      val side = sharedMinhashSide(s, dir)
      val cand = Dedup.bandedCandidatesFromSigs(
        side.select(col("id"), col("sig")), Bands, Rows)
      val inter = graft.functions.VecKernels
        .sorted_intersect_count(col("sh_a"), col("sh_b"))
      cand
        .join(side.toDF("id_a", "sig_a", "sh_a"), "id_a")
        .join(side.toDF("id_b", "sig_b", "sh_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v).as("n_eq"),
          inter.cast("long").as("c"),
          (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sz"))
        .select(col("id_a"), col("id_b"),
          expr(s"(n_eq * 1000000) div $nh").as("est_ppm"),
          expr("(c * 1000000) div (sz - c)").as("exact_ppm"))
        .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
        .orderBy("id_a", "id_b")
    }),

    // SimHash fingerprints (60-bit)
    "simhash_fp" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        Dedup.simhash(col("text"), ShingleN).as("fp"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup PAIRS end-to-end: 4×15-bit banded candidates
    // (pigeonhole: hamming <= 3 forces agreement on >= 1 band, so the
    // banded join has FULL recall and the result equals the brute
    // all-pairs oracle), exact Hamming verify
    "simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", ShingleN,
        SimhashMaxHam).orderBy("id_a", "id_b")
    }),

    // deterministic content-stable train/val/test splitting: split id =
    // PolyHash(doc id) mod 10 — reproducible across runs and engines, the
    // standard way to carve a corpus without a global shuffle or RNG state
    "sample_split" -> ((s, dir) => {
      docs(s, dir)
        .select((PolyHash.poly_hash(col("doc_id").cast("string")) % 10)
          .as("split_id"), col("n_chars"))
        .groupBy("split_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("split_id")
    }),

    // end-to-end corpus curation — the composite a training-data run
    // actually executes: language filter → quality threshold → exact-dedup
    // survivors → corpus stats. Every stage is the already-oracle-checked
    // operator; the composite itself is oracle-checked too.
    "corpus_curate" -> ((s, dir) => {
      val d = docs(s, dir)
      val filtered = d.where(TF.langId(col("text")) === "en"
        && TF.qualityScore(col("text")) >= QualityMin)
      val kept = filtered.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"))
      filtered.agg(count(lit(1)).as("n_filtered"),
          round(avg(TF.qualityScore(col("text"))), 6).as("avg_quality"))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept"),
          sum(TF.tokenCount(col("text")).cast("long")).as("kept_tokens")))
    }),

    // incremental snapshot refresh (MergeUpsert.lastWriterWins): the
    // documents table as yesterday's snapshot (version 0) merged with a
    // synthesized delta — re-crawls (doc_id≡3 mod 7, text+' v2', v1),
    // inserts (doc_id≡5 mod 11 shifted +1e6, v1) and tombstones
    // (doc_id≡7 mod 13, v2) — through ONE doc_id-keyed window; the
    // output fingerprints the winning text so a wrong winner anywhere
    // flips the hash. Deletes beat the base row; inserts survive;
    // re-crawls replace.
    "merge_upsert" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d
        .withColumn("version", lit(0L)).withColumn("is_delete", lit(false))
      val mods = d.where(col("doc_id") % 7 === 3)
        .withColumn("text", concat(col("text"), lit(" v2")))
        .withColumn("n_chars", col("n_chars") + 3)
        .withColumn("version", lit(1L)).withColumn("is_delete", lit(false))
      val ins = d.where(col("doc_id") % 11 === 5)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("version", lit(1L)).withColumn("is_delete", lit(false))
      val dels = d.where(col("doc_id") % 13 === 7)
        .withColumn("version", lit(2L)).withColumn("is_delete", lit(true))
      graft.operators.MergeUpsert
        .lastWriterWins(base, mods.unionByName(ins).unionByName(dels),
          Seq("doc_id"), "version", "is_delete")
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"),
          PolyHash.poly_hash(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // corpus write round-trip: the partitioned production layout
    // (CorpusWriter.writePartitioned) written to disk, read back through
    // partition discovery, re-aggregated — same result as sample_split by
    // construction, so the disk layout itself is under the oracle
    "corpus_write" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"),
        (PolyHash.poly_hash(col("doc_id").cast("string")) % 10).as("split_id"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_corpus_").toString
      graft.core.CorpusWriter.writePartitioned(d, s"$tmp/by_split",
        Seq("split_id"), filesPerPartition = 2)
      s.read.parquet(s"$tmp/by_split")
        // partition discovery infers the directory key as int32; the oracle
        // (and sample_split) emit int64 — normalize before aggregating
        .withColumn("split_id", col("split_id").cast("long"))
        .groupBy("split_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("split_id")
    }),

    // ORC source round-trip: the documents table written as ORC (CSV,
    // JSON and parquet reads are covered by S1 + sink_roundtrip; ORC is
    // the remaining columnar interchange format Spark ships natively),
    // read back, re-aggregated per language with a text-fingerprint sum —
    // equal to aggregating the parquet original iff the round-trip is
    // value-lossless for int64 + UTF-8 strings. The aggregate keys on
    // lang, so the shuffle carries |langs| partial rows per task.
    "source_orc" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_orc_").toString
      docs(s, dir).write.mode("overwrite").orc(s"$tmp/docs_orc")
      s.read.orc(s"$tmp/docs_orc")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(PolyHash.poly_hash(col("text"))).cast("long").as("fp_sum"))
        .orderBy("lang")
    }),

    // sequence packing: per shard (the sample_split id), docs in doc_id
    // order fill fixed token-budget bins via an exclusive running sum —
    // the coarse packing pass before tokenized training. The running sum
    // is the two-phase PrefixScan, so parallelism follows the cluster
    // (numParts) instead of being capped at the 10 split ids — the values
    // are identical to a per-split window cumsum by construction
    // (PrefixScanSpec pins the equality and the partitioning).
    "pack_sequences" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (PolyHash.poly_hash(col("doc_id").cast("string")) % 10).as("split_id"),
        TF.bpeTokenCount(col("text")).as("toks"))
      graft.operators.PrefixScan.exclusiveCumsum(d, "split_id", "doc_id",
          "toks", "cum", numParts = s.sparkContext.defaultParallelism)
        .withColumn("seq_id", expr(s"cum div $SeqLen"))
        .groupBy("split_id", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("sum_tokens"))
        .orderBy("split_id", "seq_id")
    }),

    // stratified deterministic downsampling: English docs kept at 50%,
    // German at 25%, everything else whole — membership is a pure function
    // of doc_id (PolyHash threshold), so the sample is reproducible across
    // runs/clusters and join-consistent across tables
    "sample_strata" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("lang_pred", TF.langId(col("text")))
      graft.operators.Sampling.stratified(d, "doc_id", col("lang_pred"),
          Seq("en" -> 0.5, "de" -> 0.25), default = 1.0)
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("lang_pred")
    }),

    // benchmark decontamination: corpus docs (doc_id >= 5) sharing any
    // word-bigram shingle hash with the "eval set" (doc_id < 5), with the
    // distinct-overlap count — the leakage-exclusion pass of a training
    // run; eval hashes broadcast, corpus side never self-joins
    "decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contamination(d.where(col("doc_id") >= 5),
          d.where(col("doc_id") < 5), "doc_id", "text", ShingleN)
        .select(col("id").as("doc_id"), col("n_shared"))
        .orderBy("doc_id")
    }),

    // span-level contamination fractions: for EVERY corpus doc, the share
    // of its distinct word-bigram shingle hashes found in the eval set
    // (doc_id < 5), plus a thresholded flag — the filterable form of
    // decontam (which emits hit counts for contaminated docs only). The
    // flag compares the 6dp-ROUNDED fraction so the boundary behavior is
    // engine-independent.
    "decontam_frac" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationStats(d.where(col("doc_id") >= 5),
          d.where(col("doc_id") < 5), "doc_id", "text", ShingleN)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_shared"),
          col("contam_frac"),
          (col("contam_frac") >= ContamTau).as("contaminated"))
        .orderBy("doc_id")
    }),

    // unicode NFC normalization through the native codegen kernel
    // (TextKernels.nfc_normalize). The synthetic corpus is pure ASCII
    // (NFC-invariant), so the gate first DECOMPOSES the real text —
    // every 'e' becomes e + U+0301 combining acute — and normalization
    // must recompose each pair back to é: len_nfc < len_deco by exactly
    // the number of 'e's, and the fingerprint runs over the recomposed
    // codepoints. Both engines build the decomposed text from the same
    // documents rows.
    "text_nfc" -> ((s, dir) => {
      val deco = regexp_replace(col("text"), "e", "e" + "\u0301")
      val nfc = graft.functions.TextKernels.nfc_normalize(deco)
      docs(s, dir).select(col("doc_id"),
          length(deco).cast("long").as("len_deco"),
          length(nfc).cast("long").as("len_nfc"),
          PolyHash.poly_hash(nfc).as("nfc_fp"))
        .orderBy("doc_id")
    }),

    // BM25 lexical ranking for a fixed query-term bag — the corpus
    // selection / retrieval-decontamination scorer; per-term weights are
    // 6dp-rounded and combined in literal term order so the score doubles
    // are bit-identical across engines (LexicalRank scaladoc)
    "bm25_rank" -> ((s, dir) => {
      graft.operators.LexicalRank.bm25TopK(docs(s, dir), "doc_id", "text",
          Bm25Terms, Bm25TopN, Bm25K1, Bm25B)
        .select(col("doc_id"), col("score"), col("rank"))
        .orderBy("rank")
    }),

    // the inverted-index (ad-hoc many-term) BM25 shape: postings rows
    // instead of tf columns, exact-integer per-doc weight sum — the plan
    // a retrieval workload with user-supplied queries takes (LexicalRank
    // .bm25Inverted scaladoc for the determinism discipline)
    "bm25_adhoc" -> ((s, dir) => {
      graft.operators.LexicalRank.bm25InvertedTopK(docs(s, dir), "doc_id",
          "text", Bm25Terms, Bm25TopN, Bm25K1, Bm25B)
        .select(col("doc_id"), col("score"), col("rank"))
        .orderBy("rank")
    }),

    // Dedup threshold tuning curve: pair count and affected-doc count at
    // each candidate Jaccard tau — the sweep a pipeline runs before
    // committing to a threshold. Every leg is a FILTER over the memoized
    // pair set (computed once at the 0.3 floor; J >= tau' ⟹ J >= tau
    // for tau' > tau, the same hoist dbscan_sweep uses for ε), so the
    // whole curve costs one candidate join at any corpus size.
    // Comparisons are on the 6dp-rounded jaccard in both engines.
    "tau_sweep" -> ((s, dir) => {
      val pairs = sharedJaccardPairs(s, dir)
        .select("id_a", "id_b", "jaccard")
      TauGrid.map { tau =>
        val p = pairs.where(col("jaccard") >= tau)
        val affected = p.select(col("id_a").as("id"))
          .union(p.select(col("id_b").as("id")))
        p.agg(count(lit(1)).as("n_pairs"))
          .crossJoin(affected.agg(
            countDistinct("id").as("n_docs_affected")))
          .select(lit(math.round(tau * 100).toInt).as("tau_pct"),
            col("n_pairs"), col("n_docs_affected"))
      }.reduce(_.unionByName(_)).orderBy("tau_pct")
    }),

    // Near-dup group-size histogram over the dedup components
    // (singletons included) — the cluster-blowup diagnostic read next to
    // degree_hist: a fat tail here is a template cluster about to
    // dominate the keep-one pass. Two keyed map-side-combined
    // aggregations over the shared labels.
    "dup_size_hist" -> ((s, dir) => {
      val d = docs(s, dir)
      val comp = sharedJaccardComp(s, dir)
      d.select(col("doc_id"))
        .join(comp, d("doc_id") === comp("id"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("group_id"))
        .groupBy("group_id").agg(count(lit(1)).as("gsize"))
        .groupBy("gsize").agg(count(lit(1)).as("n_groups"))
        .orderBy("gsize")
    }),

    // Retrieval-evaluation MRR over deterministic qrels: for each query
    // term the "relevant" doc is the lowest-id doc containing it (a
    // synthetic but fully reproducible qrel), the ranking is
    // tf-retrieval ((tf desc, doc_id) over the term's postings), and
    // the reciprocal rank is integer ppm (1e6 div rank). The relevant
    // doc's rank is COUNTED (one conditional agg over the postings),
    // never materialized as a rank window — per-term work is one keyed
    // postings groupBy + a |terms|-row broadcast join, linear in
    // postings at any corpus size.
    "mrr_eval" -> ((s, dir) => {
      val postings = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
        .where(col("token").isin(Bm25Terms: _*))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      val rel = postings.groupBy("token").agg(min("doc_id").as("rel_id"))
      val relTf = postings.alias("p")
        .join(broadcast(rel.alias("r")),
          col("p.token") === col("r.token") &&
            col("p.doc_id") === col("r.rel_id"))
        .select(col("p.token").as("token"), col("r.rel_id").as("rel_id"),
          col("p.tf").as("rel_tf"))
      postings.join(broadcast(relTf), Seq("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_matching"),
          (sum(when(col("tf") > col("rel_tf"), 1L).otherwise(0L)) + 1)
            .as("rel_rank"),
          max("rel_id").as("rel_id"))
        .withColumn("rr_ppm", expr("1000000 div rel_rank"))
        .orderBy("token")
    }),

    // Retrieval-evaluation nDCG@K over graded deterministic qrels: rel=3
    // for the term's lowest-id doc (the mrr_eval qrel), 2/1 by doc_id
    // residue (editorial grades independent of the ranker), 0 otherwise.
    // The actual ranking is (tf desc, doc_id); both the actual and the
    // ideal top-K come from the partial top-k aggregate (k-bounded
    // map-side buffers — no per-term sort of the full postings, the
    // bm25TopK lesson), and the rank discounts are baked literals shared
    // with the oracle, so no engine evaluates log2 at query time.
    "ndcg_eval" -> ((s, dir) => {
      val postings = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
        .where(col("token").isin(Bm25Terms: _*))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      val rel0 = postings.groupBy("token").agg(min("doc_id").as("rel_id"))
      val graded = postings.join(broadcast(rel0), Seq("token"))
        .select(col("token"), col("doc_id"), col("tf"),
          when(col("doc_id") === col("rel_id"), 3L)
            .when(col("doc_id") % 7 === 0, 2L)
            .when(col("doc_id") % 3 === 0, 1L)
            .otherwise(0L).as("rel"))
      val disc = array(NdcgDiscounts.map(lit): _*)
      // gain (2^rel - 1) looked up from a literal table (rel is 0..3, so
      // the four exact values beat a runtime shift); discount lookup is
      // element_at over the literal array — rank = pos + 1
      val gains = array(Seq(0.0, 1.0, 3.0, 7.0).map(lit): _*)
      def dcgOf(top: DataFrame, relCol: Column): DataFrame = top
        .select(col("token"),
          (element_at(gains, relCol.cast("int") + 1) *
            element_at(disc, col("pos") + 1)).as("g"))
        .groupBy("token").agg(sum("g").as("dcg"))
      val top = graded.groupBy("token")
        .agg(graft.functions.TopKAgg.topk_sim(
          col("tf").cast("double"), col("doc_id"), NdcgK).as("tk"))
        .select(col("token"), posexplode(col("tk")))
        .toDF("token", "pos", "e")
        .select(col("token"), col("pos"), col("e.id").as("doc_id"))
        .join(graded.select(col("token"), col("doc_id"), col("rel")),
          Seq("token", "doc_id"))
      val itop = graded.groupBy("token")
        .agg(graft.functions.TopKAgg.topk_sim(
          col("rel").cast("double"), col("doc_id"), NdcgK).as("tk"))
        .select(col("token"), posexplode(col("tk")))
        .toDF("token", "pos", "e")
      val dcg = dcgOf(top, col("rel"))
      val idcg = dcgOf(itop, col("e.sim")).withColumnRenamed("dcg", "idcg")
      val nm = graded.groupBy("token").agg(count(lit(1)).as("n_matching"))
      nm.join(dcg, Seq("token")).join(idcg, Seq("token"))
        .select(col("token"), col("n_matching"),
          round(col("dcg"), 6).as("dcg"), round(col("idcg"), 6).as("idcg"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"))
        .orderBy("token")
    }),

    // Positional phrase matching: per-term positional postings joined on
    // (doc, start-position) — the inverted-index intersection a phrase
    // query runs, never a substring scan over full texts. Each leg is a
    // filtered projection of the positional explode; the |phrase|-way
    // join is keyed by (doc_id, p), so work is linear in the rarest
    // term's postings at any corpus size.
    "phrase_match" -> ((s, dir) => {
      val pos = docs(s, dir)
        .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
        .toDF("doc_id", "p", "token")
        .where(col("token").isin(Phrase: _*))
      val first = pos.where(col("token") === Phrase.head)
        .select(col("doc_id"), col("p"))
      val hits = Phrase.zipWithIndex.drop(1).foldLeft(first) {
        case (acc, (w, i)) =>
          acc.join(pos.where(col("token") === w)
            .select(col("doc_id"), (col("p") - i).as("p")),
            Seq("doc_id", "p"))
      }
      hits.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    }),

    // Reproducible per-epoch training order: every document gets a
    // deterministic pseudo-random sort key PolyHash("<epoch>:<doc_id>")
    // per epoch, and its 0-based position in that order comes from the
    // two-phase PrefixScan — never a global row_number window (one
    // sequential task) and never rdd.zipWithIndex (a driver round-trip).
    // Re-running any epoch reproduces the exact order bit-for-bit: the
    // property a resumable 100 TB training job needs from its shuffle.
    "epoch_shuffle" -> ((s, dir) => {
      val keyed = Seq(0, 1).map { e =>
        docs(s, dir).select(col("doc_id"), lit(e).as("epoch"),
          PolyHash.poly_hash(
            concat(lit(s"$e:"), col("doc_id").cast("string"))).as("h"))
      }.reduce(_ unionAll _)
      graft.operators.PrefixScan.exclusiveCumsum(
          keyed.withColumn("__one", lit(1L)), "epoch", Seq("h", "doc_id"),
          "__one", "pos", numParts = s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("epoch"), col("h"), col("pos"))
        .orderBy("epoch", "pos")
    }),

    // the operator a dedup pipeline actually ends with: near-dup PAIRS →
    // connected components → one group id (min member) per document;
    // singletons are their own group. Composes Dedup.jaccardPairs with
    // the DataFrame-native CC; oracle = recursive-CTE min-label
    // propagation over the same SQL jaccard graph.
    "dedup_groups" -> ((s, dir) => {
      val d = docs(s, dir)
      val comp = sharedJaccardComp(s, dir)
      d.select(col("doc_id"))
        .join(comp, d("doc_id") === comp("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
        .orderBy("doc_id")
    }),

    // incremental near-dup detection (Dedup.incrementalJaccardPairs):
    // the daily-ingest shape — docs >= IncrSplit are the "new batch",
    // the rest the already-deduped corpus; emitted pairs have at least
    // one new side (new-vs-corpus and new-vs-new), old-old skipped
    // INSIDE the candidate join. Same exact-Jaccard oracle with the
    // side filter.
    "dedup_incremental" -> ((s, dir) => {
      // memoized like the other one-per-batch builds (a user runs the
      // ingest dedup once; the bench's steady state should too)
      graft.core.QueryCache.shared("text.incrementalPairs", s, dir) {
        val d = docs(s, dir)
        graft.operators.Dedup.incrementalJaccardPairs(
            d.where(col("doc_id") < IncrSplit),
            d.where(col("doc_id") >= IncrSplit),
            "doc_id", "text", ShingleN, JaccardTau)
          .localCheckpoint()
      }.orderBy("id_a", "id_b")
    }),

    // continuous-ingest near-dup (StreamingDedup.bandedCandidatesStateful):
    // the streaming counterpart of dedup_incremental — documents MinHash-
    // banded against an ACCUMULATING per-bucket signature store in
    // flatMapGroupsWithState, pairs deduplicated across bands by the
    // min-colliding-band rule and emitted only with >= 1 new side. Run
    // here in batch mode (one micro-batch; split-invariance makes that
    // row-equivalent to any streaming schedule — StreamingDedupSpec pins
    // batch ≡ stream and candidates ≡ the batch banding). Candidates
    // verify with exact Jaccard against the memoized signature side
    // table; the oracle mirrors the band geometry in SQL plus the
    // new-side filter.
    "dedup_stream" -> ((s, dir) => {
      graft.core.QueryCache.shared(StreamPairsKey, s, dir) {
        val d = docs(s, dir).select(col("doc_id"), col("text"),
          (col("doc_id") >= IncrSplit).as("is_new"))
        val cand = graft.streaming.StreamingDedup.bandedCandidatesStateful(
          d, "doc_id", "text", "is_new", ShingleN, Bands, Rows).toDF()
        val side = sharedMinhashSide(s, dir)
        val inter = graft.functions.VecKernels
          .sorted_intersect_count(col("sh_a"), col("sh_b"))
        cand
          .join(side.select(col("id").as("id_a"), col("shs").as("sh_a")), "id_a")
          .join(side.select(col("id").as("id_b"), col("shs").as("sh_b")), "id_b")
          .withColumn("jaccard",
            round(inter.cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) - inter), 6))
          .where(col("jaccard") >= JaccardTau)
          .select("id_a", "id_b", "jaccard")
          .localCheckpoint()
      }.orderBy("id_a", "id_b")
    }),

    // the capped store under REAL overflow traffic (StreamingDedup's
    // hot-bucket guard, maxBucket = StreamCap = 2 < every SF's measured
    // bucket maxima): saturated-bucket arrivals route out-of-band as
    // overflow records, overflowRecoveryPairs restores exactly the
    // overflow x overflow pairs batch-side through the skew-safe blocked
    // self-join, and the plain (not distinct-ed) union + exact-Jaccard
    // verify must land on dedup_stream's oracle — the driver gate itself
    // pins that capped + recovery = uncapped with each pair EXACTLY once
    // (a double-emitted pair would duplicate a verified row and fail the
    // hash compare).
    "dedup_stream_capped" -> ((s, dir) => {
      graft.core.QueryCache.shared(StreamCappedKey, s, dir) {
        val d = docs(s, dir).select(col("doc_id"), col("text"),
          (col("doc_id") >= IncrSplit).as("is_new"))
        val keyed = graft.streaming.StreamingDedup.textBandKeys(
          d, "doc_id", "text", Some("is_new"), ShingleN, Bands, Rows)
          .localCheckpoint()
        val events = graft.streaming.StreamingDedup
          .statefulEventsFromKeys(keyed, maxBucket = StreamCap)
          .localCheckpoint()
        import s.implicits._
        val streamPairs = events.filter(!_.overflow)
          .map(e => (e.id_a, e.id_b)).toDF("id_a", "id_b")
        val recovered = graft.streaming.StreamingDedup
          .overflowRecoveryPairs(events, keyed)
        val cand = streamPairs.unionAll(recovered)
        val side = sharedMinhashSide(s, dir)
        val inter = graft.functions.VecKernels
          .sorted_intersect_count(col("sh_a"), col("sh_b"))
        cand
          .join(side.select(col("id").as("id_a"), col("shs").as("sh_a")), "id_a")
          .join(side.select(col("id").as("id_b"), col("shs").as("sh_b")), "id_b")
          .withColumn("jaccard",
            round(inter.cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) - inter), 6))
          .where(col("jaccard") >= JaccardTau)
          .select("id_a", "id_b", "jaccard")
          .localCheckpoint()
      }.orderBy("id_a", "id_b")
    }),

    // token-window chunking (Chunking.chunkTokens): 1-based starts every
    // Stride tokens, ChunkLen-token windows (short final chunk kept),
    // fingerprinted — the pre-embedding segmentation pass. Zero-shuffle
    // projection + explode; value-exact via the PolyHash mirror.
    "doc_chunks" -> ((s, dir) => {
      graft.operators.Chunking.chunkTokens(docs(s, dir), "doc_id", "text",
          ChunkLen, ChunkStride)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("start"),
          col("n_tokens"), col("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // canonical-representative dedup: the selection a pipeline actually
    // ships — within each near-dup group keep the HIGHEST-QUALITY copy
    // (quality desc, doc_id tiebreak), not the smallest id. Same shared
    // pair graph + CC as dedup_groups; the per-group argmax is a
    // group-partitioned rank window (work distributes over groups, skew
    // ceiling = largest dup cluster). Singletons are their own canonical.
    "dedup_canonical" -> ((s, dir) => {
      val d = docs(s, dir)
      val comp = sharedJaccardComp(s, dir)
      val grouped = d
        .select(col("doc_id"), TF.qualityScore(col("text")).as("q6"))
        .join(comp, d("doc_id") === comp("id"), "left")
        .select(col("doc_id"), col("q6"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("group_id").orderBy(col("q6").desc, col("doc_id"))
      grouped.withColumn("canonical", row_number().over(w) === 1)
        .orderBy("doc_id")
    }),

    // Per-source dedup loss report: what fraction of each source's docs
    // a min-member keep-one pass drops — the "which domain is full of
    // templates" dashboard row that decides where dedup budget goes.
    // One keyed label join over the shared components + a tiny-key
    // source agg; drop rate in integer ppm.
    "dedup_rate" -> ((s, dir) => {
      val d = docs(s, dir)
      val comp = sharedJaccardComp(s, dir)
      d.select(col("doc_id"), col("source"))
        .join(comp, d("doc_id") === comp("id"), "left")
        .select(col("source"),
          (col("doc_id") ===
            coalesce(col("component"), col("doc_id"))).as("is_kept"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((!col("is_kept")).cast("long")).as("n_dropped"))
        .withColumn("drop_ppm", expr("n_dropped * 1000000 div n_docs"))
        .orderBy("source")
    }),

    // Leakage-safe train/val/test split: the assignment hashes the
    // near-dup GROUP id (the shared CC labels), not the doc id, so
    // near-duplicates can never straddle a split boundary — the
    // held-out-contamination bug a per-doc hash split ships. Per-split
    // counts plus the number of near-dup pairs crossing OUT of each
    // split, which the oracle RECOMPUTES from its own pair graph + CC
    // (a doc-keyed split would read nonzero there and hash-mismatch).
    // Plan: one keyed label join, one split-keyed agg (countDistinct is
    // map-side partially aggregated), and two doc-keyed joins of the
    // pair set — nothing touches the driver.
    "leakage_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val comp = sharedJaccardComp(s, dir)
      val labeled = d.select(col("doc_id"))
        .join(comp, d("doc_id") === comp("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
        .withColumn("split_id",
          PolyHash.poly_hash(col("group_id").cast("string")) % 10)
        .withColumn("split",
          when(col("split_id") <= 7, "train")
            .when(col("split_id") === 8, "val").otherwise("test"))
      val summary = labeled.groupBy("split").agg(
        count(lit(1)).as("n_docs"),
        countDistinct("group_id").as("n_groups"))
      val pairs = sharedJaccardPairs(s, dir).select("id_a", "id_b")
      val leaks = pairs
        .join(labeled.select(col("doc_id").as("id_a"), col("split").as("sa")),
          "id_a")
        .join(labeled.select(col("doc_id").as("id_b"), col("split").as("sb")),
          "id_b")
        .where(col("sa") =!= col("sb"))
        .groupBy(col("sa").as("split")).agg(count(lit(1)).as("lk"))
      summary.join(leaks, Seq("split"), "left")
        .select(col("split"), col("n_docs"), col("n_groups"),
          coalesce(col("lk"), lit(0L)).as("leaked_pairs"))
        .orderBy("split")
    }),

    // Exact-substring span dedup (Lee et al. ACL'22) at 5-gram
    // resolution: per doc, the maximal token spans whose every 5-gram
    // also occurs elsewhere in the corpus — minus the corpus-wide first
    // occurrence of each 5-gram, so one copy of every repeated passage
    // survives (the paper's keep-one semantics).
    "span_dedup" -> ((s, dir) => {
      Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text", SpanN)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")
    }),

    // span_dedup APPLIED: every document rebuilt from the tokens outside
    // its duplicated spans (whitespace-normalized; "" when fully
    // duplicated) — the output a curation pipeline actually ships.
    "span_strip" -> ((s, dir) => {
      Dedup.stripDuplicatedSpans(docs(s, dir), "doc_id", "text", SpanN)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Per-document top-5 TF-IDF terms (keyword extraction). The idf is
    // the INTEGER floor((1e6·N)/df) — order-equivalent to log(N/df) for
    // ranking within a corpus and exact in both engines, sidestepping
    // cross-engine ln() ulp drift the way surprisal_score does. Shuffles:
    // (doc,token) groupBy, token-keyed df groupBy (both map-side
    // combined), one keyed join, and a per-doc window whose partition is
    // one document's vocabulary.
    "tfidf_topk" -> ((s, dir) => {
      val d = docs(s, dir)
      val n = d.count()
      val toks = when(length(trim(col("text"))) === 0,
          array().cast("array<string>"))
        .otherwise(split(trim(col("text")), "\\s+"))
      val tf = d.select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "token")
        .withColumn("score", col("tf") * expr(s"${1000000L * n} div df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= TfidfTopN)
        .select(col("doc_id"), col("token"), col("tf"), col("score"),
          col("rank"))
        .orderBy("doc_id", "rank")
    }),

    // Feature-hashing text embedding (Weinberger et al. ICML'09): tokens
    // hash into HashDim signed buckets (sign from an independent hash
    // bit), giving each doc a sparse integer vector with NO vocabulary
    // table — the model-free featurizer in front of the linear/ANN ops.
    // Everything is exact integers (signed counts, Σv², nnz), so the
    // gate is value-exact with zero float discipline needed; the plan is
    // one map-side-combined (doc, bucket) groupBy + one per-doc fold.
    "hash_embed" -> ((s, dir) => {
      val cells = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("w"))
        .select(col("doc_id"), PolyHash.poly_hash(col("w")).as("h"))
        .select(col("doc_id"), expr(s"h % $HashDim").as("b"),
          when(expr(s"(h div $HashDim) % 2") === 0, 1L).otherwise(-1L)
            .as("sg"))
        .groupBy("doc_id", "b").agg(sum("sg").as("v"))
      cells.groupBy("doc_id").agg(
          count(when(col("v") =!= 0, 1)).as("nnz"),
          sum(col("v") * col("v")).as("norm2"),
          coalesce(max(when(col("b") === 0, col("v"))), lit(0L)).as("b0"))
        .orderBy("doc_id")
    }),

    // Conjunctive (AND) boolean retrieval over the postings shape: a doc
    // qualifies iff it contains EVERY query term. The plan is term-count
    // equality over an isin-filtered postings explode — one map-side-
    // combined groupBy, no per-term corpus scans and no self-joins, so
    // adding terms changes a literal filter, not the plan size (the same
    // O(1)-in-terms argument as bm25_adhoc, with AND instead of ranked
    // OR).
    "bool_retrieval" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"),
        explode(TF.tokens(col("text"))).as("token"))
        .where(col("token").isin(Bm25Terms: _*))
      toks.groupBy("doc_id")
        .agg(count_distinct(col("token")).cast("long").as("n_terms"),
          count(lit(1)).as("total_tf"))
        .where(col("n_terms") === Bm25Terms.length)
        .select("doc_id", "total_tf")
        .orderBy("doc_id")
    }),

    // Sorted-neighborhood entity blocking (Hernández & Stolfo SIGMOD'95):
    // records sort by a cheap blocking key, a window of BlockW consecutive
    // records emits candidate pairs. The global rank comes from the
    // two-phase PrefixScan (range partition, data-scaled) — NOT a global
    // row_number window — and the neighborhood join is an EQUI-join on
    // rank div BlockW with a fan-out of exactly 2 probe buckets per row
    // (every bucket holds ≤ BlockW rows, so there is no skew by
    // construction). same_key marks pairs whose full blocking key agrees,
    // the downstream match-scoring filter.
    "block_pairs" -> ((s, dir) => {
      val np = s.sparkContext.defaultParallelism
      val keyed = docs(s, dir).select(col("doc_id"),
        concat(col("lang"), lit("|"), substring(col("text"), 1, 16))
          .as("bkey"))
      val ranked = graft.operators.PrefixScan
        .denseIds(keyed, Seq("bkey", "doc_id"), "rank", np)
      val probes = ranked.select(col("doc_id").as("id_a"),
        col("bkey").as("bkey_a"), col("rank").as("rank_a"),
        explode(array(floor(col("rank") / BlockW).cast("long"),
          floor(col("rank") / BlockW).cast("long") + 1)).as("bucket"))
      val bSide = ranked.select(col("doc_id").as("id_b"),
        col("bkey").as("bkey_b"), col("rank").as("rank_b"),
        floor(col("rank") / BlockW).cast("long").as("bucket"))
      probes.join(bSide, Seq("bucket"))
        .where((col("rank_b") - col("rank_a")).between(1, BlockW - 1))
        .select(col("id_a"), col("id_b"),
          (col("rank_b") - col("rank_a")).as("dist"),
          when(col("bkey_a") === col("bkey_b"), 1L).otherwise(0L)
            .as("same_key"))
        .orderBy("id_a", "id_b")
    }))

  // ----------------------------------------------------------- oracles

  private[queries] val sqlQuality: String = {
    val stop = TF.EnStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""round(
       | least(CAST(len(t) AS DOUBLE) / 50.0, 1.0) * 0.25
       | + (1.0 - least(CAST(length(text) -
       |     length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}]', '', 'g'))
       |     AS DOUBLE) / greatest(length(text), 1) * 5.0, 1.0)) * 0.25
       | + least(CAST(len(list_filter(t, w -> list_contains($stop, w)))
       |     AS DOUBLE) / greatest(len(t), 1) * 5.0, 1.0) * 0.25
       | + (CASE WHEN CAST(length(regexp_replace(text, '\\s', '', 'g'))
       |     AS DOUBLE) / greatest(len(t), 1) BETWEEN 3.0 AND 10.0
       |     THEN 1.0 ELSE 0.0 END) * 0.25, 6)""".stripMargin
  }

  private val sqlLang: String = {
    val scores = TF.LangMarkers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_filter(t, w -> list_contains($lst, w)))"
    }
    val names = scores.map(_._1)
    val gmax = s"greatest(${scores.map(s => s"s_${s._1}").mkString(", ")})"
    val cases = names.map(l => s"WHEN s_$l = mx THEN '$l'").mkString("\n  ")
    s"""SELECT doc_id, CASE WHEN mx = 0 THEN 'und'
       |  $cases END AS lang_pred
       |FROM (SELECT doc_id,
       |  ${scores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n  ")},
       |  $gmax AS mx FROM (SELECT doc_id, t FROM toks))""".stripMargin
  }

  /** Per-permutation MinHash min columns + per-band folded keys, generated
    * from [[Dedup.minhashPerms]] so Spark and the oracle share constants. */
  private val sqlMinhash: String = {
    val perms = Dedup.minhashPerms(Bands * Rows)
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % $P) AS m$i"
    }.mkString(",\n  ")
    val bandKeys = (0 until Bands).map { bd =>
      val key = (0 until Rows).foldLeft("CAST(0 AS BIGINT)") { (acc, r) =>
        s"(($acc * 31 + m${bd * Rows + r}) % $P)"
      }
      s"SELECT doc_id, $bd AS band, $key AS key FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""sig AS (SELECT doc_id,
       |  $mins
       |  FROM shh GROUP BY doc_id),
       |banded AS ($bandKeys),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val sqlSimhash: String = {
    val bitSums = (0 until Dedup.SimhashBits).map(b =>
      s"sum(CASE WHEN (h60 >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n  ")
    val fp = (0 until Dedup.SimhashBits).map(b =>
      s"(CASE WHEN b$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END)")
      .mkString(" | ")
    s"""shh2 AS (SELECT doc_id,
       |  xor(${sqlPolyHash("s")},
       |      (${sqlPolyHash("s || '#1'")}) << 30) AS h60
       |  FROM sh),
       |bits AS (SELECT doc_id, $bitSums FROM shh2 GROUP BY doc_id),
       |fps AS (SELECT doc_id, $fp AS fp FROM bits)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "text_stats" ->
      s"""WITH $sqlToks
         |SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(list_sum(list_transform(t,
         |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT)
         |    AS bpe_tokens,
         |  $sqlQuality AS quality,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |    / greatest(len(t), 1), 6) AS avg_wlen
         |FROM toks ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      s"""WITH $sqlToks
         |$sqlLang
         |ORDER BY doc_id""".stripMargin,
    "fingerprints" ->
      s"""WITH norm AS (SELECT doc_id,
         |  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
         |  FROM documents)
         |SELECT doc_id, ${sqlPolyHash("nt")} AS fp
         |FROM norm ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    // DuckDB sum(BIGINT) returns HUGEINT; the driver hashes the serialized
    // value, so every aggregate is CAST to the Spark output type (BIGINT)
    "sample_split" ->
      s"""SELECT ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} % 10 AS split_id,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same delta synthesized in SQL, winner via QUALIFY row_number
    // over (version DESC) — side-tiebreak is irrelevant here because the
    // synthetic versions are unique per key
    "merge_upsert" ->
      s"""WITH base AS (SELECT doc_id, text, lang, source, n_chars,
         |    0 AS version, FALSE AS is_delete FROM documents),
         |mods AS (SELECT doc_id, text || ' v2', lang, source, n_chars + 3,
         |    1, FALSE FROM documents WHERE doc_id % 7 = 3),
         |ins AS (SELECT doc_id + 1000000, text, lang, source, n_chars,
         |    1, FALSE FROM documents WHERE doc_id % 11 = 5),
         |dels AS (SELECT doc_id, text, lang, source, n_chars,
         |    2, TRUE FROM documents WHERE doc_id % 13 = 7),
         |u AS (SELECT * FROM base UNION ALL SELECT * FROM mods
         |  UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM dels),
         |w AS (SELECT *, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY version DESC) AS rn FROM u)
         |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
         |  ${sqlPolyHash("text")} AS fp
         |FROM w WHERE rn = 1 AND NOT is_delete
         |ORDER BY doc_id""".stripMargin,
    // identical to sample_split by construction — the round-trip must be
    // lossless for this to hash-match
    "corpus_write" ->
      s"""SELECT ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} % 10 AS split_id,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // aggregates the parquet original directly — hash-equality proves the
    // engine's ORC write/read changed no value
    "source_orc" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(${sqlPolyHash("text")}) AS BIGINT) AS fp_sum
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "pack_sequences" ->
      s"""WITH $sqlToks,
         |tk AS (SELECT doc_id,
         |  ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} % 10 AS split_id,
         |  CAST(coalesce(list_sum(list_transform(t,
         |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT)
         |    AS toks
         |  FROM toks),
         |c AS (SELECT split_id, doc_id, toks,
         |  coalesce(sum(toks) OVER (PARTITION BY split_id ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM tk)
         |SELECT split_id, CAST(cum // $SeqLen AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_tokens
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "corpus_curate" ->
      s"""WITH $sqlToks,
         |lang AS ($sqlLang),
         |scored AS (SELECT doc_id, text, $sqlQuality AS q FROM toks),
         |filtered AS (SELECT s.doc_id, s.text, s.q FROM scored s
         |  JOIN lang l ON s.doc_id = l.doc_id
         |  WHERE l.lang_pred = 'en' AND s.q >= $QualityMin),
         |kept AS (SELECT min(doc_id) AS keep_id FROM filtered
         |  GROUP BY text),
         |ktoks AS (SELECT tk.t FROM kept k JOIN toks tk
         |  ON tk.doc_id = k.keep_id)
         |SELECT (SELECT count(*) FROM filtered) AS n_filtered,
         |  round((SELECT avg(q) FROM filtered), 6) AS avg_quality,
         |  (SELECT count(*) FROM kept) AS n_kept,
         |  (SELECT CAST(sum(CAST(len(t) AS BIGINT)) AS BIGINT)
         |   FROM ktoks) AS kept_tokens""".stripMargin,
    "sample_strata" ->
      s"""WITH $sqlToks,
         |lang AS ($sqlLang),
         |s AS (SELECT d.doc_id, d.n_chars, l.lang_pred,
         |    ${sqlPolyHash("CAST(d.doc_id AS VARCHAR)")} % 10000 AS h
         |  FROM documents d JOIN lang l ON d.doc_id = l.doc_id)
         |SELECT lang_pred, count(*) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM s
         |WHERE h < CASE lang_pred WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
         |          ELSE 10000 END
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "decontam" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |ev AS (SELECT DISTINCT h FROM shh WHERE doc_id < 5)
         |SELECT s.doc_id, count(*) AS n_shared
         |FROM shh s JOIN ev ON s.h = ev.h
         |WHERE s.doc_id >= 5
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same CTEs as decontam, but driven from ALL corpus docs (left joins
    // keep zero-overlap and shingle-less rows); the flag thresholds the
    // 6dp-rounded fraction in both engines
    "decontam_frac" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |ev AS (SELECT DISTINCT h FROM shh WHERE doc_id < 5),
         |tot AS (SELECT doc_id, count(*) AS ns FROM shh
         |  WHERE doc_id >= 5 GROUP BY 1),
         |ovl AS (SELECT s.doc_id, count(*) AS c FROM shh s JOIN ev USING (h)
         |  WHERE s.doc_id >= 5 GROUP BY 1),
         |f AS (SELECT d.doc_id,
         |    CAST(coalesce(t.ns, 0) AS BIGINT) AS n_shingles,
         |    CAST(coalesce(o.c, 0) AS BIGINT) AS n_shared,
         |    CASE WHEN coalesce(t.ns, 0) = 0 THEN 0.0
         |         ELSE round(CAST(coalesce(o.c, 0) AS DOUBLE) / t.ns, 6) END
         |      AS contam_frac
         |  FROM documents d LEFT JOIN tot t ON d.doc_id = t.doc_id
         |  LEFT JOIN ovl o ON d.doc_id = o.doc_id
         |  WHERE d.doc_id >= 5)
         |SELECT doc_id, n_shingles, n_shared, contam_frac,
         |  contam_frac >= $ContamTau AS contaminated
         |FROM f ORDER BY doc_id""".stripMargin,
    // chr(769) is U+0301 combining acute — the same decomposition the
    // Spark gate applies; nfc_normalize must recompose every e+◌́ to é
    "text_nfc" ->
      s"""WITH deco AS (SELECT doc_id,
         |    replace(text, 'e', 'e' || chr(769)) AS dt FROM documents),
         |n AS (SELECT doc_id, dt, nfc_normalize(dt) AS nt FROM deco)
         |SELECT doc_id, CAST(length(dt) AS BIGINT) AS len_deco,
         |  CAST(length(nt) AS BIGINT) AS len_nfc,
         |  ${sqlPolyHash("nt")} AS nfc_fp
         |FROM n ORDER BY doc_id""".stripMargin,
    // arithmetic mirrored subexpression-for-subexpression from
    // LexicalRank.bm25 (literal constants interpolated from the SAME
    // Scala values, so both engines parse identical doubles)
    "bm25_rank" -> {
      val tfs = Bm25Terms.indices.map { i =>
        s"CAST(len(list_filter(t, w -> w = '${Bm25Terms(i)}')) AS DOUBLE) AS tf$i"
      }.mkString(",\n  ")
      val dfs = Bm25Terms.indices.map { i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i"
      }.mkString(",\n  ")
      val ws = Bm25Terms.indices.map { i =>
        s"round(round(ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)), 6) * " +
          s"((tf$i * ${Bm25K1 + 1}) / (tf$i + $Bm25K1 * " +
          s"(${1.0 - Bm25B} + $Bm25B * dl / avgdl))), 6)"
      }
      val scoreExpr = ws.reduceLeft((a, b) => s"($a + $b)")
      s"""WITH $sqlToks,
         |st AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
         |  $tfs
         |  FROM toks),
         |g AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n,
         |  $dfs FROM st),
         |sc AS (SELECT doc_id, round($scoreExpr, 6) AS score FROM st, g),
         |ranked AS (SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM sc WHERE score > 0)
         |SELECT doc_id, score, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $Bm25TopN ORDER BY rank""".stripMargin
    },
    // the inverted-index mirror: postings → per-(doc,term) tf → df join →
    // 6dp weights lifted to exact integers (round(w·10⁶) → BIGINT, both
    // engines round-half-away on the non-negative weights, then the cast
    // is exact) → order-free integer sum → one division + 6dp round
    // one shared pair CTE, one leg per tau over the rounded jaccard
    "tau_sweep" -> {
      val legs = TauGrid.map { tau =>
        val pct = math.round(tau * 100).toInt
        s"""SELECT $pct AS tau_pct,
           |  (SELECT CAST(count(*) AS BIGINT) FROM pj WHERE j >= $tau)
           |    AS n_pairs,
           |  (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM (
           |     SELECT id_a AS id FROM pj WHERE j >= $tau
           |     UNION ALL SELECT id_b FROM pj WHERE j >= $tau))
           |    AS n_docs_affected""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pj AS (SELECT id_a, id_b,
         |    round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS j
         |  FROM inter JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau)
         |$legs
         |ORDER BY tau_pct""".stripMargin
    },
    // dedup_groups' component CTE aggregated twice: group -> size ->
    // size histogram, singletons included via the left join
    "dup_size_hist" ->
      s"""WITH RECURSIVE $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS gid FROM walk GROUP BY id),
         |lab AS (SELECT d.doc_id, coalesce(c.gid, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |gs AS (SELECT group_id, CAST(count(*) AS BIGINT) AS gsize
         |  FROM lab GROUP BY group_id)
         |SELECT gsize, CAST(count(*) AS BIGINT) AS n_groups
         |FROM gs GROUP BY gsize ORDER BY gsize""".stripMargin,
    // rank of the relevant (lowest-id) doc under (tf desc, doc_id) =
    // 1 + |{tf > rel_tf}| — the tie clause vanishes because no matching
    // doc has a smaller id than the qrel by construction
    "mrr_eval" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
      s"""WITH $sqlToks,
         |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
         |p AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok WHERE token IN $termList GROUP BY 1, 2),
         |rel AS (SELECT token, min(doc_id) AS rel_id FROM p GROUP BY 1),
         |rt AS (SELECT p.token, r.rel_id, p.tf AS rel_tf
         |  FROM p JOIN rel r ON p.token = r.token AND p.doc_id = r.rel_id),
         |a AS (SELECT p.token, CAST(count(*) AS BIGINT) AS n_matching,
         |    CAST(sum(CASE WHEN p.tf > rt.rel_tf THEN 1 ELSE 0 END) + 1
         |      AS BIGINT) AS rel_rank,
         |    max(rt.rel_id) AS rel_id
         |  FROM p JOIN rt USING (token) GROUP BY p.token)
         |SELECT token, n_matching, rel_rank, rel_id,
         |  CAST(1000000 // rel_rank AS BIGINT) AS rr_ppm
         |FROM a ORDER BY token""".stripMargin
    },
    // same postings + graded qrels; ranks via per-token row_number, rank
    // discounts the SAME baked literals the Spark side uses (VARCHAR →
    // DOUBLE cast = strtod = the JVM's parse, so the bits match by
    // construction)
    "ndcg_eval" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
      val discRows = NdcgDiscounts.zipWithIndex.map { case (d, i) =>
        s"(${i + 1}, CAST('$d' AS DOUBLE))"
      }.mkString(",\n  ")
      s"""WITH $sqlToks,
         |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
         |p AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok WHERE token IN $termList GROUP BY 1, 2),
         |rel0 AS (SELECT token, min(doc_id) AS rel_id FROM p GROUP BY 1),
         |g AS (SELECT p.token, p.doc_id, p.tf,
         |    CASE WHEN p.doc_id = r.rel_id THEN 3
         |         WHEN p.doc_id % 7 = 0 THEN 2
         |         WHEN p.doc_id % 3 = 0 THEN 1 ELSE 0 END AS rel
         |  FROM p JOIN rel0 r USING (token)),
         |d AS (SELECT * FROM (VALUES
         |  $discRows) t(rk, disc)),
         |ranked AS (SELECT token, doc_id, rel, row_number() OVER (
         |    PARTITION BY token ORDER BY tf DESC, doc_id) AS rk FROM g),
         |dcg AS (SELECT token,
         |    sum(CAST((1 << rel) - 1 AS DOUBLE) * disc) AS dcg
         |  FROM ranked JOIN d USING (rk) WHERE rk <= $NdcgK
         |  GROUP BY token),
         |iranked AS (SELECT token, rel, row_number() OVER (
         |    PARTITION BY token ORDER BY rel DESC, doc_id) AS rk FROM g),
         |idcg AS (SELECT token,
         |    sum(CAST((1 << rel) - 1 AS DOUBLE) * disc) AS idcg
         |  FROM iranked JOIN d USING (rk) WHERE rk <= $NdcgK
         |  GROUP BY token),
         |nm AS (SELECT token, CAST(count(*) AS BIGINT) AS n_matching
         |  FROM g GROUP BY token)
         |SELECT token, n_matching, round(dcg, 6) AS dcg,
         |  round(idcg, 6) AS idcg, round(dcg / idcg, 6) AS ndcg
         |FROM nm JOIN dcg USING (token) JOIN idcg USING (token)
         |ORDER BY token""".stripMargin
    },
    // same per-epoch hash keys; position via per-epoch row_number − 1,
    // which PrefixScan reproduces by construction
    "epoch_shuffle" -> {
      val legs = Seq(0, 1).map(e =>
        s"""SELECT doc_id, $e AS epoch,
           |  ${sqlPolyHash(s"'$e:' || CAST(doc_id AS VARCHAR)")} AS h
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH e AS ($legs)
         |SELECT doc_id, epoch, h,
         |  row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) - 1
         |    AS pos
         |FROM e ORDER BY epoch, pos""".stripMargin
    },
    // positional postings per phrase term, shifted to a common start
    // position and intersected — the base offset (Spark 0-based, range()
    // 1-based) cancels inside each engine's own join
    "phrase_match" -> {
      val legs = Phrase.zipWithIndex.map { case (w, i) =>
        s"m$i AS (SELECT doc_id, p - $i AS p FROM pos WHERE w = '$w')"
      }.mkString(",\n")
      val joins = (1 until Phrase.length)
        .map(i => s"JOIN m$i USING (doc_id, p)").mkString(" ")
      s"""WITH $sqlToks,
         |pos AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS p,
         |    unnest(t) AS w FROM toks),
         |$legs
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM m0 $joins
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "bm25_adhoc" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
      s"""WITH $sqlToks,
         |lens AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
         |g AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n
         |  FROM lens),
         |post AS (SELECT doc_id, dl, w AS term FROM (
         |    SELECT toks.doc_id, lens.dl, unnest(t) AS w
         |    FROM toks JOIN lens ON toks.doc_id = lens.doc_id)
         |  WHERE w IN $termList),
         |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
         |  FROM post GROUP BY 1, 2, 3),
         |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
         |  FROM tf GROUP BY 1),
         |wts AS (SELECT doc_id,
         |    CAST(round(round(round(ln(1.0 + (n - df + 0.5) / (df + 0.5)), 6)
         |      * ((tf * ${Bm25K1 + 1}) / (tf + $Bm25K1 *
         |        (${1.0 - Bm25B} + $Bm25B * dl / avgdl))), 6)
         |      * 1000000) AS BIGINT) AS wq
         |  FROM tf JOIN dft ON tf.term = dft.term, g),
         |sc AS (SELECT doc_id,
         |    round(CAST(sum(wq) AS DOUBLE) / 1000000.0, 6) AS score
         |  FROM wts GROUP BY doc_id),
         |ranked AS (SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM sc WHERE score > 0)
         |SELECT doc_id, score, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $Bm25TopN ORDER BY rank""".stripMargin
    },
    "jaccard_pairs" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
         |FROM inter JOIN sizes sa ON id_a = sa.doc_id
         |JOIN sizes sb ON id_b = sb.doc_id
         |WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= $JaccardTau
         |ORDER BY id_a, id_b""".stripMargin,
    // brute directed-containment oracle: every co-shingled ordered pair,
    // |A∩B| counted by the h-join, normalized by |A| only
    "containment_pairs" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(c AS DOUBLE) / sa.n, 6) AS containment
         |FROM inter JOIN sizes sa ON id_a = sa.doc_id
         |WHERE round(CAST(c AS DOUBLE) / sa.n, 6) >= $ContainTau
         |ORDER BY id_a, id_b""".stripMargin,
    // winnowing as the row-windowed mirror of the engine's per-doc local
    // scan: same enc = h*2^20 + (2^20-1-pos) encoding, window-min per
    // start, distinct selections, per-doc integer summaries
    "winnow_fp" ->
      s"""WITH $sqlWinnowSel,
         |agg AS (SELECT doc_id, count(*) AS n_fp,
         |    sum(enc // 1048576) AS h_sum,
         |    sum(1048575 - (enc % 1048576)) AS pos_sum
         |  FROM sel GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
         |  CAST(coalesce(a.h_sum, 0) AS BIGINT) AS h_sum,
         |  CAST(coalesce(a.pos_sum, 0) AS BIGINT) AS pos_sum
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // shared-fingerprint pair counts over the same winnowed selection,
    // distinct on the HASH per doc exactly like the engine
    "winnow_pairs" ->
      s"""WITH $sqlWinnowSel,
         |fp0 AS (SELECT DISTINCT doc_id, enc // 1048576 AS h FROM sel),
         |rare AS (SELECT h FROM fp0 GROUP BY h
         |  HAVING count(*) <= $WinnowMaxDf),
         |fp AS (SELECT f.doc_id, f.h FROM fp0 f JOIN rare r ON f.h = r.h)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*) AS n_shared
         |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $WinnowShare
         |ORDER BY id_a, id_b""".stripMargin,
    // the Jaccard pair set joined back to texts, edit distance exact in
    // both engines (ASCII corpus — see the gate comment)
    "edit_pairs" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau)
         |SELECT j.id_a, j.id_b,
         |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit,
         |  round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
         |    greatest(length(da.text), length(db.text), 1), 6) AS edit_sim
         |FROM jp j JOIN documents da ON da.doc_id = j.id_a
         |JOIN documents db ON db.doc_id = j.id_b
         |ORDER BY id_a, id_b""".stripMargin,
    // exact heavy hitters: the MG candidate pass is a superset, so the
    // oracle needs only the exact group-count + the same strict threshold
    "heavy_hitters" ->
      s"""WITH $sqlToks,
         |tok AS (SELECT unnest(t) AS token FROM toks),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
         |agg AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1)
         |SELECT token, tf, tf * 1000000 // n AS freq_ppm
         |FROM agg, n WHERE tf * 32 > n
         |ORDER BY tf DESC, token""".stripMargin,
    "jw_pairs" ->
      s"""WITH p AS (SELECT p_partkey, p_name,
         |  split_part(p_name, ' ', 2) AS noun, substr(p_name, 1, 1) AS ini
         |  FROM part),
         |pr AS (SELECT a.noun,
         |  CAST(round(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000)
         |    AS BIGINT) AS ppm
         |  FROM p a JOIN p b
         |    ON a.noun = b.noun AND a.ini = b.ini AND a.p_partkey < b.p_partkey)
         |SELECT noun, count(*) AS n_pairs,
         |  CAST(sum(ppm) AS BIGINT) AS sum_jw_ppm,
         |  max(ppm) AS max_jw_ppm, min(ppm) AS min_jw_ppm
         |FROM pr GROUP BY noun ORDER BY noun""".stripMargin,
    "lang_confusion" -> {
      s"""WITH $sqlToks,
         |lang AS ($sqlLang)
         |SELECT d.lang, l.lang_pred, count(*) AS n_docs
         |FROM documents d JOIN lang l ON d.doc_id = l.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // jaccard_pairs' exact oracle restricted to pairs with at least one
    // NEW document (id >= split) — old-old pairs excluded like the
    // engine's candidate join does
    "dedup_incremental" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  WHERE NOT (a.doc_id < $IncrSplit AND b.doc_id < $IncrSplit)
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
         |FROM inter JOIN sizes sa ON id_a = sa.doc_id
         |JOIN sizes sb ON id_b = sb.doc_id
         |WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= $JaccardTau
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_groups" ->
      s"""WITH RECURSIVE $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS gid FROM walk GROUP BY id)
         |SELECT d.doc_id, coalesce(c.gid, d.doc_id) AS group_id
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |ORDER BY doc_id""".stripMargin,
    // dedup_groups' component CTE joined back to sources; kept = the
    // component minimum (or a singleton)
    "dedup_rate" ->
      s"""WITH RECURSIVE $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS gid FROM walk GROUP BY id),
         |lab AS (SELECT d.source,
         |    CASE WHEN d.doc_id = coalesce(c.gid, d.doc_id)
         |      THEN 0 ELSE 1 END AS dropped
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dropped) AS BIGINT) AS n_dropped,
         |  CAST((CAST(sum(dropped) AS BIGINT) * 1000000) // count(*)
         |    AS BIGINT) AS drop_ppm
         |FROM lab GROUP BY source ORDER BY source""".stripMargin,
    // same jaccard graph + CC as dedup_groups; split = PolyHash(group)
    // mod 10 → 8/1/1, leaks recomputed from the oracle's own pair set
    "leakage_split" ->
      s"""WITH RECURSIVE $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS gid FROM walk GROUP BY id),
         |lab AS (SELECT d.doc_id,
         |    coalesce(c.gid, d.doc_id) AS group_id,
         |    CASE WHEN ${sqlPolyHash("CAST(coalesce(c.gid, d.doc_id) AS VARCHAR)")} % 10 <= 7
         |      THEN 'train'
         |      WHEN ${sqlPolyHash("CAST(coalesce(c.gid, d.doc_id) AS VARCHAR)")} % 10 = 8
         |      THEN 'val' ELSE 'test' END AS split
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |summary AS (SELECT split, count(*) AS n_docs,
         |    count(DISTINCT group_id) AS n_groups FROM lab GROUP BY split),
         |leaks AS (SELECT la.split, count(*) AS lk
         |  FROM pairs p JOIN lab la ON p.id_a = la.doc_id
         |  JOIN lab lb ON p.id_b = lb.doc_id
         |  WHERE la.split <> lb.split GROUP BY la.split)
         |SELECT s.split, CAST(s.n_docs AS BIGINT) AS n_docs,
         |  CAST(s.n_groups AS BIGINT) AS n_groups,
         |  CAST(coalesce(l.lk, 0) AS BIGINT) AS leaked_pairs
         |FROM summary s LEFT JOIN leaks l ON s.split = l.split
         |ORDER BY s.split""".stripMargin,
    // starts replayed as the list range(1, n+1, stride); chunk_idx is
    // pure integer arithmetic ((start-1) div stride); list_slice clamps
    // the final short chunk exactly like Spark's slice
    "doc_chunks" ->
      s"""WITH $sqlToks,
         |st AS (SELECT doc_id,  t,
         |    unnest(range(1, len(t) + 1, $ChunkStride)) AS s
         |  FROM toks WHERE len(t) >= 1),
         |ch AS (SELECT doc_id,
         |    CAST((s - 1) // $ChunkStride AS INT) AS chunk_idx,
         |    CAST(s AS INT) AS start,
         |    list_slice(t, s, s + $ChunkLen - 1) AS chunk
         |  FROM st)
         |SELECT doc_id, chunk_idx, start,
         |  CAST(len(chunk) AS BIGINT) AS n_tokens,
         |  ${sqlPolyHash("array_to_string(chunk, ' ')")} AS chunk_fp
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    // dedup_groups' recursive-CTE component labels + the 6dp quality
    // score; canonical = rank 1 within the group by (quality desc, id)
    "dedup_canonical" ->
      s"""WITH RECURSIVE $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
         |    >= $JaccardTau),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS gid FROM walk GROUP BY id),
         |g AS (SELECT toks.doc_id, $sqlQuality AS q6,
         |    coalesce(c.gid, toks.doc_id) AS group_id
         |  FROM toks LEFT JOIN comp c ON toks.doc_id = c.id)
         |SELECT doc_id, q6, group_id,
         |  row_number() OVER (PARTITION BY group_id
         |    ORDER BY q6 DESC, doc_id) = 1 AS canonical
         |FROM g ORDER BY doc_id""".stripMargin,
    "minhash_pairs" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |$sqlMinhash
         |SELECT c.id_a, c.id_b,
         |  round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6) AS jaccard
         |FROM cand c JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
         |JOIN sizes sa ON c.id_a = sa.doc_id
         |JOIN sizes sb ON c.id_b = sb.doc_id
         |WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
         |  >= $JaccardTau
         |ORDER BY c.id_a, c.id_b""".stripMargin,
    // minhash_pairs' banded-candidate + exact-verify SQL with the
    // incremental >= 1-new-side filter — the stateful stream's batch-mode
    // output must land exactly here (band geometry shared by construction)
    "dedup_stream" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |$sqlMinhash
         |SELECT c.id_a, c.id_b,
         |  round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6) AS jaccard
         |FROM cand c JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
         |JOIN sizes sa ON c.id_a = sa.doc_id
         |JOIN sizes sb ON c.id_b = sb.doc_id
         |WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
         |  >= $JaccardTau
         |  AND (c.id_a >= $IncrSplit OR c.id_b >= $IncrSplit)
         |ORDER BY c.id_a, c.id_b""".stripMargin,
    // the capped store + recovery union must restore dedup_stream's
    // exact output — same oracle
    "dedup_stream_capped" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |$sqlMinhash
         |SELECT c.id_a, c.id_b,
         |  round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6) AS jaccard
         |FROM cand c JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
         |JOIN sizes sa ON c.id_a = sa.doc_id
         |JOIN sizes sb ON c.id_b = sb.doc_id
         |WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
         |  >= $JaccardTau
         |  AND (c.id_a >= $IncrSplit OR c.id_b >= $IncrSplit)
         |ORDER BY c.id_a, c.id_b""".stripMargin,
    "lsh_recall" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |$sqlMinhash,
         |brute AS (SELECT i.id_a, i.id_b FROM inter i
         |  JOIN sizes sa ON i.id_a = sa.doc_id
         |  JOIN sizes sb ON i.id_b = sb.doc_id
         |  WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
         |    >= $JaccardTau),
         |lsh AS (SELECT c.id_a, c.id_b FROM cand c
         |  JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
         |  JOIN sizes sa ON c.id_a = sa.doc_id
         |  JOIN sizes sb ON c.id_b = sb.doc_id
         |  WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
         |    >= $JaccardTau),
         |nb AS (SELECT count(*) AS n_brute FROM brute),
         |nl AS (SELECT count(*) AS n_lsh FROM lsh),
         |nc AS (SELECT count(*) AS n_common FROM brute b
         |  JOIN lsh l ON b.id_a = l.id_a AND b.id_b = l.id_b)
         |SELECT nb.n_brute, nl.n_lsh, nc.n_common,
         |  CAST(CASE WHEN nb.n_brute > 0
         |    THEN (nc.n_common * 1000000) // nb.n_brute
         |    ELSE 1000000 END AS BIGINT) AS recall_ppm
         |FROM nb CROSS JOIN nl CROSS JOIN nc""".stripMargin,
    // per-candidate signature agreement (64 per-perm min equalities) vs
    // exact Jaccard; LEFT JOIN inter so a fold-collision candidate with
    // zero shared shingles still reports est vs 0
    "minhash_err" -> {
      val nEq = (0 until Bands * Rows)
        .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |$sqlMinhash
         |SELECT c.id_a, c.id_b,
         |  CAST((($nEq) * 1000000) // ${Bands * Rows} AS BIGINT)
         |    AS est_ppm,
         |  CAST((coalesce(i.c, 0) * 1000000) //
         |    (za.n + zb.n - coalesce(i.c, 0)) AS BIGINT) AS exact_ppm,
         |  CAST(abs((($nEq) * 1000000) // ${Bands * Rows} -
         |    (coalesce(i.c, 0) * 1000000) //
         |      (za.n + zb.n - coalesce(i.c, 0))) AS BIGINT) AS err_ppm
         |FROM cand c
         |JOIN sig sa ON c.id_a = sa.doc_id
         |JOIN sig sb ON c.id_b = sb.doc_id
         |JOIN sizes za ON c.id_a = za.doc_id
         |JOIN sizes zb ON c.id_b = zb.doc_id
         |LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
         |ORDER BY c.id_a, c.id_b""".stripMargin
    },
    // cand (the banded candidates) from the shared minhash CTEs; a true
    // candidate is one whose exact Jaccard clears the tau floor
    "lsh_precision" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlShingleHashes,
         |$sqlMinhash,
         |tr AS (SELECT c.id_a, c.id_b FROM cand c
         |  JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
         |  JOIN sizes sa ON c.id_a = sa.doc_id
         |  JOIN sizes sb ON c.id_b = sb.doc_id
         |  WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
         |    >= $JaccardTau),
         |nc AS (SELECT count(*) AS n_candidates FROM cand),
         |nt AS (SELECT count(*) AS n_true FROM tr)
         |SELECT CAST(nc.n_candidates AS BIGINT) AS n_candidates,
         |  CAST(nt.n_true AS BIGINT) AS n_true,
         |  CAST(CASE WHEN nc.n_candidates > 0
         |    THEN (nt.n_true * 1000000) // nc.n_candidates
         |    ELSE 1000000 END AS BIGINT) AS precision_ppm
         |FROM nc CROSS JOIN nt""".stripMargin,
    "simhash_fp" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlSimhash
         |SELECT t.doc_id, coalesce(f.fp, 0) AS fp
         |FROM toks t LEFT JOIN fps f ON t.doc_id = f.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // brute all-pairs mirror of the banded join (full recall at
    // hamming <= 3 by the pigeonhole argument on the gate)
    "simhash_pairs" ->
      s"""WITH $sqlToks,
         |$sqlShingles,
         |$sqlSimhash,
         |f AS (SELECT t.doc_id, coalesce(p.fp, 0) AS fp
         |  FROM toks t LEFT JOIN fps p ON t.doc_id = p.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
         |FROM f a JOIN f b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= $SimhashMaxHam
         |ORDER BY id_a, id_b""".stripMargin,
    "span_dedup" ->
      s"""WITH $sqlToks,
         |$sqlSpanChain
         |SELECT doc_id, span_start, span_end FROM spans
         |ORDER BY doc_id, span_start""".stripMargin,
    "span_strip" ->
      s"""WITH $sqlToks,
         |$sqlSpanChain,
         |tokpos AS (SELECT doc_id, p - 1 AS p, t[p] AS tok
         |  FROM toks, unnest(range(1, len(t) + 1)) u(p)),
         |cov AS (SELECT doc_id, p FROM spans,
         |  unnest(range(span_start, span_end)) u(p)),
         |kept AS (SELECT t.doc_id, t.p, t.tok FROM tokpos t
         |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
         |  WHERE c.p IS NULL),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.txt, '') AS text
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "tfidf_topk" ->
      s"""WITH $sqlToks,
         |tf AS (SELECT doc_id, t2.tok AS token, count(*) AS tf
         |  FROM toks, unnest(t) AS t2(tok) GROUP BY doc_id, t2.tok),
         |dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |nn AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT tf.doc_id, tf.token, tf.tf,
         |    tf.tf * ((1000000 * (SELECT n FROM nn)) // dfx.df) AS score
         |  FROM tf JOIN dfx USING (token)),
         |ranked AS (SELECT doc_id, token, tf, score, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, token) AS rank
         |  FROM scored)
         |SELECT doc_id, token, tf, score, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= $TfidfTopN ORDER BY doc_id, rank""".stripMargin,
    "hash_embed" ->
      s"""WITH $sqlToks,
         |hh AS (SELECT doc_id, ${sqlPolyHash("w")} AS h
         |  FROM toks, unnest(t) AS t2(w)),
         |cells AS (SELECT doc_id, h % $HashDim AS b,
         |    CAST(sum(CASE WHEN (h // $HashDim) % 2 = 0 THEN 1
         |      ELSE -1 END) AS BIGINT) AS v
         |  FROM hh GROUP BY doc_id, h % $HashDim)
         |SELECT doc_id,
         |  CAST(count(CASE WHEN v <> 0 THEN 1 END) AS BIGINT) AS nnz,
         |  CAST(sum(v * v) AS BIGINT) AS norm2,
         |  CAST(coalesce(max(CASE WHEN b = 0 THEN v END), 0) AS BIGINT)
         |    AS b0
         |FROM cells GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "bool_retrieval" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH $sqlToks,
         |post AS (SELECT doc_id, t2.tok AS token
         |  FROM toks, unnest(t) AS t2(tok)
         |  WHERE list_contains($termList, t2.tok))
         |SELECT doc_id, count(*) AS total_tf
         |FROM post GROUP BY doc_id
         |HAVING count(DISTINCT token) = ${Bm25Terms.length}
         |ORDER BY doc_id""".stripMargin
    },
    "block_pairs" ->
      s"""WITH keyed AS (SELECT doc_id,
         |    lang || '|' || substring(text, 1, 16) AS bkey FROM documents),
         |ranked AS (SELECT doc_id, bkey,
         |    row_number() OVER (ORDER BY bkey, doc_id) - 1 AS rank
         |  FROM keyed)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  b.rank - a.rank AS dist,
         |  CAST(CASE WHEN a.bkey = b.bkey THEN 1 ELSE 0 END AS BIGINT)
         |    AS same_key
         |FROM ranked a JOIN ranked b
         |  ON b.rank - a.rank BETWEEN 1 AND ${BlockW - 1}
         |ORDER BY id_a, id_b""".stripMargin)

  /** The duplicated-span pipeline as a CTE chain ending in
    * `spans(doc_id, span_start, span_end)` — 5-gram occurrences,
    * corpus-duplicated hashes, keep-first exemption, gaps-and-islands
    * merge. Mirrors [[graft.operators.Dedup.duplicatedSpans]]; shared by
    * the span_dedup and span_strip oracles. Requires `toks` in scope. */
  private def sqlSpanChain: String =
    s"""occ AS (SELECT doc_id, p - 1 AS p, ${sqlPolyHash("g")} AS h FROM (
       |  SELECT doc_id, p, array_to_string(t[p:p + $SpanN - 1], ' ') AS g
       |  FROM toks, unnest(range(1, len(t) - $SpanN + 2)) u(p)
       |  WHERE len(t) >= $SpanN)),
       |da AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
       |ranked AS (SELECT o.doc_id, o.p, row_number() OVER (
       |    PARTITION BY o.h ORDER BY o.doc_id, o.p) AS rn
       |  FROM occ o JOIN da USING (h)),
       |hits AS (SELECT doc_id, p FROM ranked WHERE rn >= 2),
       |h2 AS (SELECT doc_id, p, max(p + $SpanN) OVER (
       |    PARTITION BY doc_id ORDER BY p
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
       |  FROM hits),
       |isl AS (SELECT doc_id, p, sum(CASE WHEN pme IS NULL OR p >= pme
       |      THEN 1 ELSE 0 END) OVER (
       |    PARTITION BY doc_id ORDER BY p) AS grp
       |  FROM h2),
       |spans AS (SELECT doc_id, CAST(min(p) AS INT) AS span_start,
       |    CAST(max(p) + $SpanN AS INT) AS span_end
       |  FROM isl GROUP BY doc_id, grp)""".stripMargin
}
