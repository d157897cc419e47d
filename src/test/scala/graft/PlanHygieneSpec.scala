package graft

/** Physical-plan hygiene (the 100 TB checklist): filters reach the parquet
  * scan, projections prune the read schema, dimension joins broadcast.
  * These assert on explain("formatted") output so a regression in plan
  * shape fails loudly, not just slowly.
  */
class PlanHygieneSpec extends GraftSuite {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q6 filter is pushed to the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate predicate must reach the scan")
  }

  test("q1 scan reads only the projected columns") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"unprojected columns read: $readSchema")
  }

  test("q2 dimension joins are broadcast") {
    val p = plan("q2_join")
    assert(p.contains("BroadcastHashJoin"), "nation/region should broadcast")
    assert(!p.contains("SortMergeJoin"), "no shuffle join for tiny dims")
  }

  test("whole-stage codegen covers the q1 aggregate") {
    // AQE wraps the plan until execution, hiding codegen spans — check
    // the plan shape with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q1_agg")(spark, sf0001)
      // `*(n)` prefixes mark WholeStageCodegen spans in plan toString
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*(1) HashAggregate") || p.contains("*(2) HashAggregate"),
        s"agg must stay in codegen:\n${p.take(400)}")
      assert(p.contains("partial_sum"), "map-side partial aggregation expected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("grid eps-join plans as an equi hash join, not a cartesian") {
    val p = plan("eps_neighbors")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "grid blocking must produce an equi-join plan")
  }

  test("jaccard prefix join plans as an equi join, not a cartesian") {
    val p = plan("jaccard_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "prefix filtering must produce an equi-join plan")
  }

  test("temporal joins (asof, lookback) plan without cartesians") {
    for (q <- Seq("events_asof", "events_lookback")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a cartesian/nested-loop join")
    }
  }

  test("decontam broadcasts the eval hash set; corpus never self-joins") {
    val p = plan("decontam")
    assert(p.contains("BroadcastHashJoin"),
      "eval shingle hashes must broadcast into the semi-join")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the corpus side must not shuffle-join")
  }

  test("bm25 broadcasts the one-row global stats; no corpus shuffle join") {
    val p = plan("bm25_rank")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the scalar stats row must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "scoring must not shuffle-join the corpus")
  }

  test("bm25 top-k is a TakeOrdered, not an unpartitioned corpus window") {
    // the rank window must run over the k limited rows, never the full
    // score-filtered stream (a single-task sort at corpus scale)
    for (q <- Seq("bm25_rank", "bm25_adhoc", "sample_weighted")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q top-k must plan as TakeOrderedAndProject:\n${p.take(800)}")
    }
  }

  test("bm25_adhoc: keyed shuffles + broadcasts only, no corpus self-join") {
    val p = plan("bm25_adhoc")
    assert(!p.contains("CartesianProduct"),
      "postings scoring must not cross-join the corpus")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the df table and global stats must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no corpus-sized shuffle join: df/stats are broadcast, " +
        "aggregations are keyed groupBys")
  }

  test("domain_mix broadcasts the one-row normalizer; weights sum to 1") {
    val p = plan("domain_mix")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the (z, tot) scalar row must broadcast into the per-source attach")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "mixture weighting must not shuffle-join")
    val rows = SparkEntry.queries("domain_mix")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must normalize, got $wsum")
    // epochs conserve the token budget: Σ epochs_s · n_s = Σ n_s
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val spent = rows.map(r =>
      r.getAs[Double]("epochs") * r.getAs[Long]("n_tokens")).sum
    assert(math.abs(spent / tot - 1.0) < 1e-4,
      s"epochs must conserve the budget: spent $spent of $tot")
  }

  test("decontam_frac broadcasts the eval set; corpus never self-joins") {
    val p = plan("decontam_frac")
    assert(p.contains("BroadcastHashJoin"),
      "eval shingle hashes must broadcast into the hit-marking join")
    assert(!p.contains("CartesianProduct"),
      "the corpus side must not cross-join")
  }

  test("surprisal_score: token-keyed equi-joins plus a 1-row broadcast only") {
    val p = plan("surprisal_score")
    assert(!p.contains("CartesianProduct"),
      "the vocabulary join must stay an equi-join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the corpus-total scalar row must broadcast")
  }

  test("kmeans_assign and ann_ivf_fixed plan without cartesians") {
    for (q <- Seq("kmeans_assign", "ann_ivf_fixed")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian (centroids ride as reference objects)")
    }
  }

  test("cluster_select: kernel bucket assign, bucket-partitioned rank") {
    val p = plan("cluster_select")
    assert(!p.contains("CartesianProduct"),
      "bucket assignment must be the nearest_centroids projection, " +
        "not a centroid join")
    // the rank window is PARTITIONED (by bucket) — a global window here
    // would serialize the corpus through one task
    val windows = SparkEntry.queries("cluster_select")(spark, sf0001)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty, "per-bucket rank expected")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "rank window must be bucket-partitioned, never global")
  }

  test("bpe_pairs top-k is a TakeOrdered over the pair counts") {
    val p = plan("bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"pair top-k must plan as TakeOrderedAndProject:\n${p.take(800)}")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "pair counting must partial-aggregate map-side")
  }

  test("stratified sampling evaluates the derived stratum once per operator") {
    // Predicate pushdown inlines lang_pred's langId tree into the filter:
    // one langId = one marker-list scan per language (5 array_contains).
    // A CASE-chain threshold or a two-reference fallback in langId
    // re-inlines the whole tree per reference — this pins the fixed shape
    // of exactly one langId in the Filter and one in the Project (10
    // total), so per-row text scoring can't silently multiply again.
    val p = plan("sample_strata")
    val n = "array_contains".r.findAllIn(p).length
    assert(n == 2 * graft.functions.TextFunctions.LangMarkers.length,
      s"expected one langId inlining in Filter and one in Project " +
        s"(${2 * graft.functions.TextFunctions.LangMarkers.length} " +
        s"array_contains), saw $n — a threshold or fallback is " +
        "re-referencing the derived stratum")
  }

  test("sign-band and minhash kernel expressions compare structurally") {
    // Reference-compared Array fields defeat canonicalization-based
    // ReuseExchange and subexpression elimination across analyzer-cloned
    // instances; these kernels must stay value-comparable.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.ColumnBridge.expression
    val v = col("v")
    assert(expression(graft.functions.VecKernels.sign_bands(v, 8, 5, 4)) ==
      expression(graft.functions.VecKernels.sign_bands(v, 8, 5, 4)),
      "independently built sign_bands must be equal")
    assert(expression(graft.functions.TextKernels.minhash_sig(v, 16)) ==
      expression(graft.functions.TextKernels.minhash_sig(v, 16)),
      "independently built minhash_sig must be equal")
    val cents = Seq(0 -> Array(1.0, 2.0), 1 -> Array(3.0, 4.0))
    assert(expression(graft.functions.VecKernels.nearest_centroids(
        v, cents, 1, cosine = false)) ==
      expression(graft.functions.VecKernels.nearest_centroids(
        v, Seq(0 -> Array(1.0, 2.0), 1 -> Array(3.0, 4.0)), 1, cosine = false)),
      "nearest_centroids with equal centroid values must be equal")
  }

  test("bloom probe is a literal-array projection, not a join") {
    // the probe side of Bloom semi-join pushdown must stay a pure
    // scan + filter: the bitmap rides in as a broadcast literal, so the
    // corpus side joins NOTHING until the exact-verify step
    import org.apache.spark.sql.functions._
    val d = graft.core.Tables.table(spark, sf0001, "documents")
    val words = new Array[Long](4096 / 32).map(_ => 0x5a5a5a5aL)
    val probe = d
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .where(graft.operators.Sketches.mightContain(col("token"), words, 4096, 3))
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"bloom probe must be shuffle- and join-free:\n${p.take(800)}")
  }

  test("overlap_matrix is join-free: one bit_or groupBy, no self-join") {
    // the bitmask plan's whole point is that the corpus-sized side
    // passes through exactly one aggregation and never joins itself
    val p = plan("overlap_matrix")
    assert(!p.contains("Join"),
      "overlap_matrix regressed to a join-based plan")
    assert(p.contains("bit_or"), "presence-mask bit_or agg missing")
  }

  test("winnow_fp and skipgram pair GENERATION are shuffle-free projections") {
    // both are document-local by design: the only exchanges allowed are
    // the downstream aggregation/ordering, never a join or a doc shuffle
    val pw = plan("winnow_fp")
    assert(!pw.contains("Join"), "winnowing must not join anything")
    val ps = plan("skipgram_pairs")
    assert(!ps.contains("Join"), "skip-gram generation must not join")
    assert(ps.contains("TakeOrderedAndProject"),
      s"skipgram top-k must plan as TakeOrdered:\n${ps.take(800)}")
  }

  test("containment candidates plan as an equi join, not a cartesian") {
    val p = plan("containment_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"prefix-filter candidate join must stay an equi-join:\n${p.take(800)}")
  }

  test("knn_graph ranks through an id-partitioned window, never a global one") {
    val p = plan("knn_graph")
    assert(p.contains("Window"), "rank window expected")
    // the window's exchange must hash-partition by the vector id — a
    // SinglePartition exchange here would funnel the corpus through one task
    assert(p.contains("hashpartitioning(id"),
      s"window must partition by id:\n${p.take(800)}")
    assert(!p.contains("SinglePartition"), "no global window/exchange allowed")
  }

  test("basket pair generation is a user-keyed equi-join with broadcast supports") {
    val p = plan("basket_pairs")
    assert(!p.contains("CartesianProduct"),
      s"basket self-join must stay keyed by user:\n${p.take(800)}")
    // the two item-support attaches and the 1-row n_users attach ride as
    // broadcasts — a SortMergeJoin here means a support table shuffled
    assert(!p.contains("SortMergeJoin"),
      s"support joins must broadcast:\n${p.take(800)}")
  }

  test("q11 pushes the date filter to the orders scan and broadcasts dims") {
    val p = plan("q11_region_revenue")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThanOrEqual(o_orderdate") ||
        p.contains("IsNotNull(o_orderdate)")),
      s"date range must reach the orders parquet scan:\n${p.take(900)}")
    assert(p.contains("BroadcastHashJoin"),
      "nation/region/supplier dims should broadcast")
    assert(!p.contains("CartesianProduct"), "no cartesians in the Q5 shape")
  }

  test("dsir_weights selects through TakeOrdered with broadcast weights") {
    val p = plan("dsir_weights")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k selection must never be a global sort/window:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"),
      s"the 256-row weight table and lang attach must broadcast:\n${p.take(800)}")
  }

  test("compact_plan scans through a range partition, not a per-source window") {
    val p = plan("compact_plan")
    assert(p.contains("rangepartitioning"),
      s"the running sum must range-partition (PrefixScan):\n${p.take(800)}")
  }

  test("jl_project is a join-free projection (16 dot kernels, one pass)") {
    val p = plan("jl_project")
    assert(!p.contains("Join"),
      s"the sign matrix must ride as literals, never a join:\n${p.take(800)}")
  }

  test("block_pairs neighborhood join is an equi-join on the rank bucket") {
    val p = plan("block_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"sorted-neighborhood join must stay bucket-keyed:\n${p.take(800)}")
  }

  test("avg_precision ranks through PrefixScan, never a global window") {
    val p = plan("avg_precision")
    assert(p.contains("rangepartitioning"),
      s"the packed rank/Σpos scan must range-partition:\n${p.take(800)}")
    assert(!p.contains("Window [") || p.contains("__pid"),
      "any window must be the per-slice PrefixScan window, not global")
  }

  test("lateness histogram windows per user, never globally") {
    val p = plan("lateness_hist")
    assert(p.contains("hashpartitioning(user_id"),
      s"the running max must key its exchange by user:\n${p.take(800)}")
    assert(!p.contains("SinglePartition"),
      "no stage may funnel the stream through one partition")
  }

  test("q21's EXISTS legs stay orderkey-keyed equi-joins") {
    val p = plan("q21_waiting")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"semi/anti legs must join on orderkey:\n${p.take(800)}")
  }

  test("fk audit joins never fan out or go nested-loop") {
    val p = plan("fk_orphans")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"each relation leg must stay a keyed left join:\n${p.take(800)}")
  }

  test("jw_pairs blocks into an equi-join; scoring stays a projection") {
    val p = plan("jw_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the (noun, initial) blocking must plan an equi-join:\n${p.take(800)}")
    assert(p.contains("jaro_winkler"),
      "the native scoring expression must appear in the plan")
  }

  test("corr_matrix computes all 15 moments in ONE scan") {
    val p = plan("corr_matrix")
    // formatted mode prints each node twice (tree line + detail header);
    // count the "(n) Scan parquet" detail headers only
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"moment matrix must be a single pass, saw $scans scans")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "moment sums must combine map-side")
  }

  test("mutual_info marginals broadcast; the corpus pays one cell agg") {
    val p = plan("mutual_info")
    assert(p.contains("BroadcastHashJoin"),
      s"lang/source marginals must broadcast:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join belongs between cells and tiny marginals")
  }

  test("hilbert_key folds the curve walk into the scan-side projection") {
    val p = plan("hilbert_key")
    assert(p.contains("hilbert_key("),
      "the codegen'd key expression must appear in the plan")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "bucket aggregates must combine map-side before the exchange")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey") && readSchema.contains("l_suppkey")
      && !readSchema.contains("l_orderkey"),
      s"scan must read only the two key columns: $readSchema")
  }

  test("cube_counts plans ONE scan through Expand, not one per grouping") {
    val p = plan("cube_counts")
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"cube must expand one pass, saw $scans scans")
    assert(p.contains("Expand"), "grouping sets should plan an Expand node")
  }

  test("heavy_hitters recount rides a broadcast semi-join") {
    val p = plan("heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidates must broadcast into a semi-join:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"),
      "the corpus-side token stream must not shuffle for the semi-join")
  }

  test("rand_walks frontier joins broadcast — the edge list never shuffles") {
    // The per-step lazy checkpoints (round 15) hide the walk joins from
    // the gate's FINAL plan, so the broadcast shape is pinned on the
    // production step builder itself…
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val outVerts = e.select("src").distinct()
    val cur = Seq((1L, 1L)).toDF("walk", "id")
    val sp = graft.graph.Traversals.walkStep(cur, e, outVerts, 1)
      .queryExecution.executedPlan.toString
    assert(sp.contains("BroadcastHashJoin"),
      s"walk step joins must broadcast the frontier:\n${sp.take(800)}")
    assert(!sp.contains("SortMergeJoin"),
      "no walk step may sort-merge the edge list")
    // …and the gate plan must stay the checkpointed-leg union: shallow
    // ExistingRDD leaves, no join (a join here means a step leaked back
    // into the final plan) and no sort-merge anywhere.
    val p = plan("rand_walks")
    assert(p.contains("ExistingRDD"),
      s"walk legs should be checkpointed LogicalRDD leaves:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"),
      "no walk step may sort-merge the edge list")
  }

  test("group_quantiles plans one exact-percentile aggregation, no sort-based join") {
    val p = plan("group_quantiles")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"percentile should plan an object/sort aggregate:\n${p.take(400)}")
    assert(!p.contains("Join"), "a grouped quantile needs no join at all")
  }

  test("equidepth_hist buckets through a broadcast join, never a global window") {
    val p = plan("equidepth_hist")
    assert(p.contains("BroadcastHashJoin"),
      s"quartile boundaries must broadcast:\n${p.take(600)}")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      "equi-depth bucketing must not sort whole groups in one task")
  }

  test("skip_stats zone probes ride broadcasts, not shuffle joins") {
    val p = plan("skip_stats")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the tiny zone maps must broadcast against the probes:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join belongs in a metadata-scale report")
  }

  test("ktruss wedge joins stay keyed equi-joins, never cartesian") {
    val p = plan("ktruss")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "triangle enumeration must stay an equi-join plan")
  }

  test("q17's per-part average joins back as a broadcast") {
    val p = plan("q17_smallqty")
    assert(p.contains("BroadcastHashJoin"),
      s"the post-brand-filter aggregate is dimension-sized and must broadcast:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), "no cartesian in the decorrelation")
  }

  test("nbr_pool fans out bounded: keyed joins + keyed aggs only") {
    val p = plan("nbr_pool")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the code join and the dim rollup must stay keyed")
  }

  test("bucket_join consumes the bucket layout: no exchange under the join") {
    // at gate SF the orders side would broadcast and the planner would
    // rightly skip the bucket layout — disable auto-broadcast to expose
    // the shape this gate exists for (at 100 TB neither side broadcasts)
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("bucket_join")
      assert(p.contains("Bucketed: true"),
        s"both scans must report the bucket layout:\n${p.take(900)}")
      val joinExchanges = "Exchange hashpartitioning".r
        .findAllIn(p).length
      // the final 5-key aggregate is allowed its one exchange; the join
      // inputs themselves must read co-located buckets
      assert(joinExchanges <= 1,
        s"bucketed join must not re-shuffle its inputs ($joinExchanges hash exchanges):\n${p.take(1200)}")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("kn_counts type tables join onto the 50-row top list by broadcast") {
    val p = plan("kn_counts")
    assert(p.contains("BroadcastHashJoin"),
      s"the truncated top list must broadcast against the count tables:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), "no cartesian in the smoothing joins")
  }

  test("semdedup pair verification is a blocked bucket equi-join, never a cartesian") {
    // the whole point of SemDeDup: the quadratic cosine verify is bounded
    // per cluster via the bucket equi-join — a cartesian here means the
    // clustering stopped bounding the pair work. And the join must key on
    // the triangle-blocking slice pair (bucket, __graft_p, __graft_q),
    // not bucket alone: a bucket-only key puts a skewed mega-bucket's
    // whole O(n_b²) verify in one task at 100×.
    val p = plan("semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cluster pair join must stay an equi-join:\n${p.take(600)}")
    assert(p.contains("__graft_p") && p.contains("__graft_q"),
      s"pair join must key on the slice pair, not the bucket alone:\n${p.take(600)}")
  }

  test("hdbscan_extract labels by broadcast against the selected antichain") {
    // the flat labeling reads the memoized cut-sweep components and joins
    // them against the O(#selected)-row antichain — that join must
    // broadcast (the driver already holds the set), and nothing in the
    // extraction may go cartesian
    val p = plan("hdbscan_extract")
    assert(p.contains("BroadcastHashJoin"),
      s"membership join must broadcast the selected set:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no cartesian in the extraction")
  }

  test("hard_negatives windows stay per-query, candidates bucket-joined") {
    val p = plan("hard_negatives")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the IVF probe must candidate-bound the scoring")
    // the rerank window partitions by q_id — a SinglePartition window
    // would mean the rerank went corpus-global
    assert(!p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      "rerank window must be per-query")
  }

  test("rrf_fusion ranks and fuses per query, never corpus-global") {
    val p = plan("rrf_fusion")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the IVF probe must candidate-bound the fusion pool")
    assert(!p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      "quality and fusion windows must be per-query")
  }

  test("minhash_err joins one doc-side table per pair side") {
    // the round-10 restructure: 2 id-keyed joins (plus the band-key
    // candidate join), not one join per derived column
    val p = plan("minhash_err")
    // FormattedMode prints each operator twice (tree + details), so 3
    // physical joins — band-key candidates + one join per pair side —
    // count as 6; the pre-restructure shape (one join per derived
    // column) was 5 joins = 10 matches
    val smj = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length +
      "BroadcastHashJoin".r.findAllIn(p).length
    assert(smj <= 6,
      s"expected <=3 joins x2 (band candidates + 2 doc sides), got $smj:\n${p.take(800)}")
  }

  test("overflow recovery plans as blocked equi joins with a broadcast size table") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), (col("doc_id") >= 400).as("is_new"))
    val keyed = graft.streaming.StreamingDedup.textBandKeys(
      docs, "doc_id", "text", Some("is_new"), 2, 16, 4)
    val events = graft.streaming.StreamingDedup
      .statefulEventsFromKeys(keyed, maxBucket = 2)
    val p = graft.streaming.StreamingDedup
      .overflowRecoveryPairs(events, keyed)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"recovery join lost its equi keys:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-bucket slice-count table stopped broadcasting:\n${p.take(800)}")
  }
}
