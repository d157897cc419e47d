package graft.dbscan

import graft.functions.Distances
import graft.graph.{ConnectedComponents, GraphAlgs}
import graft.operators.NeighborJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Which graph-connectivity semantics clusters use (SURVEY §2.7 G2/G3):
  * CC absorbs border points into the cluster of the core that reaches them;
  * SCC leaves border points as singleton components (→ noise). `CcGraphX`
  * is the Pregel implementation, kept as an independent cross-check.
  */
sealed trait ClusterMode
case object Cc extends ClusterMode
case object CcGraphX extends ClusterMode
/** Exact SCC via the DBSCAN-graph specialization (GraphAlgs.dbscanScc). */
case object Scc extends ClusterMode
/** The reference's literal bounded-iteration GraphX SCC (SCC.py:174). */
case class SccGraphX(maxIter: Int = 10) extends ClusterMode

/** One DBSCAN run's outputs. `assignments` is per input id:
  * (id, qi, component nullable, is_noise, an_qi nullable) — `an_qi` is the
  * cluster centroid for members and the nearest-cluster centroid for noise
  * (the reference's anonymization, DBSCAN.py:103-117, 126-133).
  */
final case class DbscanModel(
    assignments: DataFrame,
    centroids: DataFrame, // component, centroid, n_members
    nClusters: Long,
    nNoise: Long,
    clusterError: Double,
    noiseError: Double) extends graft.core.QueryCache.Releasable {
  def totalError: Double = clusterError + noiseError
  def unpersist(): Unit = { assignments.unpersist(); centroids.unpersist() }
  override def release(): Unit = unpersist()
}

/** Per-ε record of the sweep (DBSCAN.py eps_records, lines 135-143/198). */
final case class SweepRecord(eps: Double, nClusters: Long, nNoise: Long,
                             clusterError: Double, noiseError: Double,
                             totalError: Double, seconds: Double)

/** DBSCAN as declarative Spark dataflow.
  *
  * The reference pipeline (DBSCAN.py:157-205): cartesian θ-join → minPts
  * filter → edges → GraphFrames connected components → cluster/noise split →
  * centroid + L1 error per cluster → broadcast nearest-centroid for noise.
  *
  * Differences by design, not behavior: the O(n²) cartesian becomes the
  * grid-blocked equi-join ([[NeighborJoin]]); GraphFrames CC becomes the
  * DataFrame-native large-star/small-star ([[ConnectedComponents]]); every
  * per-group Python UDF becomes a codegen'd aggregate.
  */
object Dbscan {

  /** Above this many clusters the kernel noise-assign's component-decode
    * literal array would bloat the plan (and its exhaustive O(k) per-row
    * scan starts to bite), so [[run]] and [[sweepRecordsBatched]] switch
    * to the pruned-exact argmin ([[withPrunedNearest]]) up to
    * the [[MaxAssignElements]] budget, and to the broadcast-join argmin
    * beyond. */
  private[graft] val KernelAssignMaxClusters = 8192

  /** Element budget for the driver-collected centroid matrix behind the
    * pruned assign (the matrix rides the plan as one reference object).
    * The bound is on CENTROIDS × DIM, not centroid count alone — the
    * collect and the per-stage reference object scale with both, so a
    * count-only cap would let a high-dim fit (e.g. 128-dim embeddings)
    * ship a multi-GB matrix. 2^23 doubles is 64 MB flat: at dim 8 that
    * is the old 2^20-centroid ceiling exactly. Above budget the noise
    * assign switches to [[graft.operators.CentroidJoin.assignExact]] —
    * the collect-free coarse-bucket probe join: the centroid table stays
    * distributed, only its O(√k·dim) coarse summary rides the plan, and
    * per-row work is probe-bounded instead of the old broadcast
    * crossJoin's rows × k candidate shuffle. Same min-struct semantics
    * at any k. */
  private[graft] val MaxAssignElements: Long = 1L << 23
  /** Spec hook: lowers the element budget so the join-based regime
    * engages at test scale ([[MaxAssignElements]] otherwise). */
  private[graft] var assignElementBudget: Long = MaxAssignElements
  /** The element budget expressed as a centroid-count ceiling at a
    * given dimensionality. */
  private[graft] def maxAssignCentroids(dim: Int): Long =
    assignElementBudget / math.max(1, dim)

  /** Adds (`ccName`, `dName`) = (nearest centroid's component id, its L1
    * distance) via the [[graft.functions.VecKernels.nearest_centroids]]
    * argmin — one narrow projection, the centroid matrix riding as a
    * codegen reference object. Components are Longs, so the kernel runs
    * over indices 0..n-1 in ascending-component order (kernel ties →
    * lowest index = lowest component id, the min-struct tiebreak) and the
    * index is decoded through a sorted literal array. A null vector yields
    * null in both columns. Shared by [[run]]'s noise assign and
    * [[sweepRecordsBatched]]'s per-ε noise stats so the two paths cannot
    * drift. `sorted` MUST be ascending by component id. */
  private[graft] def withKernelNearest(df: DataFrame, qiCol: String,
                                sorted: IndexedSeq[(Long, Array[Double])],
                                ccName: String, dName: String): DataFrame = {
    val idxCents = sorted.indices.map(i => i -> sorted(i)._2)
    val compArr = array(sorted.map(s => lit(s._1)): _*)
    df.withColumn("__nc", element_at(
        graft.functions.VecKernels.nearest_centroids(
          col(qiCol), idxCents, 1, cosine = false), 1))
      .withColumn(ccName, element_at(compArr, col("__nc.cluster") + 1))
      .withColumn(dName, col("__nc.d"))
      .drop("__nc")
  }

  /** [[withKernelNearest]]'s >8k-cluster sibling: same columns, same
    * labels and bit-equal distances, via the triangle-inequality-pruned
    * exact argmin ([[graft.functions.VecKernels.pruned_nearest]]) —
    * per-row cost O(√k·dim) expected instead of O(k·dim), component ids
    * carried inside the index reference object so the plan stays O(1) in
    * k (no decode-literal array). `sorted` MUST be ascending by
    * component id. A null vector yields null in both columns. */
  private[graft] def withPrunedNearest(df: DataFrame, qiCol: String,
                                sorted: IndexedSeq[(Long, Array[Double])],
                                ccName: String, dName: String): DataFrame =
    df.withColumn("__pn",
        graft.functions.VecKernels.pruned_nearest(col(qiCol), sorted))
      .withColumn(ccName, col("__pn.component"))
      .withColumn(dName, col("__pn.d"))
      .drop("__pn")

  /** Run DBSCAN over points identified by a unique Long `idCol` with
    * `array<double>` coordinates `qiCol`.
    *
    * @param weightCol multiplicity column: the reference runs its cartesian
    *   over the raw (duplicate-bearing) rows, so duplicates count toward
    *   minPts; value-collapsed callers pass the duplicate count here.
    * @param k  k-anonymity parameter: components with fewer than k distinct
    *   members are noise (DBSCAN.py:176-179). Usually == minPts.
    * @param pairsOpt optional precomputed ε-pair set (the epsJoinGrid
    *   output over (id, qi, w) for the SAME points and eps) — callers that
    *   already hold the ε-graph (e.g. the gate registry's per-dir cache)
    *   pass it here so the join isn't rebuilt; it is NOT unpersisted.
    */
  def run(points: DataFrame, idCol: String, qiCol: String, eps: Double,
          minPts: Int, k: Int, mode: ClusterMode = Cc,
          weightCol: Option[String] = None, blockDims: Int = 2,
          pairsOpt: Option[DataFrame] = None): DbscanModel = {
    val spark = points.sparkSession
    val dim = points.select(size(col(qiCol))).head().getInt(0)

    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(qiCol).as("qi"), w.as("w"))

    // ε-neighborhood pairs (self included) via grid blocking; reused by the
    // core-point test and the edge list, so persist across those jobs.
    val ownPairs = pairsOpt.isEmpty
    val pairs = pairsOpt.getOrElse(NeighborJoin
      .epsJoinGrid(pts.select("id", "qi", "w"), "id", "qi", eps, blockDims)
      .persist(StorageLevel.MEMORY_AND_DISK))

    // Core test: the reference's cartesian keys pairs on the point VALUE,
    // so a point with c duplicate copies sees each neighbor c times — its
    // neighbor list is c·Σw_b long. Weighted mode reproduces that as
    // a_w · Σ(b_w) ≥ minPts; unweighted rows have a_w = 1.
    val core = pairs.groupBy(col("a_id"), col("a_w"))
      .agg(sum("b_w").as("nw"))
      .where(col("a_w") * col("nw") >= minPts)
      .select(col("a_id").as("core_id"))

    // Directed edges core → neighbor (flattenPair, DBSCAN.py:119-124,162).
    val edges = pairs
      .join(core, pairs("a_id") === core("core_id"), "left_semi")
      .select(col("a_id").as("src"), col("b_id").as("dst"))

    val comp = mode match {
      case Cc => ConnectedComponents.run(edges)
      case CcGraphX => GraphAlgs.connectedComponents(spark, edges)
      case Scc => GraphAlgs.dbscanScc(edges)
      case SccGraphX(n) => GraphAlgs.stronglyConnectedComponents(spark, edges, n)
    }

    // Every vertex in the edge graph has a component; isolated points do
    // not and are immediately noise. Components with < k distinct members
    // are dissolved into noise too (strictly-less, DBSCAN.py:176).
    val withComp = pts.join(comp, pts("id") === comp("id"), "left")
      .select(pts("id"), col("qi"), col("w"), col("component"))
    val sizes = withComp.where(col("component").isNotNull)
      .groupBy("component").agg(count(lit(1)).as("csize"))
    val labeled = withComp.join(sizes, Seq("component"), "left")
      .select(col("id"), col("qi"), col("w"),
        when(col("csize") >= k, col("component")).as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Centroid = unweighted per-dimension mean over distinct members
    // (calc_error, DBSCAN.py:86-100); one partial-aggregable pass.
    val dimAvgs = (0 until dim).map(i =>
      avg(element_at(col("qi"), i + 1)).as(s"c$i"))
    // Persisted BEFORE first use: the kernel noise-assign collects this
    // aggregate for an_err and re-joins it for an_qi — without the persist
    // those are two jobs whose avg partial-combine order may differ, and
    // an_qi could drift an ulp from the centroid that produced an_err.
    // One materialization keeps an_err == L1(qi, an_qi) exact. Lives as
    // long as the model (like `assignments`); O(nClusters) rows.
    val centroids = labeled.where(col("component").isNotNull)
      .groupBy("component")
      .agg(dimAvgs.head, dimAvgs.tail :+ count(lit(1)).as("n_members"): _*)
      .select(col("component"),
        array((0 until dim).map(i => col(s"c$i")): _*).as("centroid"),
        col("n_members"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nClusters = centroids.count()
    val members = labeled.where(col("component").isNotNull)
    val noise = labeled.where(col("component").isNull)
    val nNoise = noise.count()

    val clusterError =
      if (nClusters == 0) 0.0
      else members.join(centroids, "component")
        .agg(sum(Distances.l1(col("qi"), col("centroid"))))
        .head().getDouble(0)

    // Noise → nearest cluster centroid, L1, ties to the lowest component id
    // (assign_nearest, DBSCAN.py:126-133; broadcast like centroidsBC :188).
    // The argmin is the native [[graft.functions.VecKernels.nearest_centroids]]
    // projection — one pass over the noise rows with the centroid matrix as
    // a codegen reference object, instead of a crossJoin that shuffles
    // |noise|·|clusters| candidate rows through a group-min (at sf0.1 /
    // ε=0.5 that was 30M rows for an 18k-row answer). Components are Longs,
    // so centroids are indexed 0..n-1 ascending-by-component for the kernel
    // (kernel ties → lowest index = lowest component id, same tiebreak as
    // the min-struct form) and an_qi is re-joined by component, exactly
    // like the members' path. Past ~8k clusters the component-decode
    // literal would bloat the plan, so the pruned-exact kernel takes over
    // (same labels, bit-equal distances, probe-bounded per row) up to the
    // [[MaxAssignElements]] budget; only beyond THAT does the
    // broadcast-join form survive, because it alone never collects.
    val (noiseAssigned, noiseError) =
      if (nClusters == 0) {
        val na = noise.select(col("id"), col("qi"), col("component"),
          lit(null).cast(centroids.schema("centroid").dataType).as("an_qi"),
          lit(null).cast("double").as("an_err"))
        (na, if (nNoise == 0) 0.0 else Double.PositiveInfinity)
      } else {
        val na =
          if (nClusters <= maxAssignCentroids(dim)) {
            val sorted = centroids.select(col("component"), col("centroid"))
              .collect()
              .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
              .sortBy(_._1).toIndexedSeq
            // LEFT join: a null qi yields a null kernel result and must
            // keep its row, with null an_qi/an_err
            (if (nClusters <= KernelAssignMaxClusters)
               withKernelNearest(noise, "qi", sorted, "cc", "an_err")
             else
               withPrunedNearest(noise, "qi", sorted, "cc", "an_err"))
              .select(col("id"), col("qi"), col("cc"), col("an_err"))
              .join(broadcast(centroids
                .select(col("component").as("cc"), col("centroid"))),
                Seq("cc"), "left")
              .select(col("id"), col("qi"),
                lit(null).cast("long").as("component"),
                col("centroid").as("an_qi"), col("an_err"))
          } else {
            // past the element budget nothing may collect OR broadcast:
            // the coarse-bucket probe join keeps the centroid table
            // distributed and ships only its √k summary — identical
            // min-struct semantics (ties → lowest component, null qi →
            // null outputs) to the old broadcast crossJoin it replaces,
            // without the rows × k candidate shuffle
            graft.operators.CentroidJoin.assignExact(
                noise.select(col("id"), col("qi")), "id", "qi",
                centroids.select(col("component"), col("centroid")),
                "component", "centroid", "__cc", "an_qi", "an_err")
              .select(col("id"), col("qi"),
                lit(null).cast("long").as("component"),
                col("an_qi"), col("an_err"))
          }
        val err =
          if (nNoise == 0) 0.0
          else na.agg(sum("an_err")).head().getDouble(0)
        (na, err)
      }

    val memberAssigned = members.join(centroids, "component")
      .select(col("id"), col("qi"), col("component"),
        col("centroid").as("an_qi"),
        Distances.l1(col("qi"), col("centroid")).as("an_err"))

    // carry any extra input columns (e.g. the preserved label) through
    val extras = points.columns.toSeq
      .filterNot(c => c == idCol || c == qiCol || weightCol.contains(c))
    val base = memberAssigned.unionByName(noiseAssigned)
      .withColumn("is_noise", col("component").isNull)
    val assignments = (if (extras.isEmpty) base
      else base.join(
        points.select((col(idCol).cast("long").as("id") +: extras.map(col)): _*),
        "id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (ownPairs) pairs.unpersist()
    labeled.unpersist()
    DbscanModel(assignments, centroids, nClusters, nNoise, clusterError, noiseError)
  }

  /** Reference-faithful value-collapsed mode: rows are deduplicated into
    * vertices keyed by their full value (qi + extra cols), duplicates
    * counted as neighbor multiplicity but clusters/centroids computed over
    * distinct values (SURVEY §2.7 G1 vertex collapse). Ids are assigned
    * deterministically by sorted order.
    */
  def runCollapsed(points: DataFrame, qiCol: String, eps: Double, minPts: Int,
                   k: Int, mode: ClusterMode = Cc, blockDims: Int = 2): DbscanModel = {
    val spark = points.sparkSession
    val keyCols = points.columns.toSeq
    val verts = points.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("w"))
    // dense ids in sorted-key order via the two-phase scan — stays in
    // Catalyst and scales with numParts, unlike the old sortBy +
    // rdd.zipWithIndex round-trip (same ids: the key set is unique)
    val withId = graft.operators.PrefixScan.denseIds(
      verts, keyCols, "id", spark.sparkContext.defaultParallelism)
    run(withId, "id", qiCol, eps, minPts, k, mode, weightCol = Some("w"),
      blockDims = blockDims)
  }

  /** ε sweep with argmin-by-total-error selection (DBSCAN.py:148-205).
    * Returns all per-ε records plus the best model (reference keeps the
    * output of the best ε only). Empty edge sets record
    * [eps, 0, n, 0, ∞, ∞] and skip clustering (DBSCAN.py:163-167).
    *
    * The ε-join — the sweep's dominant cost — runs ONCE, at max(epsRange)
    * with the L1 distance materialized; each ε's pair set is the
    * `d < ε` slice of that superset (L1 < ε ⟹ L1 < ε_max), so the sweep
    * pays one shuffle instead of |epsRange|. The reference hoists only the
    * vertices DF out of its loop (DBSCAN.py:157); this hoists the join too.
    *
    * In the default CC mode the per-ε RECORDS are additionally computed in
    * one batched pass ([[sweepRecordsBatched]]): every radius's graph is
    * clustered in a single connected-components fixpoint over the disjoint
    * union of the ε-graphs, so the sweep pays one set of CC rounds instead
    * of |epsRange| — and only the winning ε's full model is built.
    *
    * @param runner optional per-ε model source — lets callers with a
    *   model cache (e.g. the gate registry, which memoizes one ε already)
    *   serve that ε from the cache while the sweep still computes the
    *   rest and does the argmin. Defaults to [[run]] over the shared
    *   ε_max pair set; passing a runner also disables record batching
    *   (the runner IS the per-ε path).
    */
  def sweep(points: DataFrame, idCol: String, qiCol: String,
            epsRange: Seq[Double], minPts: Int, k: Int,
            mode: ClusterMode = Cc, weightCol: Option[String] = None,
            blockDims: Int = 2,
            runner: Double => DbscanModel = null)
  : (Seq[SweepRecord], Option[(Double, DbscanModel)]) = {
    if (epsRange.isEmpty) return (Seq.empty, None)
    // released in the finally below — also on failure partway through the
    // sweep, so an aborted sweep can't strand its largest intermediate
    var sharedMax: DataFrame = null
    def buildSharedMax(): DataFrame = {
      val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
      val p = points.select(col(idCol).cast("long").as("id"),
        col(qiCol).as("qi"), w.as("w"))
      // only the columns [[run]] reads survive the persist — the qi
      // arrays (the wide part of the join output) are re-joined from
      // `points` inside run, not carried pair-wise
      NeighborJoin
        .epsJoinGrid(p, "id", "qi", epsRange.max, blockDims,
          distCol = Some("d"))
        .select("a_id", "a_w", "b_id", "b_w", "d")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    try {
      if (runner == null && mode == Cc) {
        // batched path: records from ONE union-CC pass, then one model build
        sharedMax = buildSharedMax()
        val t0 = System.nanoTime()
        val records = try sweepRecordsBatched(points, idCol, qiCol, sharedMax,
          epsRange, minPts, k)
        catch { case _: BatchedSweepUnsupported =>
          null // ids unsuitable for namespacing — fall through to the loop
        }
        if (records != null) {
          // the batched pass is shared work — per-ε attribution is an
          // even split; the winning ε's record additionally carries its
          // (only) full model build, approximating the reference's
          // per-ε timing semantics
          val secs = (System.nanoTime() - t0) / 1e9
          val recs = records.map(_.copy(seconds = secs / epsRange.length))
          var best: Option[(Double, DbscanModel)] = None
          var minCost = Double.PositiveInfinity
          for (r <- recs if r.totalError < minCost) {
            minCost = r.totalError; best = Some((r.eps, null))
          }
          // empty input yields all-zero records (the guard in
          // sweepRecordsBatched) — there is no model to build, and run()
          // would throw on the empty points
          val emptyInput = recs.forall(r => r.nClusters == 0 && r.nNoise == 0)
          val t1 = System.nanoTime()
          val bestModel = if (emptyInput) None else best.map { case (eps, _) =>
            (eps, run(points, idCol, qiCol, eps, minPts, k, mode, weightCol,
              blockDims, pairsOpt = Some(sharedMax.where(col("d") < eps))))
          }
          val buildSecs = (System.nanoTime() - t1) / 1e9
          return (recs.map(r =>
            if (best.exists(_._1 == r.eps)) r.copy(seconds = r.seconds + buildSecs)
            else r), bestModel)
        }
      }

      val doRun: Double => DbscanModel =
        if (runner != null) runner
        else {
          if (sharedMax == null) sharedMax = buildSharedMax()
          eps => run(points, idCol, qiCol, eps, minPts, k, mode, weightCol,
            blockDims, pairsOpt = Some(sharedMax.where(col("d") < eps)))
        }
      val n = points.count()
      var best: Option[(Double, DbscanModel)] = None
      var minCost = Double.PositiveInfinity
      val records = epsRange.map { eps =>
        val t0 = System.nanoTime()
        val m = doRun(eps)
        val secs = (System.nanoTime() - t0) / 1e9
        val rec =
          if (m.nClusters == 0 && m.nNoise == n && m.clusterError == 0.0)
            SweepRecord(eps, 0, n, 0.0, Double.PositiveInfinity,
              Double.PositiveInfinity, secs)
          else
            SweepRecord(eps, m.nClusters, m.nNoise, m.clusterError,
              m.noiseError, m.totalError, secs)
        if (rec.totalError < minCost) {
          best.foreach(_._2.unpersist())
          minCost = rec.totalError
          best = Some((eps, m))
        } else m.unpersist()
        rec
      }
      (records, best)
    } finally {
      if (sharedMax != null) sharedMax.unpersist()
    }
  }

  private final class BatchedSweepUnsupported extends RuntimeException

  /** Per-ε sweep records from ONE connected-components fixpoint.
    *
    * Every ε's graph is embedded in a disjoint union by namespacing vertex
    * ids as `epsIdx·(maxId+1) + id`: no edge crosses an ε-block, so the
    * components of the union restricted to a block are exactly that ε's
    * components, and the component representative (min namespaced id)
    * decodes back to that ε's min member id. The union graph does the work
    * of |epsRange| graphs in one set of large-star/small-star rounds —
    * rounds are the sweep's barrier cost, identical per ε at gate scale
    * and dominated by stragglers at cluster scale, so sharing them is a
    * win at every SF (same total bytes, ~|epsRange|× fewer barriers).
    *
    * Replicates [[run]]'s stats per ε exactly (DbscanSpec pins
    * record-equality against fresh per-ε runs): weighted core rule
    * a_w·Σb_w ≥ minPts, k-anonymity over DISTINCT-member counts,
    * unweighted centroids, noise→nearest-centroid L1, and the
    * [eps, 0, n, 0, ∞, ∞] record shape for clusterless radii.
    */
  private def sweepRecordsBatched(points: DataFrame, idCol: String,
                                  qiCol: String, sharedMax: DataFrame,
                                  epsRange: Seq[Double], minPts: Int, k: Int)
  : Seq[SweepRecord] = {
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(qiCol).as("qi"))
    // empty-input check BEFORE the dim head() — head() on an empty
    // Dataset throws, the agg below always returns one row
    val idRow = pts.agg(min("id"), max("id"), count(lit(1))).head()
    if (idRow.isNullAt(0)) return epsRange.map(e =>
      SweepRecord(e, 0, 0, 0.0, 0.0, 0.0, 0.0))
    val dim = points.select(size(col(qiCol))).head().getInt(0)
    val (minId, maxId, n) = (idRow.getLong(0), idRow.getLong(1), idRow.getLong(2))
    val off = maxId + 1
    val nEps = epsRange.length
    // namespacing needs nonnegative ids and epsIdx·off within Long range
    if (minId < 0 || off <= 0 || off > Long.MaxValue / nEps)
      throw new BatchedSweepUnsupported
    val epsLit = array(epsRange.map(lit(_)): _*)

    // tag each pair with every ε-index whose radius admits it (strict <)
    val tagged = sharedMax
      .select(col("a_id"), col("a_w"), col("b_id"), col("b_w"), col("d"),
        posexplode(epsLit).as(Seq("ei", "epsv")))
      .where(col("d") < col("epsv"))
      .select(col("ei"), col("a_id"), col("a_w"), col("b_id"), col("b_w"))

    // weighted core rule per (ε, point), as in [[run]]
    val core = tagged.groupBy(col("ei"), col("a_id"), col("a_w"))
      .agg(sum("b_w").as("nw"))
      .where(col("a_w") * col("nw") >= minPts)
      .select(col("ei").as("cei"), col("a_id").as("core_id"))

    // namespaced directed edges core → neighbor across all ε at once
    val edges = tagged.join(core,
        tagged("ei") === core("cei") && tagged("a_id") === core("core_id"),
        "left_semi")
      .select((col("ei") * off + col("a_id")).as("src"),
        (col("ei") * off + col("b_id")).as("dst"))

    // `/` on longs is double division in Spark SQL — decode with DIV so
    // the quotient stays exact at any id magnitude
    val comp = ConnectedComponents.run(edges)
      .select((col("id") % off).as("id"),
        expr(s"CAST(id DIV ${off}L AS INT)").as("ei"),
        (col("component") % off).as("component"))

    // every point appears in every ε-block; unmatched ⇒ immediate noise
    val verts = pts.select(col("id"), col("qi"),
      explode(sequence(lit(0), lit(nEps - 1))).as("ei"))
    val withComp = verts.join(comp, Seq("ei", "id"), "left")
    val sizes = withComp.where(col("component").isNotNull)
      .groupBy("ei", "component").agg(count(lit(1)).as("csize"))
    val labeled = withComp.join(sizes, Seq("ei", "component"), "left")
      .select(col("ei"), col("id"), col("qi"),
        when(col("csize") >= k, col("component")).as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // unpersisted in the finally: a failed stat job must not strand the
    // two caches for the session's lifetime (same hardening as sweep()'s
    // sharedMax)
    val dimAvgs = (0 until dim).map(i =>
      avg(element_at(col("qi"), i + 1)).as(s"c$i"))
    val centroids = labeled.where(col("component").isNotNull)
      .groupBy("ei", "component")
      .agg(dimAvgs.head, dimAvgs.tail: _*)
      .select(col("ei"), col("component"),
        array((0 until dim).map(i => col(s"c$i")): _*).as("centroid"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val (nClustersByEi, clusterErrByEi, noiseStatsByEi, nNoiseByEi) = try {
      val nClustersByEi = centroids.groupBy("ei")
        .agg(count(lit(1)).as("ncl"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val clusterErrByEi = labeled.where(col("component").isNotNull)
        .join(centroids, Seq("ei", "component"))
        .groupBy("ei").agg(sum(Distances.l1(col("qi"), col("centroid"))).as("e"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val noise = labeled.where(col("component").isNull)
      // noise error per ε: min-L1 to that ε's centroids. Like [[run]]'s
      // noise assign, the argmin is the shared kernel helper per ε-block
      // (each block has its own centroid matrix), all blocks unioned into
      // ONE aggregation job over the cached noise rows — not a join that
      // explodes |noise|·|centroids| candidate rows. Past the kernel cap
      // each ε-block's argmin runs through the pruned-exact index (same
      // labels, bit-equal distances); only past the element budget does
      // the collect-free coarse-bucket probe join take over.
      val totalClusters = nClustersByEi.values.sum
      val noiseStatsByEi = (if (totalClusters == 0) {
        // no block has clusters: every record is the ∞ empty record and
        // no noise error is needed
        points.sparkSession.emptyDataFrame
          .select(lit(0).as("ei"), lit(0.0).as("e"))
      } else if (totalClusters <= maxAssignCentroids(dim)) {
        // real component ids, ascending — withKernelNearest's documented
        // precondition (collect order is arbitrary; sorting also makes
        // the decoded component meaningful, and equal-distance ties break
        // to the lowest component id exactly as run()'s noise assign)
        val centsByEi = centroids
          .select(col("ei"), col("component"), col("centroid")).collect()
          .groupBy(_.getInt(0))
          .map { case (ei, rows) =>
            ei -> rows.map(r => (r.getLong(1), r.getSeq[Double](2).toArray))
              .sortBy(_._1).toIndexedSeq
          }
        val useKernel = totalClusters <= KernelAssignMaxClusters
        centsByEi.toSeq.map { case (ei, sorted) =>
          (if (useKernel)
             withKernelNearest(noise.where(col("ei") === ei), "qi", sorted,
               "__cc", "d")
           else
             withPrunedNearest(noise.where(col("ei") === ei), "qi", sorted,
               "__cc", "d"))
            .select(lit(ei).as("ei"), col("d"))
        }.reduce(_ unionByName _)
          .groupBy("ei").agg(sum("d").as("e"))
      } else {
        // past the element budget nothing may collect or broadcast (the
        // flattened centroid table alone would exceed 64 MB): each
        // ε-block's argmin runs through the coarse-bucket probe join —
        // per-block jobs instead of one batched job, acceptable in a
        // regime whose fits "should be consumed through the assignments
        // table" anyway, and never a rows × k candidate shuffle
        nClustersByEi.keys.toSeq.sorted.map { ei =>
          graft.operators.CentroidJoin.assignExact(
              noise.where(col("ei") === ei).select(col("id"), col("qi")),
              "id", "qi",
              centroids.where(col("ei") === ei)
                .select(col("component"), col("centroid")),
              "component", "centroid", "__cc", "__cent", "d")
            .select(lit(ei).as("ei"), col("d"))
        }.reduce(_ unionByName _)
          .groupBy("ei").agg(sum("d").as("e"))
      }).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val nNoiseByEi = noise.groupBy("ei").agg(count(lit(1)).as("nn"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (nClustersByEi, clusterErrByEi, noiseStatsByEi, nNoiseByEi)
    } finally {
      labeled.unpersist()
      centroids.unpersist()
    }

    epsRange.indices.map { ei =>
      val nClusters = nClustersByEi.getOrElse(ei, 0L)
      val nNoise = nNoiseByEi.getOrElse(ei, 0L)
      if (nClusters == 0)
        // no clusters ⇒ every point is noise: the reference's
        // [eps, 0, n, 0, ∞, ∞] empty record (DBSCAN.py:163-167)
        SweepRecord(epsRange(ei), 0, n, 0.0,
          if (nNoise == 0) 0.0 else Double.PositiveInfinity,
          if (nNoise == 0) 0.0 else Double.PositiveInfinity, 0.0)
      else {
        val ce = clusterErrByEi.getOrElse(ei, 0.0)
        val ne = if (nNoise == 0) 0.0 else noiseStatsByEi.getOrElse(ei, 0.0)
        SweepRecord(epsRange(ei), nClusters, nNoise, ce, ne, ce + ne, 0.0)
      }
    }
  }

  /** Sweep metrics as a DataFrame matching the reference's eps_record.csv
    * columns (DBSCAN.py:137). */
  def sweepMetrics(spark: org.apache.spark.sql.SparkSession,
                   records: Seq[SweepRecord]): DataFrame = {
    import spark.implicits._
    records.toDF()
  }
}
