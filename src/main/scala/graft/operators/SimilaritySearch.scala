package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate & exact nearest-neighbor search over embedding columns
  * (`array<float>` / `array<double>`).
  *
  * Scale story: [[cosineTopK]] broadcasts the (small) query set so the scan
  * of the big side is shuffle-free until the final per-query top-k;
  * [[IvfIndex]] is the 100-TB path — a coarse k-means quantizer partitions
  * vectors into buckets, queries probe `nprobe` buckets via an equi-join on
  * bucket id, and only those candidates get exact scoring.
  */
object SimilaritySearch {

  /** Upper bound on a driver-held codebook — IVF's contract is that
    * centroid tables are O(nlist·dim) DRIVER scalars (they broadcast into
    * the assignment kernel), never corpus-sized. [[fixedCentroids]]
    * enforces it so the contract fails fast instead of OOMing the driver. */
  val MaxFixedCentroids = 8192

  /** Driver-side pull of the fixed-quantizer centroids — the embedding
    * rows with ids in [lo, hi) as the codebook map every ann_ivf_fixed-seam
    * gate shares (assignment stays deterministic and SQL-expressible at
    * any SF because the centroids are data rows, not a fitted artifact). */
  def fixedCentroids(embs: DataFrame, idCol: String, vecCol: String,
                     lo: Int, hi: Int): Map[Int, Array[Double]] = {
    require(0 <= lo && lo < hi && hi - lo <= MaxFixedCentroids,
      s"fixed codebook [$lo, $hi) must hold at most $MaxFixedCentroids " +
        "driver-side centroids")
    val rows = embs.where(col(idCol) >= lo && col(idCol) < hi)
      .select(col(idCol).cast("int"), col(vecCol).cast("array<double>"))
      .collect()
    val m = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    // a duplicated id would otherwise silently keep whichever row collect
    // surfaced last — the codebook must fail loudly, not drift with
    // collect order, on a malformed embeddings table
    require(m.size == rows.length,
      s"duplicate $idCol in codebook slice [$lo, $hi): ${rows.length} rows " +
        s"but ${m.size} distinct ids")
    m
  }

  /** Cosine similarity rounded to 6dp — ranking on the rounded value (with
    * id tiebreak) keeps orderings reproducible across engines. */
  private def simCol(a: String, b: String) =
    round(Distances.cosine(col(a), col(b)), 6)

  /** Per-query top-k of a scored (q_id, id, sim) stream via the
    * partial-aggregable [[graft.functions.TopKSimAgg]]: the map side keeps
    * k rows per query, so the shuffle carries O(queries·k) rows instead of
    * sorting every candidate (the Window-rank plan's bottleneck at corpus
    * scale). Ranking is (sim desc, id asc), identical to the Window form
    * ([[rankTopKWindow]], kept as the spec cross-check). */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("q_id")
      .agg(graft.functions.TopKAgg.topk_sim(col("sim"), col("id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("id"), col("col.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))

  /** The Window-rank form of [[rankTopK]] — full sort of the scored
    * stream; retained as the declarative cross-check. */
  private[graft] def rankTopKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact top-k neighbors for each query vector (brute force, the
    * correctness baseline). `queries` must be small (it is broadcast). */
  def cosineTopK(embs: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val base = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val scored = base.crossJoin(broadcast(q))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), simCol("q_vec", "vec").as("sim"))
    rankTopK(scored, k)
  }

  /** Exact all-pairs with cosine >= tau (brute self-join; quadratic — the
    * oracle baseline. Use [[IvfIndex]] or SimHash-banded candidates at
    * scale). */
  def cosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                  tau: Double): DataFrame = {
    val base = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
    val a = base.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val b = base.select(col("id").as("id_b"), col("vec").as("vec_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), simCol("vec_a", "vec_b").as("sim"))
      .where(col("sim") >= tau)
  }

  /** Random-hyperplane LSH bucket key: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (seeded xorshift64*), packed
    * into a Long. Vectors with high cosine collide with high probability.
    *
    * This is the declarative single-band form; the hot path is the native
    * kernel [[graft.functions.VecKernels.sign_bands]], which computes every
    * band in one pass with the plane matrix as a codegen reference object.
    * Both share the same generator, so this form cross-checks the kernel
    * bit-for-bit (SimilaritySearchSpec). */
  def signBucket(vecCol: String, dim: Int, bits: Int, seed: Long) = {
    val planes = {
      var s = seed
      def next(): Double = { // xorshift64*, mapped to [-1, 1)
        s ^= (s << 13); s ^= (s >>> 7); s ^= (s << 17)
        (s * 2.685821657736338e-19) // ~ [-1,1)
      }
      Seq.fill(bits)(Array.fill(dim)(next()))
    }
    planes.zipWithIndex.map { case (p, i) =>
      val proj = Distances.dot(col(vecCol), array(p.map(lit(_)): _*))
      shiftleft(when(proj >= 0, 1L).otherwise(0L), i)
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** All-pairs cosine >= tau via sign-band LSH candidate generation + exact
    * verify — the scale path for embedding near-dup ([[Dedup.embeddingPairs]]).
    *
    * Candidates are generated by an equi-join on (band, key): vectors agree
    * on a band's `bits` sign bits with probability (1 - θ/π)^bits, so
    * qualifying pairs collide in ≥1 of the `bands` bands while the ~n²
    * non-pairs mostly don't — the join shuffles by band key and candidate
    * work is bounded by bucket population, never a cartesian. Every
    * candidate is then exactly scored, so precision is exact; recall is
    * controlled by (bits, bands). Defaults (5, 64) are sized for tau as low
    * as 0.4 — full recall on every test SF (validated against the brute
    * baseline, SimilaritySearchSpec); at the near-dup thresholds a corpus
    * run uses (tau >= 0.8), fewer bands suffice and pruning sharpens.
    */
  def cosinePairsLsh(embs: DataFrame, idCol: String, vecCol: String,
                     tau: Double, bits: Int = 5, bands: Int = 64,
                     seed: Long = graft.functions.VecKernels.SignBandBaseSeed,
                     dim: Int = -1): DataFrame = {
    val base = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val d = if (dim > 0) dim else base.select(size(col("vec"))).head().getInt(0)
    val banded = base.select(col("id"),
      posexplode(graft.functions.VecKernels.sign_bands(col("vec"), d, bits, bands, seed)))
      .select(col("id"), col("pos").as("band"), col("col").as("key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"), simCol("vec_a", "vec_b").as("sim"))
      .where(col("sim") >= tau)
  }

  /** IVF index: coarse centroids + bucket-assigned vectors. */
  final case class IvfIndex(centroids: Map[Int, Array[Double]], indexed: DataFrame) {

    /** ANN top-k: probe the `nprobe` nearest coarse buckets per query,
      * score exactly inside them. An equi-join on bucket id — candidate
      * work is |probed buckets|, independent of corpus size. */
    def search(queries: DataFrame, idCol: String, vecCol: String,
               k: Int, nprobe: Int): DataFrame = {
      val q = queries.select(col(idCol).as("q_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      // nprobe nearest centroids per query; the centroid matrix is a
      // codegen reference object, so nlist can be 64k without blowing the
      // plan or the 64KB codegen method limit
      val probes = graft.functions.VecKernels.nearest_centroids(
        col("q_vec"), centroids.toSeq, nprobe, cosine = true)
      val qb = q.select(col("q_id"), col("q_vec"),
        explode(probes).as("p")).select(col("q_id"), col("q_vec"),
        col("p.cluster").as("bucket"))
      val cand = qb.join(indexed, "bucket")
        .where(col("id") =!= col("q_id"))
        .select(col("q_id"), col("id"),
          round(Distances.cosine(col("q_vec"), col("vec")), 6).as("sim"))
      rankTopK(cand, k)
    }
  }

  /** Element-wise mean pooling of grouped vectors (chunk embeddings →
    * document embedding, the standard aggregation of an embedding
    * pipeline). Two plans, same result (spec-pinned equal):
    *
    *  - `dim < wideDim`: one partial-aggregable pass of per-dimension
    *    `avg`s — a single shuffle on the group key, no row explosion. The
    *    plan carries `dim` agg columns, fine up to a few hundred dims.
    *  - `dim >= wideDim`: modern embedding widths (2-4k) would blow that
    *    plan up, so the wide path posexplodes to (group, pos, value) rows,
    *    averages per (group, pos) — still map-side-combinable — and
    *    reassembles the vector. The shuffle carries dim× more (tiny) rows
    *    but the plan and codegen stay O(1) in dim.
    */
  def meanPool(embs: DataFrame, groupCol: String, vecCol: String,
               dim: Int, wideDim: Int = 512): DataFrame =
    if (dim >= wideDim) meanPoolWide(embs, groupCol, vecCol)
    else {
      val dimAvgs = (0 until dim).map(i =>
        avg(element_at(col(vecCol).cast("array<double>"), i + 1)).as(s"c$i"))
      embs.groupBy(col(groupCol))
        .agg(dimAvgs.head, dimAvgs.tail: _*)
        .select(col(groupCol),
          array((0 until dim).map(i => col(s"c$i")): _*).as("pooled"))
    }

  /** The row-oriented pooling plan — see [[meanPool]]. */
  private[graft] def meanPoolWide(embs: DataFrame, groupCol: String,
                                  vecCol: String): DataFrame =
    embs.select(col(groupCol), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col(groupCol), col("pos")).agg(avg(col("col")).as("m"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("pooled"))

  /** Spherical Lloyd for the coarse quantizer: assign by max cosine (the
    * SAME metric the probe uses), centroid = per-dimension mean of
    * members. One aggregation job per round — a quantizer needs no
    * constrained-repair machinery, no per-round cost collect (those live
    * in ConstrainedKMeans for the E3-faithful fit). Clusters that lose
    * every member simply drop out, shrinking nlist — acceptable for a
    * quantizer. The caller persists `base` across the rounds. */
  private def fitQuantizer(base: DataFrame, nlist: Int, seed: Long,
                           iters: Int): Map[Int, Array[Double]] = {
    val dim = base.select(size(col("vec"))).head().getInt(0)
    var cents: Map[Int, Array[Double]] =
      base.select("vec").rdd.map(_.getSeq[Double](0).toArray)
        .takeSample(withReplacement = false, nlist, seed)
        .zipWithIndex.map { case (c, i) => i -> c }.toMap
    val dimAvgs = (0 until dim).map(i => avg(element_at(col("vec"), i + 1)).as(s"c$i"))
    var it = 0
    while (it < iters && cents.nonEmpty) {
      cents = base.withColumn("bucket",
          element_at(graft.functions.VecKernels.nearest_centroids(
            col("vec"), cents.toSeq, 1, cosine = true), 1).getField("cluster"))
        .groupBy("bucket").agg(dimAvgs.head, dimAvgs.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 1)).toArray)
        .toMap
      it += 1
    }
    cents
  }

  /** Build an IVF index: `nlist` coarse centroids from spherical Lloyd,
    * then bucket-assign every vector to its max-cosine centroid.
    *
    * Scale shape: the quantizer is fitted on a bounded DETERMINISTIC
    * sample (`maxFitVectors`, PolyHash-thresholded on the id — same rows
    * on any cluster/partitioning), persisted across the Lloyd rounds —
    * so fit cost is O(maxFitVectors · iters) regardless of corpus size
    * and the corpus itself is scanned exactly twice (the size count and
    * the final bucket assign, which is the one pass that must see every
    * vector anyway). A coarse quantizer estimates nlist cluster means;
    * a bounded sample loses nothing a 100 TB fit would add. Below the
    * cap (every test SF) no sampling happens and results are identical
    * to the full fit. */
  def ivfIndex(embs: DataFrame, idCol: String, vecCol: String,
               nlist: Int, seed: Long, lloydIters: Int = 3,
               maxFitVectors: Int = 65536): IvfIndex = {
    val base = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val n = base.count()
    val fitBase =
      if (n > maxFitVectors) {
        // NOT Sampling.keepHash: its denom-10000 threshold rounds a rate
        // below 1/20000 to ZERO (empty sample, crashed fit) right in the
        // billion-row regime this cap exists for. Threshold directly in
        // PolyHash's [0, P) output space (P ≈ 1e9+7): resolution ~1e-9,
        // floored at 1 so the expected sample is never empty — at worst
        // (n > P·maxFit rows) the sample is ~n/P, still corpus-bounded.
        val p = graft.functions.PolyHash.Prime
        val threshold = math.max(1L,
          math.round(maxFitVectors.toDouble / n * p))
        base.where(graft.functions.PolyHash.poly_hash(col("id").cast("string"))
          < lit(threshold))
      } else base
    val fitCached = fitBase
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents =
      try fitQuantizer(fitCached, nlist, seed, lloydIters)
      finally fitCached.unpersist(blocking = false)
    IvfIndex(cents, bucketAssign(base, cents))
  }

  /** Build an IVF index from a FIXED centroid set — no Lloyd. This is both
    * the entry point for an externally trained quantizer and the seam that
    * puts the probe→score→rank machinery under the driver's SQL oracle
    * (gate ann_ivf_fixed): given fixed centroids, bucket assignment and
    * ranking are pure and SQL-expressible, unlike the seeded iterative
    * [[ivfIndex]] fit. */
  def ivfIndexFixed(embs: DataFrame, idCol: String, vecCol: String,
                    cents: Map[Int, Array[Double]]): IvfIndex = {
    val base = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    IvfIndex(cents, bucketAssign(base, cents))
  }

  private def bucketAssign(base: DataFrame,
                           cents: Map[Int, Array[Double]]): DataFrame =
    base.withColumn("bucket",
      element_at(graft.functions.VecKernels.nearest_centroids(
        col("vec"), cents.toSeq, 1, cosine = true), 1).getField("cluster"))
}
