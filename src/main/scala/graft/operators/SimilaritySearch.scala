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

  /** Cosine similarity rounded to 6dp — ranking on the rounded value (with
    * id tiebreak) keeps orderings reproducible across engines. */
  private def simCol(a: String, b: String) =
    round(Distances.cosine(col(a), col(b)), 6)

  /** Exact top-k neighbors for each query vector (brute force, the
    * correctness baseline). `queries` must be small (it is broadcast). */
  def cosineTopK(embs: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val base = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val scored = base.crossJoin(broadcast(q))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), simCol("q_vec", "vec").as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
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
    * deterministic pseudo-random hyperplanes (seeded LCG), packed into a
    * Long. Vectors with high cosine collide with high probability. */
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

  /** IVF index: coarse centroids + bucket-assigned vectors. */
  final case class IvfIndex(centroids: Map[Int, Array[Double]], indexed: DataFrame) {

    /** ANN top-k: probe the `nprobe` nearest coarse buckets per query,
      * score exactly inside them. An equi-join on bucket id — candidate
      * work is |probed buckets|, independent of corpus size. */
    def search(queries: DataFrame, idCol: String, vecCol: String,
               k: Int, nprobe: Int): DataFrame = {
      val q = queries.select(col(idCol).as("q_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      val cents = centroids.toSeq.sortBy(_._1)
      // nprobe nearest centroids per query, via a literal centroid array
      val scored = cents.map { case (cid, c) =>
        struct((-Distances.cosine(col("q_vec"), array(c.map(lit(_)): _*))).as("negSim"),
          lit(cid).as("bucket"))
      }
      val probes = slice(array_sort(array(scored: _*)), 1, nprobe)
      val qb = q.select(col("q_id"), col("q_vec"),
        explode(probes).as("p")).select(col("q_id"), col("q_vec"),
        col("p.bucket").as("bucket"))
      val cand = qb.join(indexed, "bucket")
        .where(col("id") =!= col("q_id"))
        .select(col("q_id"), col("id"),
          round(Distances.cosine(col("q_vec"), col("vec")), 6).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
      cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }
  }

  /** Build an IVF index: `nlist` coarse centroids from plain Lloyd k-means
    * (ConstrainedKMeans with kAnon=0 == unconstrained), then bucket-assign
    * every vector to its nearest centroid. */
  def ivfIndex(embs: DataFrame, idCol: String, vecCol: String,
               nlist: Int, seed: Long, lloydIters: Int = 3): IvfIndex = {
    val base = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val km = graft.kmeans.ConstrainedKMeans.fit(
      base, "id", "vec", nClusters = nlist, kAnon = 0, seed = seed,
      maxLloyd = lloydIters)
    val cents = km.centroids
    km.unpersist()
    val centArr = cents.toSeq.sortBy(_._1)
    val assignExpr = centArr.map { case (cid, c) =>
      struct((-Distances.cosine(col("vec"), array(c.map(lit(_)): _*))).as("negSim"),
        lit(cid).as("bucket"))
    }
    val indexed = base.withColumn("bucket",
      array_min(array(assignExpr: _*)).getField("bucket"))
    IvfIndex(cents, indexed)
  }
}
