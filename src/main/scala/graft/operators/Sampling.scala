package graft.operators

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling — the way a corpus pipeline
  * downsamples (domain balancing, ablation subsets, decay mixing) when the
  * sample must be REPRODUCIBLE: membership is a pure function of the row's
  * key, so the same rows survive on any cluster, any partitioning, any
  * run, and samples of different tables stay join-consistent (sampling
  * both sides of a key keeps referential integrity, which `rand()`-based
  * sampling destroys).
  *
  * Mechanism: keep a row iff PolyHash(key) mod `denom` < rate·denom. A
  * narrow codegen projection + filter — no shuffle, no RNG state, pushes
  * down past column pruning like any other predicate.
  */
object Sampling {

  val Denom = 10000

  /** Keep-predicate for a uniform `rate` sample keyed on `key`. */
  def keepHash(key: Column, rate: Double, denom: Int = Denom): Column =
    (PolyHash.poly_hash(key.cast("string")) % denom) <
      lit(math.round(rate * denom).toInt)

  /** Uniform deterministic sample. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(keepHash(col(keyCol), rate))

  /** Fixed-COUNT deterministic sample per stratum: exactly `n` rows from
    * each stratum (fewer if the stratum is smaller), chosen by hash rank —
    * the balanced-eval-subset builder ("5k docs per language"), where
    * rate-based sampling can't hit exact counts. Membership is still a
    * pure function of the key set: the same rows survive any partitioning
    * or cluster size, and re-running on a superset keeps previously
    * sampled rows only as the hash order dictates (documented trade vs
    * the thresholding of [[hashSample]]).
    *
    * Scale shape: one stratum-partitioned rank window over (hash, key) —
    * work distributes across strata; skew ceiling is the largest stratum.
    * For a handful of huge strata, pre-filter with [[keepHash]] at a rate
    * safely above n/|stratum| first, then rank the survivors. */
  def fixedPerStratum(df: DataFrame, keyCol: String, strataCol: Column,
                      n: Int): DataFrame = {
    // withColumn CLOBBERS same-named caller columns and the final drop
    // would then remove them — refuse loudly instead of sampling under a
    // silently rewritten stratum
    require(!df.columns.contains("__stratum") && !df.columns.contains("__rk"),
      "fixedPerStratum reserves the __stratum/__rk column names")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__stratum")
      .orderBy(PolyHash.poly_hash(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__stratum", strataCol)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n)
      .drop("__stratum", "__rk")
  }

  /** Cluster-balanced selection — the topic-diversity curation pass: every
    * row is assigned to its max-cosine cluster (the coarse "topic"), and
    * each cluster keeps its `quota` best rows by `scoreCol` — so one
    * dominant topic cannot crowd the whole selection the way a global
    * top-k by quality does.
    *
    * Output: input id + score, `bucket` (the cluster), `rk` (1-based rank
    * within the bucket by score desc, id asc), `kept` (rk <= quota).
    * Every input row is returned; callers filter on `kept`.
    *
    * Scale shape: the bucket assign is the [[graft.functions.VecKernels
    * .nearest_centroids]] codegen projection (centroid matrix as a
    * reference object — zero shuffle, O(1) plan size in cluster count);
    * the rank is a bucket-PARTITIONED window, so work distributes over
    * clusters and the skew ceiling is the largest topic, not the corpus.
    * Centroids come from the caller (typically an IVF quantizer fit or a
    * fixed sample), O(k·dim) driver scalars. */
  def clusterBalanced(scored: DataFrame, idCol: String, vecCol: String,
                      scoreCol: String, cents: Map[Int, Array[Double]],
                      quota: Int): DataFrame = {
    require(cents.nonEmpty, "clusterBalanced needs at least one centroid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket")
      .orderBy(col(scoreCol).desc, col(idCol))
    scored
      .withColumn("bucket", element_at(
        graft.functions.VecKernels.nearest_centroids(
          col(vecCol).cast("array<double>"), cents.toSeq, 1, cosine = true),
        1).getField("cluster"))
      .withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= quota)
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006),
    * made DETERMINISTIC: each row draws its uniform u from PolyHash(key)
    * instead of an RNG — u = (hash+1)/(P+1) ∈ (0,1] — and keeps priority
    * u^(1/w); the n largest priorities win, which samples each row with
    * probability proportional to its weight w. The same rows win on any
    * cluster, any partitioning, any run. Rows with w <= 0 never qualify.
    *
    * Priorities are ranked ROUNDED to 6dp with the key as tiebreak, the
    * board-wide cross-engine float discipline: `pow` may differ by an
    * ulp between libm implementations, and ranking on the rounded value
    * makes the winner set reproducible in any engine.
    *
    * Scale shape: one narrow projection + a TakeOrdered top-n — no
    * shuffle beyond the per-partition top-n merge. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
                     n: Int): DataFrame = {
    val p = PolyHash.Prime
    val u = (PolyHash.poly_hash(col(keyCol).cast("string")) + 1).cast("double") /
      lit((p + 1).toDouble)
    val pri = round(pow(u, lit(1.0) / weightCol), 6)
    df.where(weightCol > 0)
      .withColumn("priority", pri)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(n)
  }

  /** Stratified deterministic sample: per-stratum rates with a default for
    * unlisted strata. The rate lookup is a literal map + coalesce, which
    * references `strataCol` exactly ONCE — a CASE chain references it per
    * branch, and when the predicate is pushed through the projection that
    * computes the stratum (e.g. a langId over full text), every reference
    * re-inlines and re-evaluates the whole derivation per row. */
  def stratified(df: DataFrame, keyCol: String, strataCol: Column,
                 rates: Seq[(String, Double)], default: Double): DataFrame = {
    val denom = Denom
    // first occurrence wins on duplicate strata (the CASE-chain semantics
    // this replaced) — CreateMap would otherwise throw at runtime under
    // spark.sql.mapKeyDedupPolicy=EXCEPTION
    val m = map(rates.distinctBy(_._1).flatMap { case (s, r) =>
      Seq(lit(s), lit(math.round(r * denom).toInt)) }: _*)
    val threshold = coalesce(element_at(m, strataCol),
      lit(math.round(default * denom).toInt))
    df.where((PolyHash.poly_hash(col(keyCol).cast("string")) % denom) < threshold)
  }
}
