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

  /** UniMax corpus allocation (Chung et al., ICLR'23): spread a token
    * budget as uniformly as possible across sources, capping each source
    * at `epochCap` epochs of its own size. The waterfill has a closed
    * form over the per-source table: sorted by capacity ascending, a
    * source is saturated iff granting it and every larger source its own
    * capacity level still fits the budget; the first unsaturated row
    * fixes the integer water level θ = (B − prefix<) div remaining, and
    * every unsaturated source gets θ — i.e. alloc_s = min(cap_s, θ*)
    * with θ* the largest integer level whose total fits the budget.
    *
    * `perSource` must expose (`source` string, `n_tokens` long); budget
    * B = tokens·budgetNum div budgetDen, which must be < epochCap so the
    * largest source can never saturate and the water-level row always
    * exists. Plan: windows and 1-row scalar joins over the bounded
    * |sources|-row table only — candidate work independent of corpus
    * size (the corpus-size groupBy is the caller's).
    *
    * @return (source, n_tokens, cap, alloc, epochs) with epochs the
    *         6dp-rounded alloc/n_tokens.
    */
  def unimaxAlloc(perSource: DataFrame, epochCap: Int,
                  budgetNum: Int, budgetDen: Int): DataFrame = {
    require(budgetNum.toDouble / budgetDen < epochCap,
      s"budget fraction $budgetNum/$budgetDen must be < epochCap $epochCap")
    import org.apache.spark.sql.expressions.Window
    val glob = perSource.agg(sum("n_tokens").cast("long").as("tot"),
      count(lit(1)).cast("long").as("nd"))
    val w = Window.orderBy("cap", "source")
    val ranked = perSource
      .select(col("source"), col("n_tokens"),
        (col("n_tokens") * epochCap).as("cap"))
      .crossJoin(broadcast(glob))
      .withColumn("budget", expr(s"(tot * $budgetNum) div $budgetDen"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("prefix", sum("cap").over(w))
      .withColumn("sat",
        col("prefix") + col("cap") * (col("nd") - col("i")) <=
          col("budget"))
    // B < Σcap (budget fraction < epochCap), so on any corpus with at
    // least one token the last row is unsaturated and this 1-row limit
    // is non-empty; the degenerate all-zero corpus (every cap 0, budget
    // 0, every row saturated) would leave it empty — the agg below turns
    // that into a single θ=0 row so every source still gets alloc=0
    // instead of the crossJoin silently dropping all rows
    val theta = ranked.where(!col("sat")).orderBy("i").limit(1)
      .select(expr("(budget - prefix + cap) div (nd - i + 1)")
        .as("theta"))
      .agg(coalesce(min("theta"), lit(0L)).as("theta"))
    ranked.crossJoin(broadcast(theta))
      .select(col("source"), col("n_tokens"), col("cap"),
        when(col("sat"), col("cap"))
          .otherwise(least(col("cap"), col("theta"))).as("alloc"))
      .withColumn("epochs",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("alloc").cast("double") /
            col("n_tokens").cast("double"), 6)))
  }
}
