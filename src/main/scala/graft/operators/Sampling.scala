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
