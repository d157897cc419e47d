package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped quantiles with a scale guard.
  *
  * Spark's `percentile` aggregate is EXACT and scale-safe — one
  * map-side-combined shuffle of ≤|domain| map entries per group, never a
  * sort — but ONLY while the value domain is bounded: its state is a
  * value→count map, so a high-cardinality double column (timings, scores)
  * makes the aggregation state itself data-scale and the "exact" plan a
  * memory bomb at 100 TB. The guard measures the domain first
  * (`approx_count_distinct`, one cheap HLL pass) and routes:
  *
  *   - domain ≤ maxDomain → `percentile` (exact, the map-agg plan)
  *   - otherwise          → `approx_percentile` (Greenwald-Khanna sketch:
  *                          bounded error AND bounded state at any domain)
  *
  * The route taken is returned so callers (and specs) can assert it; gate
  * queries with a priori bounded domains (l_quantity ∈ 1..50) stay on the
  * exact path and remain oracle-checkable.
  */
object Quantiles {

  /** `result` holds one row per group with columns `q0..qN` (double, in
    * `fracs` order) plus the group column; `exact` is the route taken;
    * `domainEstimate` the HLL distinct-value estimate that decided it. */
  final case class GroupedQuantiles(result: DataFrame, exact: Boolean,
                                    domainEstimate: Long)

  /** @param withCount also emit `n` = group row count — free inside the
    *                   same aggregation, and callers that would otherwise
    *                   join a separate count agg back on should use it
    *                   (a grouped quantile needs no join at all). */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
              fracs: Seq[Double], maxDomain: Long = 65536,
              accuracy: Int = 10000,
              withCount: Boolean = false): GroupedQuantiles = {
    require(fracs.nonEmpty && fracs.forall(f => f >= 0.0 && f <= 1.0))
    val domain = df.agg(approx_count_distinct(valueCol)).head().getLong(0)
    val exact = domain <= maxDomain
    def q(f: Double): Column =
      if (exact) expr(s"percentile($valueCol, $f)")
      else expr(s"approx_percentile($valueCol, $f, $accuracy)").cast("double")
    val aggs = fracs.zipWithIndex.map { case (f, i) => q(f).as(s"q$i") } ++
      (if (withCount) Seq(count(lit(1)).as("n")) else Nil)
    GroupedQuantiles(df.groupBy(groupCol).agg(aggs.head, aggs.tail: _*),
      exact, domain)
  }
}
