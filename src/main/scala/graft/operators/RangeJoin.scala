package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range (interval/band) join: aggregate right rows whose timestamp
  * falls in a lookback window [left.ts - window, left.ts] of the same key —
  * the sliding-lookback feature ("views in the last hour before each
  * click") of training pipelines.
  *
  * Spark-first plan: the naive θ-join is a per-key cartesian. Instead both
  * sides are bucketed by floor(ts / window) — the 1-D case of
  * [[NeighborJoin]]'s grid blocking: any right row within the window lies
  * in the left row's bucket or the one before, so replicating the right
  * side to (b, b+1) turns the range predicate into an equi-join on
  * (key, bucket) plus an exact filter. Shuffle is keyed by (key, bucket),
  * candidate work is bounded by per-bucket population, never |L|·|R|.
  */
object RangeJoin {

  /** Per left row: `agg` over right rows with equal `keyCol` and
    * `right.tsCol` in `[left.tsCol - windowLen, left.tsCol]` (inclusive).
    * Left rows with no right rows in range keep zero/null aggregates
    * (coalesce in `aggs` as needed). `aggs` are evaluated over the right
    * columns, which are exposed with a `r_` prefix. */
  def lookbackAgg(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, windowLen: Long,
                  aggs: Seq[Column]): DataFrame = {
    require(windowLen > 0, "windowLen must be positive")
    val leftCols = left.columns.toSeq
    val l = left.select(leftCols.map(col): _*)
      .withColumn("__bucket", floor(col(tsCol) / windowLen))
    val r0 = right.select(right.columns.toSeq
      .map(c => col(c).as(s"r_$c")): _*)
    val r = r0
      .withColumn("__b0", floor(col(s"r_$tsCol") / windowLen))
      .withColumn("__bucket",
        explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val joined = l.join(r,
      l(keyCol) === r(s"r_$keyCol") && l("__bucket") === r("__bucket")
        && col(s"r_$tsCol") >= col(tsCol) - windowLen
        && col(s"r_$tsCol") <= col(tsCol),
      "left")
    joined.groupBy(leftCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
