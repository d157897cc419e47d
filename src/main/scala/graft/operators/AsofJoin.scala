package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join ("most recent right value at or before each left
  * timestamp, per key") — the feature-extraction primitive of training
  * pipelines. DuckDB exposes the same operator as `ASOF JOIN`, which is
  * what the gate oracle uses.
  *
  * Spark-first plan: a per-row range join explodes candidates with key
  * frequency, so instead both sides are tagged and UNIONed and a single
  * key-partitioned, (ts, side)-ordered running `last(ignoreNulls)` carries
  * the latest right payload forward into every left row — one shuffle by
  * key, one in-partition sort, no candidate explosion; exactly the work a
  * sort-merge join would do anyway. Right rows sort BEFORE left rows at
  * equal timestamps, so "at or before" is inclusive.
  */
object AsofJoin {

  /** For every `left` row, attach the payload of the most recent `right`
    * row with the same `keyCol` and `right.tsCol <= left.tsCol`, as a
    * struct column `outCol` (null when no prior right row exists).
    *
    * `right` must be unique per (key, ts) — pre-aggregate if it isn't —
    * which also makes the result deterministic.
    */
  def lastPrior(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, payloadCols: Seq[String],
                outCol: String = "asof"): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = struct(payloadCols.map(col): _*)
    val payType = right.select(pay.as("p")).schema("p").dataType
    val rowStruct = struct(leftCols.map(col): _*)
    val rowType = left.select(rowStruct.as("r")).schema("r").dataType

    val l = left.select(col(keyCol).as("__key"),
      col(tsCol).cast("long").as("__ts"), lit(0).as("__side"),
      lit(null).cast(payType).as("__pay"), rowStruct.as("__row"))
    val r = right.select(col(keyCol).as("__key"),
      col(tsCol).cast("long").as("__ts"), lit(1).as("__side"),
      pay.as("__pay"), lit(null).cast(rowType).as("__row"))

    val w = Window.partitionBy("__key")
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol, last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(col("__row.*") +: Seq(col(outCol)): _*)
  }
}
