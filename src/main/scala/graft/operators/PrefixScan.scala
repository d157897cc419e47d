package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed exclusive prefix sums (per-group running totals) at
  * data-scaled parallelism — the classic two-phase scan:
  *
  *   1. range-partition on (group, order): each task owns a contiguous
  *      slice of each group's order, so "everything before this partition"
  *      is well-defined per group;
  *   2. reduce per-(partition, group) totals — an O(numParts·groups)-row
  *      collect — and prefix-sum them on the driver into offsets;
  *   3. window-scan WITHIN each (partition, group) slice only and add the
  *      broadcast offset.
  *
  * A plain `Window.partitionBy(group)` cumsum caps parallelism at the
  * number of groups — with 10 corpus splits that is 10 sequential tasks no
  * matter the cluster size (the round-2 scale audit's finding on
  * pack_sequences). Here the window key is (partition, group), so
  * parallelism follows `numParts`, which callers size to the cluster.
  * Output values are identical to the single-window form by construction
  * (the value column is integral, so no float reassociation).
  */
object PrefixScan {

  /** Single-order-column convenience form of [[exclusiveCumsum]]. */
  def exclusiveCumsum(df: DataFrame, groupCol: String, orderCol: String,
                      valCol: String, cumCol: String,
                      numParts: Int): DataFrame =
    exclusiveCumsum(df, groupCol, Seq(orderCol), valCol, cumCol, numParts)

  /** Dense 0-based row ids in the total sort order of `orderCols` — the
    * Catalyst-native, data-scaled replacement for `sortBy + rdd.
    * zipWithIndex` (a driver-coordinated round-trip) and for a global
    * `row_number()` window (a single sequential task): counting rows is
    * just the two-phase scan with a unit value and one global group.
    * `orderCols` must be a unique key. */
  def denseIds(df: DataFrame, orderCols: Seq[String], idCol: String,
               numParts: Int): DataFrame =
    exclusiveCumsum(
      df.withColumn("__one", lit(1L)).withColumn("__all", lit(1)),
      "__all", orderCols, "__one", idCol, numParts)
      .drop("__one", "__all")

  /** Adds `cumCol` = exclusive running sum of `valCol` over rows ordered by
    * `orderCols` within each `groupCol` (first row of a group gets 0).
    *
    * `orderCols` must be unique within a group (a row identity, not a
    * sort preference). The scan materializes the range-partitioned input
    * (persisted: partition ids must be IDENTICAL across the totals pass
    * and the scan pass — range boundaries are re-sampled per action on an
    * unpersisted plan); callers running inside a gate registry keep it
    * cached like every other shared intermediate.
    */
  def exclusiveCumsum(df: DataFrame, groupCol: String, orderCols: Seq[String],
                      valCol: String, cumCol: String,
                      numParts: Int): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(numParts, (groupCol +: orderCols).map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-(partition, group) totals, prefix-summed per group on the
    // driver (rows = numParts × |groups| — tiny next to the data)
    val totals = parted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(valCol).cast("long")).as("__t"))
      .collect()
    val offsets: Array[Row] = totals
      .groupBy(_.get(1)).valuesIterator
      .flatMap { rows =>
        var acc = 0L
        rows.sortBy(_.getInt(0)).map { r =>
          val off = acc
          acc += r.getLong(2)
          Row(r.getInt(0), r.get(1), off)
        }
      }.toArray
    val groupField = df.schema(groupCol)
    val offSchema = StructType(Seq(
      StructField("__opid", IntegerType, nullable = false),
      StructField("__g", groupField.dataType, groupField.nullable),
      StructField("__off", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offsets: _*), offSchema)

    // pass 2: scan each contiguous slice independently; the broadcast
    // offset re-anchors it to the group-global running sum
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .join(broadcast(offDf),
        col("__pid") === col("__opid") && col(groupCol) === col("__g"))
      .withColumn(cumCol,
        col("__off") + coalesce(sum(col(valCol).cast("long")).over(w), lit(0L)))
      .drop("__pid", "__opid", "__g", "__off")
  }
}
