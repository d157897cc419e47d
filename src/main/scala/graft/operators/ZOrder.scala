package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data clustering — the multi-dimensional layout pass a
  * 100 TB table gets so that range predicates on EITHER of two hot columns
  * prune row groups: interleaving the bits of the two keys gives a single
  * sort order in which rows close in z are close in both dimensions, so
  * per-file/per-row-group min-max stats stay narrow on both columns at
  * once (a plain sort keeps them narrow on the leading column only).
  *
  * The key is pure integer bit arithmetic — `2·bits` shift/mask/or terms
  * folded into one codegen'd expression, no UDF — and the layout pass is
  * Spark's own machinery: `repartitionByRange` on the key (sampled range
  * boundaries → balanced files) + `sortWithinPartitions`. Nothing here is
  * bespoke execution; the operator's value is the KEY, and Catalyst/AQE
  * keep doing the planning.
  */
object ZOrder {

  /** Morton key over the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Callers bucket wider domains down first (e.g. `% (1 << bits)`). */
  def zkey2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB-SQL mirror of [[zkey2]] over expressions `a` and `b` —
    * same shift/mask/or terms, so gates on the key are value-exact. */
  def sqlZkey2(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i + 1}) |" +
        s" (((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")

  /** Write `df` z-clustered on (`a`, `b`) into `numFiles` range-balanced
    * parquet files: range-partition on the z-key (sampled boundaries, so
    * file sizes track data density, not key-space volume), sort within
    * each file, drop the helper column at the writer. */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zkey2(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
