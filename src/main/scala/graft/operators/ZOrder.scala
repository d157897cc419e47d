package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

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

  /** Hilbert-curve index of grid cell (x, y) on the 2^bits × 2^bits grid
    * (the classic iterative xy→d walk — see Hamilton, "Compact Hilbert
    * Indices", CS-2006-07, and the standard quadrant-rotation recurrence).
    * Hilbert ordering dominates Morton for zone-map locality: consecutive
    * keys are always GRID NEIGHBORS (no Z-shaped jumps across the key
    * space), so per-file min-max spans stay narrower on both dimensions.
    * Pure 64-bit integer arithmetic — the same loop runs here, inside the
    * codegen'd [[HilbertKeyExpr]], and (unrolled as a recursive CTE) in
    * the DuckDB oracle, so keys are value-exact cross-engine. */
  def hilbertXY2D(n: Long, x0: Long, y0: Long): Long = {
    var x = x0 & (n - 1); var y = y0 & (n - 1)
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Column form of [[hilbertXY2D]] over the low `bits` bits of two
    * non-negative integer columns (inputs are masked to the grid, like
    * [[zkey2]]'s bucketing convention). */
  def hkey2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    ColumnBridge.column(HilbertKeyExpr(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long")), bits))
  }

  /** DuckDB mirror of [[hkey2]]: a recursive CTE named `cteName` that
    * carries every row of `from` through the same `bits` quadrant-rotation
    * steps. The caller selects `d` from `cteName` `WHERE s = 0`; extra
    * row columns in `carry` ride along unchanged. XOR over the {0,1}
    * flags is spelled as a CASE so no engine-specific operator appears. */
  def sqlHilbertCte(cteName: String, from: String, xExpr: String,
                    yExpr: String, bits: Int, carry: Seq[String] = Nil): String = {
    val n = 1L << bits
    val cs = if (carry.isEmpty) "" else carry.mkString(", ", ", ", "")
    s"""$cteName AS (
       |  SELECT CAST($xExpr AS BIGINT) & ${n - 1} AS x,
       |         CAST($yExpr AS BIGINT) & ${n - 1} AS y,
       |         CAST(0 AS BIGINT) AS d, CAST(${n / 2} AS BIGINT) AS s$cs
       |  FROM $from
       |  UNION ALL
       |  SELECT
       |    CASE WHEN ry = 0 THEN
       |      (CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END) ELSE x END AS x,
       |    CASE WHEN ry = 0 THEN
       |      (CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END) ELSE y END AS y,
       |    d + s * s * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END) AS d,
       |    s // 2 AS s$cs
       |  FROM (SELECT *,
       |          CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
       |          CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
       |        FROM $cteName WHERE s > 0) t
       |)""".stripMargin
  }

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

/** Codegen Hilbert-curve cell index over the 2^bits grid — the whole
  * quadrant-rotation loop runs as ONE static-call term inside
  * whole-stage codegen (see [[ZOrder.hilbertXY2D]]); `bits` rides as a
  * case-class int so the grid size is a compile-time constant in the
  * generated code. Null in → null out. */
case class HilbertKeyExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def toString: String = s"hilbert_key($left, $right, $bits)"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.hilbertXY2D(1L << bits, a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.operators.ZOrder.hilbertXY2D(${1L << bits}L, $a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
