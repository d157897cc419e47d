package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the hot vector kernels (L1 distance,
  * dot product) over `array<double>` columns.
  *
  * The `zip_with`/`aggregate` higher-order forms in [[Distances]] allocate
  * a lambda frame per element and fall out of whole-stage codegen; these
  * compile to a single static-call over the underlying ArrayData, turning
  * the ε-join filter and cosine scoring into tight primitive loops (the
  * summation order is identical, so results are bit-equal and the DuckDB
  * oracles are unaffected).
  */
object VecKernels {

  /** Σ |a_i - b_i| over the common prefix length. */
  def l1(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += math.abs(a.getDouble(i) - b.getDouble(i)); i += 1 }
    acc
  }

  /** Σ a_i · b_i over the common prefix length. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def l1_dist(a: Column, b: Column): Column =
    ColumnBridge.column(L1DistExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class L1DistExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def toString: String = s"l1_dist($left, $right)"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.l1(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.l1($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def toString: String = s"dot_product($left, $right)"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
