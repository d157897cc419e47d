package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over codepoints: fold (acc*31 + cp) mod 1e9+7.
  *
  * This is the engine's deterministic, cross-engine-reproducible string
  * hash: document fingerprints, shingle hashes and MinHash permutations all
  * build on it, and the DuckDB correctness oracle reproduces it exactly as
  *   list_reduce(list_transform(range(1, length(s)+1),
  *     i -> ord(substr(s, i, 1))), (acc, c) -> (acc*31 + c) % 1000000007)
  * so hashed operators get full value-level oracle checks instead of
  * rows-only ones (Spark's xxhash64/murmur3 have no DuckDB counterpart).
  *
  * Implemented as a native Catalyst Expression with codegen (a single
  * static-call, loop-free in generated code) rather than a Scala UDF, so it
  * stays inside whole-stage codegen with no serialization boundary.
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def toString: String = s"poly_hash($child)"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHash {
  final val Prime = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column form. */
  def poly_hash(c: Column): Column =
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(c)))
}
