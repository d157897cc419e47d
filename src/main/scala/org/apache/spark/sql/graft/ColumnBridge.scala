package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's sql-internal Column↔Expression conversion (the
  * `classic.ExpressionUtils` helpers are `private[sql]` in Spark 4), so
  * graft's custom Catalyst expressions can be exposed as public Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
