package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters.
  * Spark 4 wraps Columns around ColumnNodes rather than Expressions, so a
  * library registering a custom Catalyst expression (graft's
  * `TokenizeFlatExpr`) needs this one hop; the underlying
  * `org.apache.spark.sql.classic.ExpressionUtils` is the same utility the
  * built-in `functions` object uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
