package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression converters —
  * the standard mechanism for third-party Catalyst expressions since
  * the Spark 4 Column API became backend-agnostic (no public
  * `Column.expr` / `new Column(expr)` anymore). Kept to these two
  * one-liners; everything else in graft uses public API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
