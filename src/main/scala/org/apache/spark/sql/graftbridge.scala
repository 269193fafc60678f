package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for the graft engine's native
  * expressions. Spark 4 scopes ExpressionUtils private[sql], so extension
  * libraries expose it through a shim in this package (the conventional
  * pattern for custom-expression libraries).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
