package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Public bridge to the private[sql] Column ⇄ Expression converters —
  * the supported extension point moved behind `classic` in Spark 4's
  * Connect refactor; extension libraries defining native expressions
  * need exactly these two hops. */
object graftbridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
