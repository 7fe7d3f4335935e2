package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made the conversion
  * `private[sql]` (Connect refactor), so custom-Expression libraries
  * host this two-liner inside the sql namespace — the same access the
  * pre-4.0 `new Column(expr)` constructor provided publicly.
  */
object ExprBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
