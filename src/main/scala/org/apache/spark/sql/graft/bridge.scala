package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions sql-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`); a library defining
  * native Catalyst expressions needs exactly these two hops, so this is the
  * single sanctioned crossing point (kept in the spark.sql namespace, as
  * Spark ecosystem libraries conventionally do).
  */
object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
