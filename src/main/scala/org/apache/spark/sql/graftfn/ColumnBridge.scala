package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to a user-facing
  * [[Column]]. Spark 4 made `Column` expression-agnostic (ColumnNode);
  * the converter lives behind `private[sql]`, so this one-liner sits
  * in an `org.apache.spark.sql` subpackage to reach it.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
