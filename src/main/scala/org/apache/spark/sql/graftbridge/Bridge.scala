package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ⇄ Catalyst-Expression bridge. Spark 4 backs Column
  * by ColumnNode and keeps the conversion (`classic.ExpressionUtils`)
  * `private[sql]`, so custom codegen expressions (graft.functions.*)
  * need this one-hop shim inside the sql package namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
