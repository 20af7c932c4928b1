package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 hides Expression-backed Column
  * construction behind private[sql] (classic.ExpressionUtils); graft's
  * native expressions (DotProduct, StudentTCdf) need exactly that hook,
  * so this one-file shim lives in the sql package. No Spark internals
  * are re-implemented here.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
