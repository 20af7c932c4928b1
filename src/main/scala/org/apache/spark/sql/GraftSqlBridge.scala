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

  /** Release the storage blocks behind a `localCheckpoint()`ed frame.
    * `Dataset.unpersist` only consults the CacheManager, which never
    * registered a checkpoint's RDD — the blocks stay pinned until the
    * session dies. Iterative operators (Dedup.clusters) checkpoint per
    * round and must free the superseded rounds explicitly.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
