package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.DoubleType

import graft.expressions.StudentTCdf

/** Session-level registration of graft's native Catalyst expressions so
  * they're callable from SQL / `expr(...)` — e.g. `t_cdf(x, df)`.
  * Idempotent; call once per session (queries call it defensively).
  */
object Graft {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "t_cdf",
      exprs => StudentTCdf(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType)),
      "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SquareRewriteRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SquareRewriteRule
    }
  }

  /** Probabilistic momentum (reference ratios.py:121 / src/lib.rs:8):
    * t.cdf(IR, df = n-1) where IR = mean(a-b)/std(a-b). SQL snippet to
    * use inside an aggregation over columns `ra`, `rb`.
    */
  val probMomSql: String =
    "t_cdf(avg(ra - rb) / stddev_samp(ra - rb), cast(count(ra - rb) - 1 as double))"
}
