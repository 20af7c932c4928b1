package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampType}

/** Input-dtype guards — the Spark counterpart of the reference's
  * guard_expr decorator (ffn_polars/utils/guardrails.py), which fails
  * fast when an expression is pointed at a column of the wrong dtype.
  * Columns are unresolved until bound to a frame, so guards here are
  * DataFrame-level preconditions.
  */
object Guardrails {
  def require(df: DataFrame, col: String, expected: DataType): Unit = {
    val actual = df.schema(col).dataType
    if (actual != expected) {
      throw new IllegalArgumentException(
        s"column '$col' must be $expected, got $actual")
    }
  }

  def requireDouble(df: DataFrame, cols: String*): Unit =
    cols.foreach(require(df, _, DoubleType))

  def requireTimestamp(df: DataFrame, cols: String*): Unit =
    cols.foreach(require(df, _, TimestampType))
}
