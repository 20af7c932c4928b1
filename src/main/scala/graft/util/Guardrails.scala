package graft.util

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampType}

/** Input-dtype guards — the Spark counterpart of the reference's
  * guard_expr decorator (ffn_polars/utils/guardrails.py), which flags
  * an expression pointed at a column of the wrong dtype. Columns are
  * unresolved until bound to a frame, so guards here are
  * DataFrame-level preconditions.
  *
  * Like the reference (guardrails.py:13-30), guards run in one of three
  * modes: STRICT throws, WARN logs and proceeds, SILENT does nothing.
  * The global default is STRICT (fail-fast suits a batch engine better
  * than the reference's WARN default for an interactive one); callers
  * flip it globally with `setMode` / `set_guard_mode`-style, or
  * lexically with `withMode`.
  */
object Guardrails extends Logging {
  sealed trait GuardMode
  case object Warn extends GuardMode
  case object Strict extends GuardMode
  case object Silent extends GuardMode

  private val mode = new AtomicReference[GuardMode](Strict)

  /** Global mode switch (reference set_guard_mode, guardrails.py:21). */
  def setMode(m: GuardMode): Unit = mode.set(m)
  def currentMode: GuardMode = mode.get()

  /** Run `body` under mode `m`, restoring the previous mode after. */
  def withMode[A](m: GuardMode)(body: => A): A = {
    val prev = mode.getAndSet(m)
    try body finally mode.set(prev)
  }

  private def emit(msg: String): Unit = mode.get() match {
    case Strict => throw new IllegalArgumentException(msg)
    case Warn   => logWarning(s"[guard] $msg")
    case Silent => ()
  }

  def require(df: DataFrame, col: String, expected: DataType): Unit = {
    val actual = df.schema(col).dataType
    if (actual != expected)
      emit(s"column '$col' must be $expected, got $actual")
  }

  def requireDouble(df: DataFrame, cols: String*): Unit =
    cols.foreach(require(df, _, DoubleType))

  def requireTimestamp(df: DataFrame, cols: String*): Unit =
    cols.foreach(require(df, _, TimestampType))

  /** Plan-shape guard: flags any Window operator with an empty
    * partitionSpec. Spark evaluates such a window by moving EVERY row
    * to one partition (WindowExec logs "No Partition Defined … Moving
    * all data to a single partition") — correct on a toy frame,
    * serialized through a single task at scale. Run on a frame before
    * shipping the query; WindowGuardSpec runs it over the whole suite.
    */
  def requirePartitionedWindows(df: DataFrame): Unit = {
    val global = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    if (global.nonEmpty)
      emit(s"plan contains ${global.size} un-partitioned Window operator(s)" +
        " — single-partition sort at scale; partition the window by a key")
  }
}
