package graft.util

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampNTZType, TimestampType}

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

  /** Accepts either parquet timestamp flavor: the duration kernels
    * coerce NTZ through TimestampType themselves (Tick.epochUs), so an
    * NTZ column satisfies the contract too.
    */
  def requireTimestamp(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      val actual = df.schema(c).dataType
      if (actual != TimestampType && actual != TimestampNTZType)
        emit(s"column '$c' must be a timestamp (TZ or NTZ), got $actual")
    }

  /** Name-contract guard (reference guard_expr required_substring,
    * guardrails.py:63-69): catches e.g. a price series handed to an
    * operator that documents itself over RETURNS — the dtype matches,
    * the semantics don't, and the name is the only signal available
    * before execution.
    */
  def requireNameContains(colName: String, substring: String): Unit =
    if (!colName.contains(substring))
      emit(s"column '$colName' name does not contain '$substring'")

  /** Schema-level null contract: the column must be declared
    * non-nullable. Free (no job), but parquet reads are nullable by
    * default — use [[requireNoNulls]] when the data, not the schema,
    * carries the contract.
    */
  def requireNonNullable(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      if (df.schema(c).nullable)
        emit(s"column '$c' must be declared non-nullable")
    }

  /** Data-level null contract: ONE aggregate-only job over the frame
    * counting nulls in every guarded column at once (a count-aggregate
    * scan — column-pruned to the guarded columns, combined map-side, no
    * wide shuffle, so it stays cheap even at lake scale; still, prefer
    * guarding the small post-aggregation frame over the raw fact
    * table).
    */
  def requireNoNulls(df: DataFrame, cols: String*): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    // Silent mode must not pay for a scan whose verdict it discards.
    if (cols.nonEmpty && mode.get() != Silent) {
      val aggs = cols.map(c => count(when(col(c).isNull, lit(1))).as(c))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val bad = cols.zipWithIndex.collect {
        case (c, i) if row.getLong(i) > 0 => s"'$c' (${row.getLong(i)} nulls)"
      }
      if (bad.nonEmpty)
        emit(s"null contract violated: ${bad.mkString(", ")}")
    }
  }

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
