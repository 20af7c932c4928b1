package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Type-checked epoch-microsecond extraction accepting BOTH parquet
  * timestamp flavors — and ONLY those.
  *
  * A plain `unix_micros(ts.cast(TimestampType))` would silently accept
  * a raw Long column too: `cast(Long → Timestamp)` interprets the
  * value as SECONDS since epoch, so a legacy nanosAsLong `events.ts`
  * fed directly to a duration kernel would produce values ~1e9× off
  * instead of the loud DATATYPE_MISMATCH `unix_micros` used to throw.
  *
  * Evaluation is the IDENTITY: both TimestampType and TimestampNTZType
  * physically store epoch microseconds as a Long (NTZ stores the
  * local wall-clock's micros, which equals UTC micros under this
  * library's pinned UTC session TZ — the same assumption the
  * NTZ→TimestampType cast in Tables.coerceNtz makes). Codegen emits a
  * no-op, so the guard costs nothing in the hot path.
  */
case class EpochUs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_epoch_us"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_epoch_us expects a timestamp (TZ or NTZ), got $t")
  }

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): EpochUs =
    copy(child = newChild)
}
