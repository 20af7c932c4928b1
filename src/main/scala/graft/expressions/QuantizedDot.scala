package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Quantized weighted sum over a trailing frame array as ONE native
  * codegen'd fold: Σ_j floor(x_j · w_j · grid + 0.5) as a long, with
  * plan-time weight literals (the Holt / Holt–Winters linear-filter
  * kernels, SURVEY §2 ops 343/348). Replaces the interpreted
  * zip_with + aggregate HOF chain — same rationale as [[EwmaVol]]:
  * HOF lambdas evaluate interpreted per element, the dominant cost of
  * a 60-wide fold per row (measured: the HOF eod_holt probe ran
  * 38.6 s at 5M rows; see SCALE.md §16).
  *
  * Bit parity with the HOF formulation (and the DuckDB oracle's
  * per-term floor): each term is ((x * w) * grid + 0.5) in exactly
  * that association, floored and summed in long — addition-order-free
  * by construction, so the fold order cannot matter.
  *
  * A null element poisons the result to null (the HOF chain's
  * semantics); an array shorter or longer than the weight vector is
  * null too — callers filter to full windows (rn ≥ m), and a silent
  * partial dot would be a wrong number, not a shorter one.
  */
case class QuantizedDot(child: Expression, weights: Array[Double],
                        grid: Double) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quantized_dot"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantized_dot expects array<double>, got $t")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != weights.length) return null
    var acc = 0L
    var j = 0
    while (j < weights.length) {
      if (x.isNullAt(j)) return null
      acc += math.floor(x.getDouble(j) * weights(j) * grid + 0.5).toLong
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |long $acc = 0L;
         |boolean $bad = $a.numElements() != $wRef.length;
         |if (!$bad) {
         |  for (int $j = 0; $j < $wRef.length; $j++) {
         |    if ($a.isNullAt($j)) { $bad = true; break; }
         |    $acc += (long) java.lang.Math.floor(
         |      $a.getDouble($j) * $wRef[$j] * $grid + 0.5);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizedDot =
    copy(child = newChild)
}

object QuantizedDot {
  /** Column-API entry point over an array<double> trailing-frame column. */
  def apply(arr: Column, weights: Array[Double], grid: Double): Column =
    GraftSqlBridge.column(
      QuantizedDot(GraftSqlBridge.expression(arr), weights, grid))
}
