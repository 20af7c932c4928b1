package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** RiskMetrics EWMA volatility over a trailing return array as ONE
  * native codegen'd fold: σ = sqrt(Σ_j λ^j·r²_{t−j} · (1−λ)/(1−λ^k)),
  * k = array length, j = 0 at the NEWEST element (the array arrives in
  * frame order, oldest first — the loop walks it backwards).
  *
  * Replaces the op-106 interpreted HOF chain (reverse → zip_with with
  * a per-element lambda → aggregate fold): same fourth-kernel rationale
  * as [[DotProduct]] — HOF lambdas evaluate interpreted per element,
  * which is the dominant cost of a 60-wide fold per row.
  *
  * Bit parity with the HOF formulation (and the DuckDB oracle) is load
  * bearing: terms accumulate newest→oldest exactly as the reversed-
  * array fold did, each weight is a fresh Math.pow(λ, j) (not an
  * incrementally multiplied power, which rounds differently), and the
  * final normalization keeps the HOF's left-associative
  * (acc · (1−λ)) / (1−λ^k) shape.
  */
case class EwmaVol(child: Expression, lambda: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ewma_vol"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_ewma_vol expects array<double>, got $t")
  }

  // A null element poisons the fold to a null RESULT — the semantics
  // of the HOF chain this replaces (and of every Spark arithmetic
  // aggregate). getDouble on a null slot would silently read 0.0 and
  // produce a finite-but-wrong volatility. Unreachable through
  // ewmaVolatility's collect_list (which drops nulls), but the
  // expression is public API over any array<double>.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = x.numElements()
    var acc = 0.0
    var j = 0
    while (j < k) {
      if (x.isNullAt(k - 1 - j)) return null
      val r = x.getDouble(k - 1 - j)
      acc += r * r * math.pow(lambda, j.toDouble)
      j += 1
    }
    math.sqrt(acc * (1.0 - lambda) / (1.0 - math.pow(lambda, k.toDouble)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val r = ctx.freshName("r")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("sawNull")
      s"""
         |int $k = $a.numElements();
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($a.isNullAt($k - 1 - $j)) { $bad = true; break; }
         |  double $r = $a.getDouble($k - 1 - $j);
         |  $acc += $r * $r * java.lang.Math.pow($lambda, (double) $j);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = java.lang.Math.sqrt(
         |    $acc * (1.0 - $lambda) / (1.0 - java.lang.Math.pow($lambda, (double) $k)));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EwmaVol =
    copy(child = newChild)
}

object EwmaVol {
  /** Column-API entry point over an array<double> trailing-frame column. */
  def apply(arr: Column, lambda: Double): Column =
    GraftSqlBridge.column(EwmaVol(GraftSqlBridge.expression(arr), lambda))
}
