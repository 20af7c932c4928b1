package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** ACD(1,1) conditional expected duration over the trailing duration
  * array x_{t−k..t−1} (frame order, oldest first — the fold walks it
  * backwards, j = 0 at the NEWEST element) as ONE native codegen'd
  * fold:
  *
  *   ψ_t = ω·(1−β^k)/(1−β) + α·Σ_{j<k} β^j·x_{t−1−j}
  *
  * — the k-truncated closed form of the Engle–Russell (1998)
  * autoregressive conditional duration recursion
  * ψ_t = ω + α·x_{t−1} + β·ψ_{t−1} with the pre-sample tail
  * β^k·ψ_{t−k} dropped. This is [[GarchVol]]'s recursion verbatim
  * with durations in place of squared returns (ACD is "GARCH for
  * waiting times"): truncation turns an unbounded sequential filter
  * into a bounded-frame window op a SQL oracle can replay with a
  * k-row self-join, and the identical parity conventions apply —
  * fresh Math.pow(β, j) per weight, newest→oldest accumulation,
  * null element poisons the fold.
  */
case class AcdPsi(child: Expression, omega: Double, alpha: Double,
                  beta: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_acd_psi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_acd_psi expects array<double>, got $t")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = x.numElements()
    var acc = 0.0
    var j = 0
    while (j < k) {
      if (x.isNullAt(k - 1 - j)) return null
      acc += x.getDouble(k - 1 - j) * math.pow(beta, j.toDouble)
      j += 1
    }
    omega * (1.0 - math.pow(beta, k.toDouble)) / (1.0 - beta) + alpha * acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("sawNull")
      s"""
         |int $k = $a.numElements();
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($a.isNullAt($k - 1 - $j)) { $bad = true; break; }
         |  $acc += $a.getDouble($k - 1 - $j)
         |    * java.lang.Math.pow($beta, (double) $j);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    $omega * (1.0 - java.lang.Math.pow($beta, (double) $k))
         |      / (1.0 - $beta)
         |    + $alpha * $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AcdPsi =
    copy(child = newChild)
}

object AcdPsi {
  /** Column-API entry point over an array<double> trailing-frame column. */
  def apply(arr: Column, omega: Double, alpha: Double, beta: Double): Column =
    GraftSqlBridge.column(AcdPsi(GraftSqlBridge.expression(arr), omega, alpha, beta))
}
