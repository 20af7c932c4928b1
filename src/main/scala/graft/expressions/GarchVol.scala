package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** GARCH(1,1) filtered conditional volatility over the trailing return
  * array r_{t−k..t−1} (frame order, oldest first — the fold walks it
  * backwards, j = 0 at the NEWEST element) as ONE native codegen'd
  * fold:
  *
  *   σ²_t = ω·(1−β^k)/(1−β) + α·Σ_{j<k} β^j·r²_{t−1−j}
  *
  * — the k-truncated closed form of the Bollerslev (1986) recursion
  * σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1} with the pre-sample tail
  * β^k·σ²_{t−k} dropped (at β = 0.9, k = 60 the tail carries
  * β⁶⁰ ≈ 0.0018 of a bounded variance — negligible against the round
  * grid once scaled by typical return variance). Truncation makes the
  * filter a bounded-frame window op instead of an unbounded sequential
  * recursion — the same trade [[EwmaVol]] documents, and the same
  * reason a SQL oracle can replay it with a 60-row self-join.
  *
  * Parity conventions shared with [[EwmaVol]]: each weight is a fresh
  * Math.pow(β, j) (not an incrementally multiplied running power,
  * which rounds differently), terms accumulate newest→oldest, and a
  * null element poisons the fold to a null result.
  */
case class GarchVol(child: Expression, omega: Double, alpha: Double,
                    beta: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_garch_vol"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_garch_vol expects array<double>, got $t")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = x.numElements()
    var acc = 0.0
    var j = 0
    while (j < k) {
      if (x.isNullAt(k - 1 - j)) return null
      val r = x.getDouble(k - 1 - j)
      acc += r * r * math.pow(beta, j.toDouble)
      j += 1
    }
    math.sqrt(omega * (1.0 - math.pow(beta, k.toDouble)) / (1.0 - beta)
      + alpha * acc)
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
         |  $acc += $r * $r * java.lang.Math.pow($beta, (double) $j);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = java.lang.Math.sqrt(
         |    $omega * (1.0 - java.lang.Math.pow($beta, (double) $k)) / (1.0 - $beta)
         |    + $alpha * $acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GarchVol =
    copy(child = newChild)
}

object GarchVol {
  /** Column-API entry point over an array<double> trailing-frame column. */
  def apply(arr: Column, omega: Double, alpha: Double, beta: Double): Column =
    GraftSqlBridge.column(GarchVol(GraftSqlBridge.expression(arr), omega, alpha, beta))
}
