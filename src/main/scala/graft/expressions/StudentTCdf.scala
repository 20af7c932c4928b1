package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Student's t CDF as a native Catalyst expression with codegen —
  * the Spark counterpart of the reference's one native kernel
  * (src/lib.rs:8 `prob_mom`, which computes t.cdf(IR, df=n-1)).
  *
  * A scalar expression (not an aggregate): compose it over built-in
  * aggregates, e.g. `t_cdf(avg(d)/stddev_samp(d), count(*)-1)` — the
  * aggregation stays map-side-combinable and the CDF evaluates once per
  * group inside generated code.
  *
  * CDF via the regularized incomplete beta function (continued-fraction
  * evaluation, standard Numerical Recipes §6.4 formulation):
  *   F(t, v) = 1 - I_x(v/2, 1/2)/2  for t >= 0,  x = v/(v+t²)
  *   F(t, v) =     I_x(v/2, 1/2)/2  for t <  0
  */
case class StudentTCdf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "t_cdf"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"t_cdf expects (double, double), got (${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(t: Any, df: Any): Any =
    StudentTCdf.cdf(t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, df) =>
      s"graft.expressions.StudentTCdf.cdf($t, $df)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StudentTCdf =
    copy(left = newLeft, right = newRight)
}

object StudentTCdf {
  /** P(T <= t) for T ~ Student-t with v degrees of freedom. */
  def cdf(t: Double, v: Double): Double = {
    if (v <= 0 || t.isNaN) return Double.NaN
    if (t.isInfinite) return if (t > 0) 1.0 else 0.0
    val x = v / (v + t * t)
    val p = 0.5 * regIncBeta(v / 2.0, 0.5, x)
    if (t >= 0) 1.0 - p else p
  }

  /** Regularized incomplete beta I_x(a,b), continued fraction (Lentz). */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = lgamma(a + b) - lgamma(a) - lgamma(b) +
      a * math.log(x) + b * math.log(1.0 - x)
    val front = math.exp(lbeta)
    if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
    else 1.0 - front * betacf(b, a, 1.0 - x) / b
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MaxIt = 200; val Eps = 3e-16; val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= MaxIt) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) return h
      m += 1
    }
    h
  }

  /** Lanczos log-gamma (g=7, n=9 — standard public coefficients). */
  def lgamma(xx: Double): Double = {
    val g = 7.0
    val coef = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (xx < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * xx)) - lgamma(1.0 - xx)
    } else {
      val x = xx - 1.0
      var a = coef(0)
      val t = x + g + 0.5
      var i = 1
      while (i < 9) { a += coef(i) / (x + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }
}
