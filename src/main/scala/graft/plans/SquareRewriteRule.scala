package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `pow(x, 2.0)` → `x * x`.
  *
  * The analytics hot paths square drawdowns (ulcer index) and log
  * returns (realized volatility) millions of times per partition;
  * `java.lang.Math.pow` is ~20× a multiply and not specialized for
  * integer exponents by codegen. A multiply is also at least as
  * accurate (single correctly-rounded operation).
  *
  * Registered by [[graft.GraftExtensions]] /
  * [[graft.functions.Graft.register]] — an example of extending
  * Catalyst with a Rule[LogicalPlan] rather than hand-optimizing every
  * call site.
  */
object SquareRewriteRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // Duplicating a non-deterministic child (pow(rand(), 2)) would
      // evaluate it twice with different values — semantics change, so
      // only deterministic subtrees are rewritten. The duplicated
      // deterministic subtree is reclaimed by codegen subexpression
      // elimination, so the copy costs nothing at runtime.
      case Pow(x, Literal(2.0, DoubleType)) if x.deterministic => Multiply(x, x)
    }
}
