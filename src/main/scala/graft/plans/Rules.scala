package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression,
  GreaterThan, LessThan, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a negative-sign test on cosine similarity needs no
  * normalization — `cosine_sim(a,b) < 0  ⇔  dot_f32(a,b) < 0 AND
  * dot ≠ -∞` — so the two norm loops per evaluation are dropped.
  *
  * Scope is deliberately ONLY the `< 0` direction. Spark SQL orders
  * NaN as the LARGEST double (not IEEE: `NaN > 0` is true, `NaN < 0`
  * is false). For a zero vector cos is NaN (0/0) while dot is 0.0, so
  * `cos > 0` (true) ≠ `dot > 0` (false) — rewriting the positive test
  * would be unsound. Under `< 0`, zero vectors, length mismatches and
  * empties evaluate false on both sides; the one residual divergence
  * is an INFINITE element making dot = -∞ (true under `< 0`) while
  * cos = -∞/√∞ = NaN (false) — excluded by the `dot ≠ -∞` conjunct.
  * With float inputs a finite dot cannot overflow (≤ dim · 1.2e77 per
  * term vs double's 1.8e308), so dot = -∞ occurs ONLY via an Inf
  * element, and for finite dot < 0 both norms are finite and positive
  * — cos < 0 agrees. The duplicated dot evaluation is eliminated by
  * codegen subexpression elimination.
  *
  * Registered via `GraftExtensions.injectOptimizerRule`; also usable
  * on a live session via `spark.experimental.extraOptimizations`.
  */
object CosineSignToDot extends Rule[LogicalPlan] {
  private val Zero = Literal(0.0, DoubleType)
  private val NegInf = Literal(Double.NegativeInfinity, DoubleType)

  private def negDot(a: Expression, b: Expression): Expression = {
    val dot = DotF32(a, b)
    And(LessThan(dot, Zero), Not(EqualTo(dot, NegInf)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThan(CosineSim(a, b), Zero) => negDot(a, b)
      case GreaterThan(Zero, CosineSim(a, b)) => negDot(a, b)
    }
}
