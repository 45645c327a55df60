package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThan, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a negative-sign test on cosine similarity needs no
  * normalization — `cosine_sim(a,b) < 0  ⇔  dot_f32(a,b) < 0` — so the
  * two norm loops per evaluation are dropped.
  *
  * Scope is deliberately ONLY the `< 0` direction. Spark SQL orders
  * NaN as the LARGEST double (not IEEE: `NaN > 0` is true, `NaN < 0`
  * is false). For a zero vector cos is NaN (0/0) while dot is 0.0, so
  * `cos > 0` (true) ≠ `dot > 0` (false) — rewriting the positive test
  * would be unsound. Under `< 0` every degenerate case (zero vector,
  * length mismatch, empty) evaluates false on both sides, so the
  * rewrite is exact.
  *
  * Registered via `GraftExtensions.injectOptimizerRule`; also usable
  * on a live session via `spark.experimental.extraOptimizations`.
  */
object CosineSignToDot extends Rule[LogicalPlan] {
  private val Zero = Literal(0.0, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThan(CosineSim(a, b), Zero) => LessThan(DotF32(a, b), Zero)
      case GreaterThan(Zero, CosineSim(a, b)) => GreaterThan(Zero, DotF32(a, b))
    }
}
