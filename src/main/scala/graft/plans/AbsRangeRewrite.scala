package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `abs(e) <= r`  →  `e >= -r AND e <= r` (and the strict
  * variant) for foldable bounds.
  *
  * Spark does not push predicates through `abs`, so a filter like
  * `abs(delta) <= radius` — the residual form of every symmetric-distance
  * predicate (range joins, tolerance checks) — reaches the Parquet reader as
  * an opaque post-scan filter. The range conjunction is pushdown-eligible
  * whenever `e` is a bare column (min/max row-group skipping applies), and
  * never worse otherwise. Semantics: NaN fails both forms; -0.0 passes both;
  * the only divergence is integral `abs(MinValue)` overflow, which the
  * rewrite avoids rather than throws — documented, benign.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` — the
  * rule-extension mechanism (SURVEY.md §7.3), complementing the function
  * injection in [[graft.engine.GraftExtensions]].
  */
object AbsRangeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_COMPARISON)) {
      case LessThanOrEqual(a @ Abs(e, _), r) if r.foldable && isSafe(a) =>
        And(GreaterThanOrEqual(e, UnaryMinus(r)), LessThanOrEqual(e, r))
      case LessThan(a @ Abs(e, _), r) if r.foldable && isSafe(a) =>
        And(GreaterThan(e, UnaryMinus(r)), LessThan(e, r))
      case GreaterThanOrEqual(r, a @ Abs(e, _)) if r.foldable && isSafe(a) =>
        And(GreaterThanOrEqual(e, UnaryMinus(r)), LessThanOrEqual(e, r))
      case GreaterThan(r, a @ Abs(e, _)) if r.foldable && isSafe(a) =>
        And(GreaterThan(e, UnaryMinus(r)), LessThan(e, r))
    }

  /** Deterministic, non-throwing argument — don't duplicate a nondeterministic
    * or side-effecting child into two comparisons. */
  private def isSafe(a: Abs): Boolean = a.child.deterministic
}
