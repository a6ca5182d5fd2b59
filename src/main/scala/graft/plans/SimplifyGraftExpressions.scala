package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.AsciiFold

/** Optimizer rule for the engine's custom expressions — the
  * `Rule[LogicalPlan]` tier of the custom-operator ladder, injected via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Rewrites applied (strictly semantics-preserving):
  *  - `ascii_fold(ascii_fold(x))` → `ascii_fold(x)` — the fold is exactly
  *    idempotent (its output is pure ASCII, which NFKD maps to itself), and
  *    the double application arises naturally when a normalized ingest
  *    ([[graft.operators.GraphBuilder]]`.build(asciiFold = true)`) feeds a
  *    query that defensively folds again. Each collapse removes one full
  *    NFKD pass per row — material on a 100 TB text scan.
  *
  * Literal folding needs no rule: the expressions propagate `foldable`, so
  * Catalyst's built-in ConstantFolding already evaluates them at plan time.
  */
object SimplifyGraftExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case AsciiFold(inner @ AsciiFold(_)) => inner
    }
}
