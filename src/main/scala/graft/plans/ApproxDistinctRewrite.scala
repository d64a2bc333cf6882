package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into an HLL
  * sketch estimate (`approx_count_distinct`) — the "approximate mode"
  * switch warehouse engines expose for interactive workloads.
  *
  * Why it matters at 100 TB: Spark plans an exact distinct count as TWO
  * shuffles (expand/partial-distinct, then final aggregation) whose
  * intermediate state scales with the number of DISTINCT VALUES per
  * group; the HLL rewrite is ONE map-side-combined shuffle whose state
  * is a constant-size (rsd-determined) sketch per group. Flipping a
  * session conf turns an hours-long cardinality dashboard query into a
  * single cheap pass, with a documented error bound, and without
  * touching query text.
  *
  * Semantics + safety:
  *  - OFF by default (`spark.graft.approxDistinct.enabled`, a RUNTIME
  *    session conf — no restart). The oracle-checked surface always runs
  *    with the flag off, so hash-match guarantees are unaffected.
  *  - Only single-argument `COUNT(DISTINCT x)` rewrites; multi-argument
  *    distinct counts and other distinct aggregates (e.g.
  *    `SUM(DISTINCT)`) keep exact semantics. FILTER clauses are
  *    preserved (the filter applies before sketch insertion either way).
  *  - The rewrite swaps the function INSIDE the AggregateExpression and
  *    keeps the expression's result id, so column names, references and
  *    output arity are untouched (`LongType` both ways).
  *  - rsd comes from `spark.graft.approxDistinct.rsd` (default 0.02 —
  *    ~2% relative error at ~2.5 KB of sketch per group).
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`
  * (runs with the operator-optimization batch, after analysis — the
  * distinct flag is still intact there; Spark only lowers distinct
  * aggregates during physical planning).
  */
case class ApproxDistinctRewrite() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.approxDistinct.enabled", "false")
      .toBoolean

  private def rsd: Double =
    conf.getConfString("spark.graft.approxDistinct.rsd", "0.02").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, _, _)
              if c.children.size == 1 =>
            ae.copy(
              aggregateFunction =
                HyperLogLogPlusPlus(c.children.head, relativeSD = rsd),
              isDistinct = false)
        }
    }
}
