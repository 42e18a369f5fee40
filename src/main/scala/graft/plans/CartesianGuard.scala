package graft.plans

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan,
  OneRowRelation, ResolvedHint}

/** Session-wide analysis CHECK rule (SparkSessionExtensions ·
  * injectCheckRule — SURVEY §2 G18): REFUSE unbounded cartesian plans
  * at analysis time, before a single task runs. The failure mode it
  * guards is the worst one a 100 TB cluster has — a fact × fact cross
  * join admits a plan whose output is quadratic in the input; by the
  * time monitoring sees it, the damage is a full cluster for hours.
  * ExplainAudit flags the shape in CI; this rule makes the ENGINE
  * refuse it for every session user, ad-hoc SQL included.
  *
  * A cross join is allowed only when at least one side is provably
  * bounded:
  *   - a broadcast-hinted subtree (the engine's own convention: every
  *     legitimate crossJoin carries `broadcast(...)` — stats rows,
  *     1-row totals, bounded domain frames);
  *   - a grand-total aggregate (no grouping columns — exactly 1 row);
  *   - a LIMIT;
  *   - a local/one-row relation (literal fixtures).
  * Equi- and non-equi joins with conditions pass through untouched —
  * range/triangle joins are legitimate and their cost is bounded by
  * their predicates, which ExplainAudit reviews separately.
  *
  * The whole 300+-query registry runs under this rule (GraftSession
  * installs it unconditionally), which is the real compatibility
  * proof: correct plans never trip it.
  */
object CartesianGuard extends (LogicalPlan => Unit) {

  private def bounded(p: LogicalPlan): Boolean = p.exists {
    case h: ResolvedHint if h.hints.strategy.isDefined => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: GlobalLimit | _: LocalLimit                => true
    case _: LocalRelation | _: OneRowRelation          => true
    case _                                             => false
  }

  // Condition-less INNER joins cannot be flagged here, although they
  // plan to the same cartesian product: Dataset.join(right, usingCols)
  // eagerly analyzes `Join(left, right, Inner, None)` as its column-
  // disambiguation step BEFORE attaching the using-condition, and the
  // check rules run on that intermediate — flagging it would reject
  // every using-column join in the API. The Cross type is what both
  // Dataset.crossJoin and SQL `CROSS JOIN` produce, and is never an
  // analyzer intermediate.
  override def apply(plan: LogicalPlan): Unit = plan.foreach {
    case Join(left, right, Cross, _, _)
        if !bounded(left) && !bounded(right) =>
      throw new IllegalStateException(
        "graft cartesian guard: cross join with no bounded side " +
          "(broadcast hint, grand-total aggregate, limit, or literal " +
          "relation) — a quadratic plan at scale. Add broadcast(...) " +
          "around the small side or rewrite with a join condition.")
    case _ => ()
  }
}
