package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, CalendarIntervalType, DataType, DayTimeIntervalType, IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** Pure-SQL surface for the native as-of join. Usage:
  *
  * {{{
  *   SELECT ...
  *   FROM events l LEFT JOIN orders r
  *     ON asof_match(l.key, r.key, l.ts, r.ts)            -- backward
  *   -- ON asof_match(l.key, r.key, l.ts, r.ts, 'nearest')
  *   -- ON asof_match(l.key, r.key, l.ts, r.ts, 'forward', INTERVAL '1' HOUR)
  * }}}
  *
  * `asof_match` is an unevaluable boolean marker: it resolves like any
  * scalar function (so the join analyzes normally), then
  * [[AsOfMarkerRewrite]] — a post-hoc resolution rule injected by
  * `graft.GraftExtensions` — replaces the whole `LEFT JOIN ... ON
  * asof_match(...)` with an [[AsOfJoinPlan]], which the planner lowers
  * to the co-partitioned merge ([[AsOfJoinExec]]). Key and time
  * arguments may appear in either order; the rule binds each to its
  * side by attribute provenance. A marker that survives to the end of
  * the rewrite (wrong join type, used outside a join condition,
  * AND-ed with other predicates) fails analysis with a usage message
  * rather than crashing at execution.
  */
case class AsOfMatchMarker(children: Seq[Expression])
  extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "asof_match"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfMatchMarker =
    copy(children = newChildren)
}

object AsOfMarkerRewrite extends Rule[LogicalPlan] {

  private val usage =
    "asof_match(leftKey, rightKey, leftTime, rightTime[, direction[, tolerance]]) " +
      "must be the ENTIRE condition of a LEFT JOIN: " +
      "FROM l LEFT JOIN r ON asof_match(l.k, r.k, l.t, r.t). " +
      "direction is a literal 'backward'|'forward'|'nearest'; " +
      "tolerance a day-time INTERVAL literal."

  private def fail(detail: String): Nothing =
    throw new IllegalArgumentException(s"$detail\n$usage")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transformUp {
      case Join(left, right, joinType, Some(m: AsOfMatchMarker), _)
          if m.childrenResolved =>
        if (joinType != LeftOuter)
          fail(s"asof_match requires a LEFT JOIN (as-of emits nulls on " +
            s"no match); got $joinType")
        rewriteOne(left, right, m)
    }
    // every valid marker was just consumed by transformUp, so one
    // surviving anywhere (AND-ed with other predicates, in a WHERE, in
    // a projection) would reach execution as Unevaluable — turn that
    // into an analysis-time usage error instead
    rewritten.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: AsOfMatchMarker =>
          fail("asof_match appears outside a supported join condition")
        case _ => ()
      })
    }
    rewritten
  }

  private def rewriteOne(
      left: LogicalPlan, right: LogicalPlan, m: AsOfMatchMarker): LogicalPlan = {
    val es = m.children
    if (es.length < 4 || es.length > 6)
      fail(s"asof_match takes 4-6 arguments, got ${es.length}")

    def sideOf(e: Expression): Option[Boolean] = // Some(true) = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    def pair(a: Expression, b: Expression, what: String): (Expression, Expression) =
      (sideOf(a), sideOf(b)) match {
        case (Some(true), Some(false)) => (a, b)
        case (Some(false), Some(true)) => (b, a)
        case _ => fail(s"asof_match needs one $what from each join side; " +
          s"got '$a' and '$b'")
      }

    val (lk, rk) = pair(es(0), es(1), "key")
    val (lt, rt) = pair(es(2), es(3), "time")

    val direction = es.lift(4) match {
      case None => AsOfJoin.Backward
      case Some(Literal(s: UTF8String, StringType)) => s.toString.toLowerCase
      case Some(other) => fail(s"direction must be a string literal; got '$other'")
    }
    if (!AsOfJoin.Directions.contains(direction))
      fail(s"unknown direction '$direction'")

    // validate BEFORE mapping to the internal -1 "unbounded" sentinel:
    // an explicit -1 us literal must be rejected like any other negative
    // tolerance, never silently read as "no tolerance"
    val tolUs = es.lift(5) match {
      case None => -1L
      case Some(tolExpr) =>
        val v = tolExpr match {
          case Literal(v: Long, _: DayTimeIntervalType) => v
          case Literal(v: CalendarInterval, CalendarIntervalType) =>
            if (v.months != 0)
              fail("tolerance must not contain month units (not a fixed duration)")
            v.days * 86400000000L + v.microseconds
          case Literal(v: Long, LongType) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other =>
            fail(s"tolerance must be a day-time INTERVAL (or microseconds) literal; got '$other'")
        }
        if (v < 0L) fail(s"tolerance must be non-negative; got $v us")
        v
    }

    def ts(e: Expression): Expression =
      if (e.dataType == TimestampType) e
      else Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))

    AsOfJoinPlan(left, right, Seq(lk), Seq(rk), ts(lt), ts(rt), direction, tolUs)
  }
}
