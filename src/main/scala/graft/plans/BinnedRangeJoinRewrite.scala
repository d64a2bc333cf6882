package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Opt-in optimizer rule: rewrite an inner join with NO equi key but a
  * point-in-range condition (`p >= lo AND p <= hi`, point and bounds on
  * opposite sides) into a bin-keyed EQUI join — the automatic form of
  * q98's hand-written binned range join.
  *
  * Why it matters at 100 TB: Spark plans a keyless range join as a
  * BroadcastNestedLoopJoin (OOMs when neither side is small) or a
  * CartesianProduct (O(|L|·|R|) comparisons). The rewrite quantizes the
  * range domain into fixed-width bins: the point side computes its one
  * bin, the interval side explodes over the bins its [lo, hi] spans,
  * and the join becomes a shuffled hash/merge join on the bin key with
  * the ORIGINAL predicate kept as a residual — cost
  * O(data + matches), surviving any scale-up. Every qualifying pair
  * meets in exactly one bin (the point's), so no dedup pass is needed;
  * disqualified same-bin pairs are dropped by the residual.
  *
  * Scope + safety:
  *  - OFF by default: enabled by setting the bin width
  *    `spark.graft.rangeJoin.binSize` (> 0, in the range column's own
  *    units — ms for epoch-millis columns). Width is workload-declared,
  *    like Databricks' RANGE_JOIN bin-size hint: a good width is the
  *    typical interval length, and no rule can infer that statically.
  *  - Inner joins only, integral point/bound types only (the epoch-ms /
  *    id-range cases; bin arithmetic is exact for |x| < 2^53).
  *  - Joins that already HAVE an equi conjunct are left alone — Spark
  *    hashes on that key and the range predicates stay cheap residuals.
  *  - Strict bounds (`<`/`>`) bin like their inclusive forms (the bin
  *    span is a superset); the residual keeps the exact strictness.
  *  - A reversed interval (lo > hi) explodes over the descending bin
  *    sequence and the residual rejects every row — same empty result
  *    as the naive plan, no runtime error.
  *  - The rewritten join carries an equi key, so the rule cannot match
  *    its own output (safe under the optimizer's fixed-point batch).
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  * RangeJoinRewriteSpec proves off=BNLJ / on=equi-join with identical
  * results, equi-keyed joins untouched, and the empty-interval edge.
  */
case class BinnedRangeJoinRewrite() extends Rule[LogicalPlan]
    with PredicateHelper {

  private def binSize: Long =
    conf.getConfString("spark.graft.rangeJoin.binSize", "0").toLong

  private def intTyped(e: Expression): Boolean =
    (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }) && e.deterministic

  /** Exact floor-division bin: pure 64-bit integer arithmetic, so bins
    * are correct over the full Long domain (a Double round-trip is only
    * exact for |x| < 2^53 — snowflake-style id keys silently landed in
    * the wrong bin). `width > 0`, so truncation and floor differ only
    * for negative x with a nonzero remainder. */
  private def bin(e: Expression, width: Long): Expression = {
    val x = Cast(e, LongType)
    val w = Literal(width)
    val q = new IntegralDivide(x, w) // truncates toward zero
    If(And(LessThan(x, Literal(0L)), Not(EqualTo(new Remainder(x, w), Literal(0L)))),
      Subtract(q, Literal(1L)), q)
  }

  /** (point, bound) views of one comparison conjunct: `a >= b` is a
    * lower bound on `a` by `b` AND an upper bound on `b` by `a`. */
  private def lowerBounds(c: Expression): Seq[(Expression, Expression)] =
    c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b))
      case GreaterThan(a, b)        => Seq((a, b))
      case LessThanOrEqual(a, b)    => Seq((b, a))
      case LessThan(a, b)           => Seq((b, a))
      case _                        => Nil
    }

  private def upperBounds(c: Expression): Seq[(Expression, Expression)] =
    c match {
      case LessThanOrEqual(a, b)    => Seq((a, b))
      case LessThan(a, b)           => Seq((a, b))
      case GreaterThanOrEqual(a, b) => Seq((b, a))
      case GreaterThan(a, b)        => Seq((b, a))
      case _                        => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = binSize
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def splitsSides(a: Expression, b: Expression): Boolean =
          (canEvaluate(a, left) && canEvaluate(b, right)) ||
            (canEvaluate(a, right) && canEvaluate(b, left))
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b)       => splitsSides(a, b)
          case EqualNullSafe(a, b) => splitsSides(a, b)
          case _                   => false
        }
        if (hasEqui) j
        else {
          // find p bounded below and above by the OPPOSITE side
          val lows = conjuncts.flatMap(lowerBounds)
          val ups = conjuncts.flatMap(upperBounds)
          val triple = (for {
            (p, lo) <- lows.iterator
            (p2, hi) <- ups.iterator
            if p.semanticEquals(p2) &&
              Seq(p, lo, hi).forall(intTyped)
            pOnLeft = canEvaluate(p, left)
            if (pOnLeft && canEvaluate(lo, right) &&
              canEvaluate(hi, right)) ||
              (!pOnLeft && canEvaluate(p, right) &&
                canEvaluate(lo, left) && canEvaluate(hi, left))
          } yield (p, lo, hi, pOnLeft)).take(1).toSeq.headOption
          triple match {
            case None => j
            case Some((p, lo, hi, pOnLeft)) =>
              val pBin = Alias(bin(p, width), "__graft_bin_pt")()
              val ivBin =
                AttributeReference("__graft_bin_iv", LongType)()
              // omitted step: Sequence defaults to ±1, so a reversed
              // interval degrades gracefully instead of throwing
              // Sequence is TimeZoneAwareExpression: built AFTER the
              // analyzer's ResolveTimeZone pass, it must carry its
              // timezone explicitly or the plan goes unresolved
              def genOver(side: LogicalPlan) =
                Generate(
                  Explode(Sequence(bin(lo, width), bin(hi, width), None,
                    Some(conf.sessionLocalTimeZone))),
                  unrequiredChildIndex = Nil, outer = false,
                  qualifier = None, generatorOutput = Seq(ivBin),
                  child = side)
              def projOver(side: LogicalPlan) =
                Project(side.output :+ pBin, side)
              val (nl, nr) =
                if (pOnLeft) (projOver(left), genOver(right))
                else (genOver(left), projOver(right))
              val newCond = And(EqualTo(pBin.toAttribute, ivBin), cond)
              Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          }
        }
    }
  }
}
