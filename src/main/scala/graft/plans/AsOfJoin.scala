package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.TimestampType

/** Native AS-OF (point-in-time) join — the engine's demonstration of
  * the full custom-operator extension tier: a logical node, a planner
  * strategy, and a physical [[AsOfJoinExec]] that executes a single
  * co-partitioned merge pass.
  *
  * Semantics (the `pandas.merge_asof` surface): for every left row,
  * attach one right row with the same key, chosen by `direction`:
  *  - `backward` (default): the LATEST right time <= the left time
  *    (inclusive);
  *  - `forward`: the EARLIEST right time >= the left time (inclusive);
  *  - `nearest`: whichever of the two candidates has the smaller
  *    absolute time distance; equal distances resolve backward.
  * An optional `toleranceUs` (microseconds, -1 = unbounded) rejects
  * candidates farther than the bound in the chosen direction. Rows
  * with a NULL key or NULL time never match. Among right rows tied on
  * (key, time) the last in sort order wins for backward, the first
  * for forward; callers needing a deterministic payload on ties
  * should disambiguate the time (the q53 surface projects only the
  * time itself, which ties cannot change).
  *
  * Why a custom operator when q53 already composes the same answer
  * from primitives (union + last-ignoreNulls window)? The composed
  * form pays: both sides union into ONE shuffle whose rows carry the
  * superset schema of both inputs, then a window pass re-sorts the
  * merged stream. The native operator keeps each side its own
  * (smaller) shuffle, sorts each side once, and then streams a
  * two-pointer merge with O(1) state per key — no window buffer, no
  * widened rows, no post-filter. Both plans are one-shuffle-per-side
  * at 100 TB; the native one moves strictly fewer bytes per row and
  * is the shape real engines (kdb, QuestDB, Flink temporal join) give
  * this operator.
  *
  * Execution contract (what EnsureRequirements provides): both
  * children hash-clustered on their keys into compatible
  * partitionings, each sorted by (keys..., time ASC NULLS FIRST). The
  * merge consumes each partition's iterators exactly once — right
  * rows with null keys/times sort first and are consumed as
  * non-matches, so pointer progress is monotonic.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String = AsOfJoin.Backward,
    toleranceUs: Long = -1L)
  extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  require(AsOfJoin.Directions.contains(direction),
    s"as-of join direction must be one of ${AsOfJoin.Directions.mkString("/")}; got '$direction'")
  require(toleranceUs >= 0L || toleranceUs == -1L,
    s"as-of join tolerance must be non-negative microseconds (or -1 = unbounded); got $toleranceUs")
  // no analyzer coercion runs on a hand-built node: mismatched key
  // types would hash each side's logically-equal keys to different
  // partitions AND mis-read the right key bytes under the left-typed
  // ordering — silently wrong results, so fail construction instead
  // (callers cast explicitly, as with the time columns)
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types must match pairwise; got " +
      s"${leftKeys.map(_.dataType.simpleString).mkString(",")} vs " +
      s"${rightKeys.map(_.dataType.simpleString).mkString(",")}")
  // NormalizeFloatingNumbers only instruments built-in joins, so -0.0
  // vs 0.0 / NaN keys would break co-partitioning here; as-of keys are
  // identifiers, so reject the type rather than half-support it
  require(!leftKeys.exists(k => k.dataType == org.apache.spark.sql.types.FloatType
      || k.dataType == org.apache.spark.sql.types.DoubleType),
    "as-of join keys must not be FLOAT/DOUBLE (no -0.0/NaN normalization " +
      "runs on this node); cast to a discrete type")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

/** Planner strategy: lowers [[AsOfJoinPlan]] to [[AsOfJoinExec]].
  * Injected via `spark.sql.extensions=graft.GraftExtensions` or picked
  * up lazily by [[AsOfJoin.asof]] through `spark.experimental`. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    // safety net: a snapshot leaf that somehow reached physical planning
    // unexpanded (SnapshotExpandRule not registered) still executes —
    // losing only scan-level pushdown, never correctness
    case r: graft.table.GraftSnapshotRelation =>
      planLater(graft.table.SnapshotExpandRule(
        org.apache.spark.sql.SparkSession.active).expandNow(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String = AsOfJoin.Backward,
    toleranceUs: Long = -1L)
  extends BinaryExecNode {

  require(leftTime.dataType == TimestampType &&
    rightTime.dataType == TimestampType,
    s"as-of join times must be TIMESTAMP (cast in the caller); got " +
      s"${leftTime.dataType} / ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on their keys (the SortMergeJoin contract:
  // EnsureRequirements makes the two ClusteredDistributions compatible
  // by hashing each side on its keys with a shared partition count)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // rows stream out in the left child's partition + sort order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val out = output
    val dir = direction
    val tolUs = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(out, out)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // forward keeps an equal-time head UNconsumed (it is the forward
      // candidate, inclusive, and may serve many left rows); backward
      // and nearest consume it as the backward candidate (distance 0
      // always wins the nearest comparison, ties resolve backward)
      val consumeEqualTime = dir != AsOfJoin.Forward
      // the latest consumed matching right row (copied: iterators reuse
      // row buffers), the key it matched under, and its time (for the
      // tolerance bound and the nearest-distance comparison)
      var matchRow: InternalRow = null
      var matchKey: UnsafeRow = null
      var matchTime = 0L
      // projected view of the CURRENT right head, cached so a parked
      // pointer (many left rows against one future-time head — the
      // dense-left case) pays one projection per head, not per left
      // row. The projection buffers stay valid until the projections
      // are re-applied, which happens only on refresh after a consume.
      var headCached = false
      var headKey: UnsafeRow = null
      var headKeyNull = false
      var headTimeNull = false
      var headTime = 0L
      def refreshHead(): Unit = if (!headCached) {
        val h = rBuf.head
        headKey = rKeyProj(h)
        headKeyNull = headKey.anyNull
        val tr = rTimeProj(h)
        headTimeNull = tr.isNullAt(0)
        headTime = if (headTimeNull) 0L else tr.getLong(0)
        headCached = true
      }
      def consumeHead(): InternalRow = {
        headCached = false
        rBuf.next()
      }
      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l)
        if (lk.anyNull || ltRow.isNullAt(0)) {
          // null keys/times never match; null-first sort puts these
          // left rows ahead of any right consumption for their key
          numOutputRows += 1
          resultProj(joined(l, nullRight))
        } else {
          val lt = ltRow.getLong(0)
          var advance = true
          while (advance && rBuf.hasNext) {
            refreshHead()
            val c = if (headKeyNull) -1 else keyOrd.compare(headKey, lk)
            if (c < 0) {
              consumeHead() // smaller (or null) key: consume, no match
            } else if (c == 0) {
              if (headTimeNull) {
                consumeHead() // null time sorts first: consume, no match
              } else if (headTime < lt || (headTime == lt && consumeEqualTime)) {
                matchKey = headKey.copy()
                matchTime = headTime
                matchRow = consumeHead().copy()
              } else {
                advance = false // same key, at/past the left time: stop
              }
            } else {
              advance = false // right is past this key
            }
          }
          // backward candidate: the latest consumed right row, if its
          // key still equals this left row's and it is inside tolerance
          val bwOk = dir != AsOfJoin.Forward &&
            matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey, lk) == 0 &&
            (tolUs < 0L || lt - matchTime <= tolUs)
          // forward candidate: the unconsumed head — the first right
          // row at this key with time >= lt (> lt under nearest, where
          // equal times were consumed backward). Left times ascend, so
          // leaving it in place lets it serve later left rows too.
          val fwOk = dir != AsOfJoin.Backward && rBuf.hasNext && {
            refreshHead()
            !headKeyNull && !headTimeNull &&
              keyOrd.compare(headKey, lk) == 0 && headTime >= lt &&
              (tolUs < 0L || headTime - lt <= tolUs)
          }
          val useForward =
            if (dir == AsOfJoin.Forward) fwOk
            else fwOk && (!bwOk || headTime - lt < lt - matchTime)
          val hit = useForward || bwOk
          numOutputRows += 1
          if (hit) numMatched += 1
          val rRow =
            if (useForward) rBuf.head else if (bwOk) matchRow else nullRight
          resultProj(joined(l, rRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** DataFrame-level entry point. */
object AsOfJoin {

  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"
  val Directions: Set[String] = Set(Backward, Forward, Nearest)

  /** Left as-of join: every `left` row + the matching `right` row for
    * equal keys, picked by `direction` (latest `rightTime <= leftTime`
    * by default; see [[AsOfJoinPlan]] for forward/nearest and the tie
    * rules), nulls if none. `tolerance` bounds how far the match may
    * be in the chosen direction. Times must be castable to timestamp
    * (cast applied here). Lazily registers the planner strategy on the
    * session, so it works on any session —
    * `spark.sql.extensions=graft.GraftExtensions` is the config-only
    * alternative. */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      direction: String = Backward,
      tolerance: Option[java.time.Duration] = None): DataFrame = {
    require(tolerance.forall(d => !d.isNegative),
      s"as-of join tolerance must be non-negative; got $tolerance")
    val spark = left.sparkSession
    GraftSqlBridge.ensureStrategy(spark, GraftStrategies)
    // eager conversion: a hand-built plan needs real catalyst exprs
    // with dataTypes, not the lazy ColumnNodeExpression wrappers
    val e = (c: Column) => GraftSqlBridge.expressionOf(spark, c)
    val lPlan = GraftSqlBridge.analyzed(left)
    var rPlan = GraftSqlBridge.analyzed(right)
    var rKeyExprs = rightKeys.map(e)
    var rTimeExpr = e(rightTime.cast("timestamp"))
    // Self-join / shared-lineage dedup: Spark's DeduplicateRelations
    // only instruments built-in nodes, so a right side sharing exprIds
    // with the left (asof(df, df, ...)) would emit duplicate
    // attributes downstream and resolve key/time refs ambiguously.
    // Re-alias every right attribute under a fresh exprId and remap
    // the right-side expressions onto the new ids — right key/time
    // Columns always bind to the (re-aliased) right side.
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      val fresh = rPlan.output.map(a => Alias(a, a.name)())
      val mapping = rPlan.output.map(_.exprId).zip(fresh.map(_.toAttribute)).toMap
      rPlan = Project(fresh, rPlan)
      def remap(x: Expression): Expression = x.transform {
        case a: Attribute if mapping.contains(a.exprId) => mapping(a.exprId)
      }
      rKeyExprs = rKeyExprs.map(remap)
      rTimeExpr = remap(rTimeExpr)
    }
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(e), rKeyExprs,
      e(leftTime.cast("timestamp")), rTimeExpr,
      direction,
      tolerance.map(d => d.toNanos / 1000L).getOrElse(-1L)))
  }
}
