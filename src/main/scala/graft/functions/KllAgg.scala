package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable streaming-quantile aggregate over the Apache DataSketches
  * KLL sketch — the 100 TB quantile path.
  *
  * The engine already carries three quantile shapes with different
  * scale/accuracy trades: q61 (exact percentiles — per-group sort, the
  * gold standard while groups fit a reducer), q84 (deterministic KMV
  * bottom-k sample — constant memory, O(1/sqrt(k)) rank error, oracle-
  * checkable), and q79 (equi-depth binning). KLL completes the family:
  * a provable worst-case rank-error bound (~1.33% of N at k=200,
  * `getNormalizedRankError`) in O(k log(N/k)) memory, and — unlike the
  * KMV sample — the sketch is MERGEABLE, so partial aggregation runs
  * map-side and a corpus-wide quantile pass shuffles one ~2 KB sketch
  * per group per mapper, never values. This is the structure Spark's own
  * `approx_percentile` (GK sketch) has, with a strictly better proven
  * error/space trade and a portable serialized form.
  *
  * Determinism note: KLL compaction flips a random coin per level, so
  * two runs may retain different samples. The guarantee that IS
  * partition-invariant is the rank-error bound — KllSketchSpec asserts
  * `|rank(q_hat) - p| <= eps` under several partitionings — so the query
  * surface declares q93 rows-only (like the other randomized sketches)
  * rather than hash-matched.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // SQL-reachable via GraftExtensions: reject wrong-typed input at
  // analysis time, not as an executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a DOUBLE argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "kll_sketch_agg"
}

object KllExprs {

  /** kll_quantile(sketch, rank) — the value at normalized rank `rank`
    * (INCLUSIVE search criteria, the library default). Runs post-agg on
    * group-count-sized rows, so CodegenFallback costs nothing.
    *
    * NULL semantics (both exprs are SQL-reachable via GraftExtensions,
    * so misuse must not crash an executor): an EMPTY sketch — the agg
    * output of an all-NULL or zero-row group — answers NULL, matching
    * Spark's own approx_percentile; a rank outside [0, 1] answers NULL
    * rather than throwing the library's SketchesArgumentException
    * mid-query (Spark's non-ANSI convention for out-of-domain scalar
    * arguments, e.g. element_at). */
  case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (BINARY kll sketch, DOUBLE rank), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    override protected def nullSafeEval(sk: Any, rank: Any): Any = {
      val s = KllDoublesSketch.heapify(
        Memory.wrap(sk.asInstanceOf[Array[Byte]]))
      val r = rank.asInstanceOf[Double]
      if (s.isEmpty || r < 0.0 || r > 1.0) null else s.getQuantile(r)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): KllQuantile = copy(l, r)
    override def prettyName: String = "kll_quantile"
  }

  /** kll_rank(sketch, value) — the normalized rank of `value`; the
    * inverse of kll_quantile, used by the spec to state the KLL
    * error-bound contract directly. NULL on an empty sketch (see
    * [[KllQuantile]]). */
  case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"kll_rank requires (BINARY kll sketch, DOUBLE value), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    override protected def nullSafeEval(sk: Any, value: Any): Any = {
      val s = KllDoublesSketch.heapify(
        Memory.wrap(sk.asInstanceOf[Array[Byte]]))
      if (s.isEmpty) null else s.getRank(value.asInstanceOf[Double])
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): KllRank = copy(l, r)
    override def prettyName: String = "kll_rank"
  }
}

object KllFuncs {
  import KllExprs._

  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    column(KllSketchAgg(expression(c), k).toAggregateExpression())
  def kll_quantile(sk: Column, rank: Column): Column =
    column(KllQuantile(expression(sk), expression(rank)))
  def kll_rank(sk: Column, value: Column): Column =
    column(KllRank(expression(sk), expression(value)))
}
