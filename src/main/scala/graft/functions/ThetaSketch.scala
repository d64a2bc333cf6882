package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-count set algebra (Apache DataSketches).
  *
  * HLL answers only |A| and |A ∪ B|; the theta family — a KMV sketch
  * that RETAINS its sampled hashes — also answers |A ∩ B| and |A \ B|,
  * which is what corpus slicing actually needs ("how many distinct
  * n-grams do these two sources share?"). The aggregate folds a column
  * into a compact sketch per group (bounded memory, map-side partial
  * agg, merge = set union — associative and commutative, so results are
  * partition-invariant); the scalar expressions combine two compact
  * sketches AFTER aggregation, so they run on group-count-sized rows,
  * never on the fact table (CodegenFallback is fine at that altitude).
  *
  * Accuracy: estimates are EXACT while the union of the operands
  * retains fewer than 2^lgK hashes (theta = 1; the regime the DuckDB
  * oracle checks bit-for-bit via q87), and degrade to the documented
  * KMV relative error ~1/sqrt(2^lgK) beyond (SketchSpec drives an
  * undersized-k sketch through the sampling regime).
  *
  * Null/empty semantics: NULLs are excluded (standard aggregate
  * behavior) and the DataSketches library additionally rejects the
  * EMPTY string — `theta_sketch_agg` treats "" like NULL, so a column
  * containing "" estimates one below COUNT(DISTINCT). Callers counting
  * tokenizer output should filter empties (as q83 does) or map them to
  * a sentinel.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // SQL-reachable via GraftExtensions: reject wrong-typed input at
  // analysis time, not as an executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires a STRING argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    // getBytes feeds the murmur hash the same UTF-8 bytes update(String)
    // would re-encode — identical sketch, no per-row transcode. The
    // library rejects empty input ("" behaves like NULL; see class doc).
    if (v != null) buf.update(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "theta_sketch_agg"
}

object ThetaExprs {

  private[functions] def sketch(bytes: Any): CompactSketch =
    Sketches.heapifyCompactSketch(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))

  /** Estimates round to long: exact-regime estimates are integral by
    * construction, and a distinct COUNT is integral by meaning. */
  private[functions] def est(d: Double): Long = math.round(d)

  // (ExpectsInputTypes is unusable here — AbstractDataType went
  // private[sql] in Spark 4 — so the input contract is enforced via
  // checkInputDataTypes: these are SQL-reachable through
  // GraftExtensions, and a wrong-typed argument must fail analysis,
  // not throw ClassCastException on an executor.)
  abstract class ThetaBinary extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == BinaryType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BINARY theta sketches, got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  case class ThetaEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"theta_estimate requires a BINARY theta sketch, got ${child.dataType.sql}")
    override protected def nullSafeEval(v: Any): Any =
      est(sketch(v).getEstimate)
    override protected def withNewChildInternal(c: Expression): ThetaEstimate =
      copy(child = c)
    override def prettyName: String = "theta_estimate"
  }

  case class ThetaUnionEstimate(left: Expression, right: Expression)
    extends ThetaBinary {
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val sa = sketch(a); val sb = sketch(b)
      // The union gadget's OWN nominal-entry cap would downsample past
      // its k even when both operands are exact (the builder default is
      // 2^12 = 4096 — SMALLER than the agg's 2^15 default, silently
      // breaking the exact-regime contract). Size it to cover both
      // operands' retained sets so the union never discards a hash the
      // operands kept: exact inputs stay exact through the union.
      val need = math.max(1L, sa.getRetainedEntries(true).toLong +
        sb.getRetainedEntries(true).toLong)
      val lgK = math.min(26, 64 - java.lang.Long.numberOfLeadingZeros(
        need * 2 - 1))
      val u = SetOperation.builder()
        .setLogNominalEntries(math.max(lgK, 4)).buildUnion()
      u.union(sa); u.union(sb)
      est(u.getResult.getEstimate)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaUnionEstimate = copy(l, r)
    override def prettyName: String = "theta_union_estimate"
  }

  case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends ThetaBinary {
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val i = SetOperation.builder().buildIntersection()
      est(i.intersect(sketch(a), sketch(b)).getEstimate)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaIntersectEstimate = copy(l, r)
    override def prettyName: String = "theta_intersect_estimate"
  }

  case class ThetaAnotBEstimate(left: Expression, right: Expression)
    extends ThetaBinary {
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val d = SetOperation.builder().buildANotB()
      est(d.aNotB(sketch(a), sketch(b)).getEstimate)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaAnotBEstimate = copy(l, r)
    override def prettyName: String = "theta_anotb_estimate"
  }
}

object ThetaSketchFuncs {
  import ThetaExprs._

  def theta_sketch_agg(c: Column, lgK: Int = 15): Column =
    column(ThetaSketchAgg(expression(c), lgK).toAggregateExpression())
  def theta_estimate(c: Column): Column =
    column(ThetaEstimate(expression(c)))
  def theta_union_estimate(a: Column, b: Column): Column =
    column(ThetaUnionEstimate(expression(a), expression(b)))
  def theta_intersect_estimate(a: Column, b: Column): Column =
    column(ThetaIntersectEstimate(expression(a), expression(b)))
  def theta_anotb_estimate(a: Column, b: Column): Column =
    column(ThetaAnotBEstimate(expression(a), expression(b)))
}
