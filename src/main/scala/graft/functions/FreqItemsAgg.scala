package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native heavy-hitters aggregate over the Apache DataSketches
  * frequent-items sketch (Misra-Gries family; the same library Spark's
  * own `hll_sketch_agg` wraps for HLL).
  *
  * Scale contract: the buffer is a bounded hash map of at most
  * `maxMapSize` counters no matter how many rows stream through, merges
  * are sketch-merges (associative + commutative), and partial
  * aggregation runs map-side — so a corpus-wide term-frequency pass at
  * 100 TB shuffles one ~maxMapSize-entry sketch per group per mapper,
  * never the terms themselves.
  *
  * Accuracy contract (what the caller may rely on):
  *  - while a group's distinct-item count stays under the sketch's load
  *    capacity (0.75 * maxMapSize) no counter is ever evicted and every
  *    returned (est, lb, ub) triple is the EXACT count — this is the
  *    regime the DuckDB oracle checks bit-for-bit;
  *  - past capacity (open vocabulary at corpus scale) the sketch
  *    degrades per Misra-Gries: `est` overestimates by at most
  *    N/maxMapSize, `lb <= true <= ub` always, and NO_FALSE_NEGATIVES
  *    guarantees every item with true count > N/maxMapSize appears.
  *    SketchSpec exercises this regime with an undersized map.
  *
  * Results are emitted sorted by (est desc, item asc) so downstream
  * top-k windows are deterministic under any partitioning.
  */
case class FreqItemsSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  // not a val: the serde is stateless but not java.io.Serializable, and
  // this Expression ships inside the serialized physical plan
  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqItemsAgg.ResultType

  // SQL-reachable via GraftExtensions: reject wrong-typed input at
  // analysis time, not as an executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items_sketch requires a STRING argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b)
    a
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map { r =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.getItem), r.getEstimate,
          r.getLowerBound, r.getUpperBound))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "freq_items_sketch"
}

object FreqItemsAgg {

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  /** DataFrame entry point:
    * df.groupBy(...).agg(freq_items_sketch($"term", 2048)). */
  def freq_items_sketch(item: Column, maxMapSize: Int): Column =
    column(FreqItemsSketchAgg(expression(item), maxMapSize).toAggregateExpression())
}
