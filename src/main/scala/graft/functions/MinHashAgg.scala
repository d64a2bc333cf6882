package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst MinHash sketch aggregate: folds a column of shingle
  * strings into a 64-permutation MinHash signature (`array<bigint>`).
  *
  * This is the sketch-style aggregation shape (like HLL/theta sketches):
  * the buffer is a fixed 512-byte array regardless of group size, merges
  * are element-wise mins, and partial aggregation happens map-side — so
  * a corpus-level or per-source signature costs one pass and a tiny
  * shuffle at any scale. Estimated Jaccard between two groups is the
  * fraction of matching signature positions.
  *
  * A TypedImperativeAggregate (not an Aggregator UDAF) so the buffer
  * lives as raw bytes in the aggregation hash map — no per-row
  * serialization until spill/shuffle.
  */
case class MinHashSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(TextHash.NumPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = TextHash.fnv1a64(v.asInstanceOf[UTF8String].toString)
      var i = 0
      while (i < TextHash.NumPerms) {
        val p = TextHash.permA(i) * h + TextHash.permB(i)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "minhash_sketch"
}

object MinHashAgg {
  /** DataFrame entry point: df.groupBy(...).agg(minhash_sketch($"shingle")). */
  def minhash_sketch(shingle: Column): Column =
    column(MinHashSketch(expression(shingle)).toAggregateExpression())
}
