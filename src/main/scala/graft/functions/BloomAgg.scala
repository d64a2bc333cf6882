package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter aggregate over Spark's own `util.sketch.BloomFilter`
  * (the sketch the engine's runtime join filters use, exposed as a
  * first-class aggregate): the group's values fold into a fixed-size
  * bit array, merges are bitwise ORs, and the result is the sketch's
  * portable serialized form.
  *
  * The consumer contract is file-level data skipping on a column the
  * layout is NOT clustered by: per-file min/max boxes are useless for a
  * point lookup on a key uncorrelated with the sort order (every box
  * spans the domain), but a per-file bloom answers "definitely absent"
  * in O(1) — a reader prunes to the one file holding the key plus an
  * `fpp` fraction of false keeps, without opening any file.
  *
  * Size contract: the buffer is `~ -n ln(fpp) / ln(2)^2` BITS regardless
  * of row count (per the standard bloom bound) — at the defaults
  * (n=4096, fpp=1%) that is ~4.8 KiB per (group, mapper), constant at
  * any SF. Oversubscription past `expectedItems` degrades fpp only,
  * never correctness: `mightContain` can false-positive, never
  * false-negative, so a skip decision is always safe.
  */
case class BloomFilterBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      if (expectedItems <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"bloom_agg expectedItems must be positive, got $expectedItems")
      else if (fpp <= 0d || fpp >= 1d)
        TypeCheckResult.TypeCheckFailure(
          s"bloom_agg fpp must be in (0, 1), got $fpp")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "bloom_agg requires an integral or STRING argument, got " + other.sql)
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.putBinary(s.getBytes)
      case n: Number => buf.putLong(n.longValue())
    }
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def serialize(buf: BloomFilter): Array[Byte] =
    eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "bloom_agg"
}

object BloomAgg {

  /** DataFrame entry point: per-group bloom sketch bytes.
    * `df.groupBy(file).agg(bloom_agg(col("key"), 4096, 0.01))`. */
  def bloom_agg(c: Column, expectedItems: Long = 4096L,
      fpp: Double = 0.01): Column =
    column(BloomFilterBuildAgg(expression(c), expectedItems, fpp)
      .toAggregateExpression())

  /** Reader-side membership probe over serialized sketch bytes
    * (driver-side manifest pruning; the false-positive direction is the
    * safe one — a kept file is just read and filtered exactly). */
  def mightContainLong(bloomBytes: Array[Byte], key: Long): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
      .mightContainLong(key)

  def mightContainString(bloomBytes: Array[Byte], key: String): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
      .mightContainBinary(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
