package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native top-k-rows aggregate: keeps the k extreme rows of a group
  * under the struct argument's field-by-field ordering, as a bounded
  * binary heap.
  *
  * Scale contract — this is the shuffle-shape win over the window
  * idiom. `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` must
  * shuffle EVERY row of the fact table to its group's partition and
  * sort it there (WindowGroupLimit trims per task, but only after the
  * full exchange is planned over all surviving rows). This aggregate
  * runs as an ObjectHashAggregate with a map-side partial: each mapper
  * keeps at most k rows per group in an O(k) heap, so the exchange
  * carries <= k rows per (group, mapper) — at 100 TB the shuffle is
  * proportional to the answer, not the corpus.
  *
  * Ordering contract: rows compare by the struct's fields left to
  * right, each ascending with the engine's standard null-first order —
  * the array is emitted best-first (descending when `largest`,
  * ascending otherwise). Ties beyond the struct's fields cannot occur
  * when the caller includes a unique key as the trailing fields, which
  * is what makes the result deterministic under any partitioning and
  * oracle-checkable (the DuckDB restatement orders by every field DESC
  * resp. ASC).
  */
case class TopKRowsAgg(
    child: Expression,
    k: Int,
    largest: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType =>
      if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(st))
        TypeCheckResult.TypeCheckFailure(
          s"top_k_rows requires an orderable STRUCT argument, got ${st.sql}")
      else if (k < 1)
        TypeCheckResult.TypeCheckFailure(s"top_k_rows k must be >= 1, got $k")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_rows requires a STRUCT argument, got ${other.sql}")
  }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  // field-by-field ascending ordering over the struct's rows
  @transient private lazy val base: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType)
      .asInstanceOf[Ordering[Any]].on[InternalRow](identity)

  // heap root = the evictable row: the worst of the kept k. For
  // largest-k that is the smallest kept (reverse order), for
  // smallest-k the largest kept.
  @transient private lazy val heapOrd: Ordering[InternalRow] =
    if (largest) base.reverse else base

  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](heapOrd)

  private def offer(buf: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (buf.size < k) {
      buf.enqueue(row)
    } else if (heapOrd.compare(row, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(row)
    }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // the struct itself is non-null whenever its inputs exist; a null
    // struct (outer-join miss) simply does not compete
    if (v != null) offer(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(a: mutable.PriorityQueue[InternalRow],
      b: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    val sorted = buf.toArray.sorted(if (largest) base.reverse else base)
    new GenericArrayData(sorted.asInstanceOf[Array[Any]])
  }

  // length-prefixed UnsafeRow frames; the buffer never exceeds k rows
  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray
    // toUnsafe reuses ONE target buffer across calls and getBytes can
    // return that backing array without copying — serialize each frame
    // from a private copy or every frame aliases the last row written
    val frames = rows.map(r => toUnsafe(r).copy().getBytes)
    val out = java.nio.ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
    out.putInt(frames.length)
    frames.foreach { b => out.putInt(b.length); out.put(b) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row) // already <= k rows by construction
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "top_k_rows"
}

object TopKAgg {

  /** DataFrame entry point:
    * df.groupBy(g).agg(top_k_rows(struct(v, key...), 3)) — array of the
    * 3 largest (v, key...) structs, best first. Include a unique key as
    * the trailing struct fields for a deterministic result. */
  def top_k_rows(s: Column, k: Int, largest: Boolean = true): Column =
    column(TopKRowsAgg(expression(s), k, largest).toAggregateExpression())
}
