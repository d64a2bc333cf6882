package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Morton (Z-order) interleaving for multi-column data clustering.
  *
  * Writing a table range-partitioned + sorted by the z-value of two
  * columns gives every output file a SMALL bounding box in BOTH columns
  * at once, so a scan filtered on either (or both) skips most files via
  * parquet min/max stats — the standard lakehouse layout technique for
  * multi-dimensional scan pruning (a single-column sort only bounds one
  * dimension; the other spans the full domain in every file).
  *
  * The interleave is the classic binary-magic-numbers bit spread: bit i
  * of `a` lands at bit 2i, bit i of `b` at bit 2i+1. Pure integer ops,
  * branch-free, codegen'd — layout cost stays scan-bound at 100 TB.
  */
object ZOrder {

  /** Spread the low 32 bits of v so bit i lands at bit 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of two 32-bit values (a = even bits, b = odd). */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** N-way Morton code: bit j of dimension i lands at bit j*n + i, each
    * dimension contributing its low floor(64/n) bits (callers normalize
    * to that grid first). n=2 takes the branch-free magic-number path;
    * the general loop is 64 iterations of pure integer ops — still
    * cheap against a 100 TB rewrite's I/O. NULL grid values arrive as 0
    * (callers coalesce), so null rows cluster together at the origin. */
  def interleaveN(v: ArrayData): Long = {
    val n = v.numElements()
    if (n == 1) return if (v.isNullAt(0)) 0L else v.getLong(0)
    if (n == 2)
      return interleave(
        if (v.isNullAt(0)) 0L else v.getLong(0),
        if (v.isNullAt(1)) 0L else v.getLong(1))
    val bits = 64 / n
    var out = 0L
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0L else v.getLong(i)
      val masked = x & ((1L << bits) - 1)
      var j = 0
      while (j < bits) {
        out |= ((masked >>> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    out
  }

  /** First-6-UTF-8-bytes of a string as a big-endian long in
    * [0, 2^48) — a monotone embedding of code-point order (UTF-8 byte
    * order IS code-point order, the same invariant the manifest's
    * string boxes rely on) that survives the double-space grid
    * normalization exactly (48 bits < the 53-bit mantissa). The string
    * leg of a multi-type z-order: clustering only — per-file boxes are
    * re-recorded from the true values afterwards, so pruning
    * correctness never depends on the prefix. */
  def strPrefixLong(s: UTF8String): Long = {
    val b = s.getBytes
    var out = 0L
    var i = 0
    while (i < 6) {
      out = (out << 8) | (if (i < b.length) (b(i) & 0xFFL) else 0L)
      i += 1
    }
    out
  }

  /** z_value(a, b): 64-bit Morton code of two long columns (callers
    * normalize to 32-bit range first; higher bits are masked off). */
  case class ZValue(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"z_value needs two bigint columns, got " +
            s"${left.dataType} and ${right.dataType}")

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.ZOrder.interleave($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** z_value_n(array<bigint>): N-way Morton code of pre-normalized grid
    * values (the array is built by `functions.array` over the
    * normalized dims, so the whole pipeline stays inside whole-stage
    * codegen; null ELEMENTS cluster at 0 — see [[interleaveN]]). */
  case class ZValueN(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"z_value_n needs array<bigint>, got $other")
      }
    override protected def nullSafeEval(input: Any): Any =
      ZOrder.interleaveN(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ZOrder.interleaveN($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** str_prefix_long(s): the string leg's grid embedding — see
    * [[strPrefixLong]]. */
  case class StringPrefixLong(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"str_prefix_long needs string, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      ZOrder.strPrefixLong(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ZOrder.strPrefixLong($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Column-API entry point. */
  def z_value(a: Column, b: Column): Column =
    column(ZValue(expression(a), expression(b)))

  /** N-way Column-API entry point: Morton code over pre-normalized grid
    * columns (each already in [0, 2^(64/n))). */
  def z_value_n(dims: Seq[Column]): Column = {
    require(dims.nonEmpty && dims.size <= 8,
      s"z_value_n takes 1..8 dimensions, got ${dims.size}")
    column(ZValueN(expression(
      org.apache.spark.sql.functions.array(dims: _*))))
  }

  /** str_prefix_long Column entry point. */
  def str_prefix_long(s: Column): Column =
    column(StringPrefixLong(expression(s)))
}
