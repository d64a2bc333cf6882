package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

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

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Column-API entry point. */
  def z_value(a: Column, b: Column): Column =
    column(ZValue(expression(a), expression(b)))
}
