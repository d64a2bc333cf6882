package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expressions for set math over PRE-SORTED arrays.
  *
  * `array_intersect(a, b)` builds a hash set per row per call (one
  * `UTF8String` hash + table insert per element, plus the materialized
  * intersection array) — the right tool for unordered inputs, but pure
  * overhead when the arrays are already sorted: a similarity-join verify
  * stage only needs the COUNT of common elements, and for sorted inputs
  * that is a single allocation-free merge scan. At q104's verify volume
  * (one count per candidate pair, arrays of ~10²-10³ shingles, at 100 TB
  * billions of pairs) the merge form keeps the stage inside whole-stage
  * codegen with zero per-row garbage.
  */
object ArrayExprs {

  /** Count of common elements of two string arrays that are BOTH sorted
    * ascending with no duplicates (the producer's contract — q104 builds
    * them with `array_sort(array_distinct(...))`). Unsorted input gives
    * an UNDERCOUNT, never an error — so the contract is enforced by the
    * producing query, and ArrayExprsSpec locks eval == codegen ==
    * `size(array_intersect)` on sorted inputs. NULL array => NULL; NULL
    * elements sort last (Spark's array_sort default) and are never
    * counted — the merge stops at the first NULL on either side.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count needs two array<string>, " +
            s"got ${left.dataType} and ${right.dataType}")
      }

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (na, nb) = (a.numElements(), b.numElements())
      var i = 0; var j = 0; var c = 0
      while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        s"""
           |final int $na = $a.numElements();
           |final int $nb = $b.numElements();
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $na && $j < $nb && !$a.isNullAt($i) && !$b.isNullAt($j)) {
           |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($cmp == 0) { $c++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override def prettyName: String = "sorted_intersect_count"

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}
