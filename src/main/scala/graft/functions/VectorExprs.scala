package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native Catalyst expressions for embedding-vector math.
  *
  * A Scala UDF would box every element of a 64-float array per call; these
  * expressions read the unsafe `ArrayData` directly (no boxing, no
  * conversion to Scala collections) and generate Java code inline, so the
  * dot product stays inside whole-stage codegen. At 100 TB / billions of
  * vectors this is the difference between a scan-bound and a CPU-bound
  * similarity pass.
  *
  * Accumulation is sequential left-to-right in double precision — the
  * same order DuckDB's list_dot_product uses — so oracle comparisons are
  * bit-stable after ROUND(x, 4).
  */
object VectorExprs {

  private def readFn(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects array<float|double>, got $other")
  }

  /** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _))
            if (l == FloatType || l == DoubleType) &&
              (r == FloatType || r == DoubleType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cosine_similarity needs two float/double arrays, " +
              s"got ${left.dataType} and ${right.dataType}")
      }
    }

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      // ragged input (corrupt row) => NULL, never a confident prefix
      // similarity; DuckDB's list_dot_product errors on the same input
      if (a.numElements() != b.numElements()) return null
      val n = a.numElements()
      val ra = readFn(left.dataType)
      val rb = readFn(right.dataType)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = ra(a, i); val y = rb(b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def getter(dt: DataType, arr: String, i: String): String = dt match {
        case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
        case _                       => s"$arr.getDouble($i)"
      }
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
        val n = ctx.freshName("n"); val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |else {
           |  int $n = $a.numElements();
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = ${getter(left.dataType, a, i)};
           |    double $y = ${getter(right.dataType, b, i)};
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
           |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot(a, b), same storage-level access as CosineSimilarity.
    * NULL on ragged inputs, like CosineSimilarity. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      val n = a.numElements()
      val ra = readFn(left.dataType)
      val rb = readFn(right.dataType)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += ra(a, i) * rb(b, i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def getter(dt: DataType, arr: String, i: String): String = dt match {
        case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
        case _                       => s"$arr.getDouble($i)"
      }
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |else {
           |  int $n = $a.numElements();
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += ${getter(left.dataType, a, i)} * ${getter(right.dataType, b, i)};
           |  }
           |  ${ev.value} = $dot;
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // Spark 4 moved the Column<->Expression bridge behind a package-private
  // helper; GraftSqlBridge (in the org.apache.spark.sql package) re-exposes it.
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Column-API entry points. */
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** SQL registration: SELECT cosine_similarity(a.embedding, b.embedding). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", es => CosineSimilarity(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", es => DotProduct(es.head, es(1)), "built-in")
  }
}
