package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF coarse-quantizer scoring (guide §4: no non-codegen
  * expression in a hot path): `cell_scores(v)` = the per-row sorted
  * array<struct<sim, ncid>> of cosine scores against the K frozen
  * centroids — the assign/probe primitive of every IVF operator
  * (k-means rounds, index build encode, probe fan-out, cell-scoped
  * semantic dedup).
  *
  * The previous spelling —
  * `sort_array(transform(typedlit(cents), c => struct(cosine(v, c._2),
  * -c._1)), asc = false)` — ran the lambda through the interpreted
  * higher-order-function path per row per centroid (plus one more
  * interpreted `transform` casting the vector), which at bench scale
  * dominated the k-means rounds and at corpus scale would make the
  * index-build encode pass interpreter-bound. This expression does the
  * same math in one codegen'd call: K fused dot/norm loops over the
  * unsafe array, one comparator sort.
  *
  * Bit-exactness contract (CellScoresSpec diffs against the old
  * spelling): float elements widen exactly like the old elementwise
  * cast; accumulation order matches [[VectorExprs.CosineSimilarity]]
  * (dot/na/nb in one left-to-right loop); a ragged vector or zero norm
  * scores NULL; ordering is sim DESC with Spark's double semantics
  * (NaN greatest, -0.0 == 0.0), NULL sims last, ties by ncid DESC —
  * exactly `sort_array(..., asc = false)` over the struct. */
object IvfExprs {

  /** Static scoring body (called from generated code). `v` MAY be null
    * — the old spelling's outer transform ran over the CENTROID
    * literal, so a NULL vector still yielded the K structs with NULL
    * sims (ordered ncid desc), never a NULL array; reproduced here. */
  def cellScoresEval(v: ArrayData, isFloat: Boolean, cids: Array[Int],
      cents: Array[Array[Double]]): ArrayData = {
    val n = if (v == null) -1 else v.numElements()
    val k = cids.length
    // query norm is identical across centroids — hoisted (same
    // accumulation order as the per-centroid loop it replaces)
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val sim: Any =
        if (cent.length != n) null
        else {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < n) {
            val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
            val y = cent(i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          if (na == 0.0 || nb == 0.0) null
          else java.lang.Double.valueOf(
            dot / (math.sqrt(na) * math.sqrt(nb)))
        }
      out(c) = new GenericInternalRow(
        Array[Any](sim, java.lang.Integer.valueOf(-cids(c))))
      c += 1
    }
    // Spark's double ordering: -0.0 == 0.0, NaN greatest
    def cmpD(a: Double, b: Double): Int =
      if (a == b) 0 else java.lang.Double.compare(a, b)
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]],
      new java.util.Comparator[AnyRef] {
        override def compare(ra: AnyRef, rb: AnyRef): Int = {
          val a = ra.asInstanceOf[GenericInternalRow]
          val b = rb.asInstanceOf[GenericInternalRow]
          val sa = a.values(0); val sb = b.values(0)
          // descending (= reversed NULLS-FIRST ascending): nulls last
          val c0 =
            if (sa == null && sb == null) 0
            else if (sa == null) 1
            else if (sb == null) -1
            else cmpD(sb.asInstanceOf[java.lang.Double].doubleValue,
              sa.asInstanceOf[java.lang.Double].doubleValue)
          if (c0 != 0) c0
          else java.lang.Integer.compare(
            b.values(1).asInstanceOf[java.lang.Integer].intValue,
            a.values(1).asInstanceOf[java.lang.Integer].intValue)
        }
      })
    new GenericArrayData(out)
  }

  /** cell_scores(embedding): sorted (sim desc, ncid desc) centroid
    * scores; the frozen model rides the generated class as a reference
    * object, exactly like [[PqExprs.PqEncode]]'s codebook. */
  case class CellScores(child: Expression, cids: Array[Int],
      cents: Array[Array[Double]]) extends UnaryExpression {
    require(cids.nonEmpty && cids.length == cents.length,
      "cell_scores needs a non-empty centroid model")

    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("sim", DoubleType, nullable = true),
        StructField("ncid", IntegerType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"cell_scores expects array<float|double>, got $other")
      }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : Any = {
      val v = child.eval(input)
      cellScoresEval(
        if (v == null) null else v.asInstanceOf[ArrayData],
        isFloat, cids, cents)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, FalseLiteral}
      val cidsRef = ctx.addReferenceObj("ivfCids", cids, "int[]")
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val childGen = child.genCode(ctx)
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(code = code"""
        |${childGen.code}
        |$javaType ${ev.value} = graft.functions.IvfExprs.cellScoresEval(
        |  ${childGen.isNull} ? null : ${childGen.value},
        |  $isFloat, $cidsRef, $centsRef);
        """.stripMargin, isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def cell_scores(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    column(CellScores(expression(v), cents.map(_._1).toArray,
      cents.map(_._2.toArray).toArray))
}
