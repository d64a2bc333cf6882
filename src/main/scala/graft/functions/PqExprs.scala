package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., TPAMI'11 — the FAISS IVF-PQ
  * memory model): an embedding splits into M contiguous subspaces, each
  * quantized to its nearest codeword from a per-subspace codebook of K
  * entries, so a vector stores as M small codes instead of dim floats
  * (64-dim float32 = 256 B → M=8 codes = 8 B logical, a 32× cut — the
  * difference between an embedding corpus that fits executor memory and
  * one that does not). Scoring is ADC (asymmetric distance): the QUERY
  * stays exact; per query one M×K table of subspace dot products is
  * precomputed, and each candidate's approximate cosine is M table
  * lookups — no candidate vector is ever materialized.
  *
  * [[Pq]] holds the driver-side model math (codebook training on a
  * bounded sample, dot/norm tables — k×dim-class state, the same
  * legitimacy as SketchQueries.kmeansCentroids); [[PqExprs.PqEncode]]
  * is the distributed encoder (a codegen'd Catalyst expression — the
  * corpus-wide pass is the hot loop).
  */
object Pq {

  /** Train per-subspace codebooks with plain Lloyd k-means on a
    * driver-resident SAMPLE (FAISS practice: codebooks train on a
    * bounded subset, the corpus-wide pass is encode, not train).
    * Deterministic: seeds are the first k sample subvectors, ties to
    * the lowest codeword. Returns M × K × (dim/M) codewords. */
  def train(sample: Array[Array[Float]], m: Int, k: Int,
      iters: Int): Array[Array[Array[Float]]] = {
    require(sample.nonEmpty, "PQ training needs a non-empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { mi =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(
        v, mi * dsub, (mi + 1) * dsub))
      var cents = Array.tabulate(math.min(k, subs.length))(subs(_))
        .map(_.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(cents.length, dsub)(0.0)
        val cnts = new Array[Long](cents.length)
        subs.foreach { sv =>
          val c = nearest(sv, cents)
          cnts(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += sv(i); i += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (cnts(c) == 0L) old // empty cell keeps its codeword
          else Array.tabulate(dsub)(i => (sums(c)(i) / cnts(c)).toFloat)
        }
      }
      cents
    }
  }

  private[functions] def nearest(sv: Array[Float],
      cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      while (i < sv.length) {
        val x = sv(i) - cents(c)(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Per-codeword squared norms, M × K — the reconstruction's norm² is
    * EXACTLY the sum of its codewords' (concatenation is orthogonal by
    * construction), so ADC cosine needs only this global table. */
  def normTable(cb: Array[Array[Array[Float]]]): Array[Array[Double]] =
    cb.map(_.map(cw => cw.map(x => x.toDouble * x).sum))

  /** One query's ADC dot table, M × K: dot(q_sub[m], codeword[m][c]).
    * dot(q, reconstruction(code)) = Σ_m table[m][code[m]] exactly. */
  def dotTable(q: Array[Float], cb: Array[Array[Array[Float]]])
      : Array[Array[Double]] = {
    val dsub = cb.head.head.length
    cb.zipWithIndex.map { case (cents, mi) =>
      cents.map { cw =>
        var d = 0.0
        var i = 0
        while (i < cw.length) { d += q(mi * dsub + i).toDouble * cw(i); i += 1 }
        d
      }
    }
  }

  /** The ONE ADC cosine expression — Σ_m qtab[m][code[m]] over the
    * guarded norm — shared by the per-query PQ pipeline (q46c) and the
    * persisted codes-only indexes, so a fix to the formula (or the
    * NaN guard: a degenerate all-zero codebook would yield 0 → NaN,
    * and Spark sorts NaN ABOVE all doubles descending, crowding any
    * shortlist with garbage) can never apply to one and not the
    * other. All codegen'd HOFs, no UDF. `normTab` is
    * [[normTable]]'s rows as Seq (a `typedlit` literal). */
  def adcCosine(code: Column, qtab: Column, qnorm: Column,
      normTab: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.functions._
    def lookupSum(tab: Column): Column =
      aggregate(zip_with(code, tab,
        (c, row) => element_at(row, c + 1)), lit(0.0), (acc, x) => acc + x)
    lookupSum(qtab) /
      greatest(qnorm * sqrt(lookupSum(typedlit(normTab))), lit(1e-12))
  }
}

object PqExprs {

  private def requireType(e: Expression, ok: Boolean, want: String)
      : TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} expects $want, got ${e.children.map(_.dataType).mkString(", ")}")

  /** Static encode body (called from generated code): NULL on null
    * elements or a dimension mismatch with the codebook — an unsafe
    * read past the region would otherwise encode garbage. */
  def pqEncodeEval(v: ArrayData, cb: Array[Array[Array[Float]]])
      : ArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val n = v.numElements()
    if (n != m * dsub) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val sub = new Array[Float](dsub)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < dsub) { sub(j) = v.getFloat(mi * dsub + j); j += 1 }
      out(mi) = Pq.nearest(sub, cb(mi))
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** pq_encode(embedding): the vector's M subspace codes against a
    * broadcast codebook — array<int>, the corpus's stored form under
    * IVF-PQ. Codegen'd: the corpus-wide encode pass stays inside
    * whole-stage codegen (the codebook rides the generated class as a
    * reference object, not per-row state). */
  case class PqEncode(child: Expression, cb: Array[Array[Array[Float]]])
      extends UnaryExpression {
    require(cb.nonEmpty && cb.forall(_.nonEmpty),
      "pq_encode needs a non-empty codebook")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this, child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }, "array<float>")
    override protected def nullSafeEval(input: Any): Any =
      pqEncodeEval(input.asInstanceOf[ArrayData], cb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb,
        "float[][][]")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.PqExprs.pqEncodeEval($c, $cbRef);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def pq_encode(embedding: Column, cb: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expression(embedding), cb))
}
