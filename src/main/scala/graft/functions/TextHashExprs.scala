package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash family (MinHash
  * signatures, LSH band hashes, SimHash, SRP buckets).
  *
  * These replaced the round-1 Scala UDFs: a UDF pays per-row
  * Catalyst<->Scala conversion (UTF8String -> String -> boxed Seq ->
  * GenericArrayData) and breaks whole-stage codegen at the call site.
  * Each expression here generates a direct static call inside codegen
  * and reads/writes unsafe array data — the signature computation stays
  * the single hot loop it should be on a billion-document dedup pass.
  * The hash math itself lives in [[TextHash]] (shared with the sketch
  * aggregate and the specs).
  *
  * All four are SQL-reachable through GraftExtensions, so each validates
  * its input type at analysis time (the CosineSimilarity pattern) —
  * unsafe array getters read raw bytes and would otherwise turn a
  * mistyped literal into silently-wrong hashes.
  */
object TextHashExprs {

  // ---- static eval helpers (called from generated code) ----

  def minhashEval(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.minhashSignature(s.toString, n))

  /** NULL (not garbage) when the signature is not NumPerms long or has
    * null elements — an unsafe getLong past the region (or on a null
    * slot) reads arbitrary bytes instead of failing. */
  def bandsEval(sig: ArrayData): ArrayData = {
    if (sig.numElements() != TextHash.NumPerms) return null
    var j = 0
    while (j < TextHash.NumPerms) {
      if (sig.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Long](TextHash.NumBands)
    var b = 0
    while (b < TextHash.NumBands) {
      var h = 0xcbf29ce484222325L
      var i = b * TextHash.RowsPerBand
      while (i < (b + 1) * TextHash.RowsPerBand) {
        h ^= sig.getLong(i)
        h *= 0x100000001b3L
        i += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def simhashEval(s: UTF8String): Long = TextHash.simhash64(s.toString)

  /** Float path accumulates in FLOAT — bit-equal to TextHash.srpBucket
    * (the contract VectorExprSpec asserts); a double accumulator could
    * flip a near-zero plane sum to the other sign. */
  /** Boxed so a null vector element yields NULL (matching bandsEval's
    * guard) instead of a silently wrong bucket from unsafe getters. */
  def srpEvalFloat(v: ArrayData): java.lang.Integer = {
    val n = v.numElements()
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    var bucket = 0
    var j = 0
    while (j < TextHash.LshBits) {
      var sum = 0.0f
      var i = 0
      while (i < n) { sum += TextHash.planeSign(j, i) * v.getFloat(i); i += 1 }
      if (sum > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  def srpEvalDouble(v: ArrayData): java.lang.Integer = {
    val n = v.numElements()
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    var bucket = 0
    var j = 0
    while (j < TextHash.LshBits) {
      var sum = 0.0
      var i = 0
      while (i < n) { sum += TextHash.planeSign(j, i) * v.getDouble(i); i += 1 }
      if (sum > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  private def requireType(e: Expression, ok: Boolean, want: String)
      : TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} expects $want, got ${e.children.map(_.dataType).mkString(", ")}")

  // ---- expressions ----

  /** minhash_signature(text, n): 64-permutation MinHash over word
    * n-gram shingles — array<bigint>. */
  case class MinHashSignature(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this, child.dataType == StringType, "a string column")
    override protected def nullSafeEval(input: Any): Any =
      minhashEval(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashExprs.minhashEval($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** band_hashes(sig): NumBands FNV folds of RowsPerBand signature rows.
    * NULL for signatures of the wrong length. */
  case class BandHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this,
        child.dataType == ArrayType(LongType, containsNull = false) ||
          child.dataType == ArrayType(LongType, containsNull = true),
        "array<bigint> (a minhash_signature)")
    override protected def nullSafeEval(input: Any): Any =
      bandsEval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.TextHashExprs.bandsEval($c);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** simhash64(text): 64-bit SimHash of the word multiset. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this, child.dataType == StringType, "a string column")
    override protected def nullSafeEval(input: Any): Any =
      simhashEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashExprs.simhashEval($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** srp_bucket(embedding): sign-random-projection LSH bucket id over a
    * float or double vector. */
  case class SrpBucket(child: Expression) extends UnaryExpression {
    private def isFloatArr: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this, child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }, "array<float> or array<double>")
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      if (isFloatArr) srpEvalFloat(a) else srpEvalDouble(a)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (isFloatArr) "srpEvalFloat" else "srpEvalDouble"
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |java.lang.Integer ${ev.value}Boxed =
           |  graft.functions.TextHashExprs.$fn($c);
           |${ev.isNull} = (${ev.value}Boxed == null);
           |if (!${ev.isNull}) ${ev.value} = ${ev.value}Boxed.intValue();
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def srpTablesEvalFloat(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val n = v.numElements()
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    val arr = new Array[Float](n)
    k = 0
    while (k < n) { arr(k) = v.getFloat(k); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.srpBuckets(arr, tables, bits))
  }

  def srpTablesEvalDouble(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val n = v.numElements()
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    // double path accumulates in DOUBLE per table (mirrors srpEvalDouble)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        var sum = 0.0
        var i = 0
        while (i < n) {
          sum += TextHash.planeSign(t * bits + j, i) * v.getDouble(i); i += 1
        }
        if (sum > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def srpProbesEvalFloat(v: ArrayData, tables: Int, bits: Int,
      probes: Int): ArrayData = {
    val n = v.numElements()
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    val arr = new Array[Float](n)
    k = 0
    while (k < n) { arr(k) = v.getFloat(k); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.srpProbeBuckets(arr, tables, bits, probes))
  }

  def srpProbesEvalDouble(v: ArrayData, tables: Int, bits: Int,
      probes: Int): ArrayData = {
    val n = v.numElements()
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    // double path accumulates in DOUBLE per plane (mirrors
    // srpTablesEvalDouble); probe order by |margin| ascending
    val out = new Array[Int](tables * probes)
    val margin = new Array[Double](bits)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        var sum = 0.0
        var i = 0
        while (i < n) {
          sum += TextHash.planeSign(t * bits + j, i) * v.getDouble(i); i += 1
        }
        if (sum > 0) bucket |= (1 << j)
        margin(j) = math.abs(sum)
        j += 1
      }
      out(t * probes) = bucket
      val order = Array.range(0, bits).sortBy(margin(_))
      var p = 1
      while (p < probes) {
        out(t * probes + p) = bucket ^ (1 << order(p - 1))
        p += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** srp_probe_buckets(embedding, tables, bits, probes): the QUERY-side
    * multiprobe companion of [[SrpBuckets]] — tables × probes bucket
    * ids (element t*probes+p = table t's p-th probe; p=0 is exactly
    * SrpBuckets' id for that table, then single-plane flips in
    * ascending-|margin| order, the Lv et al. multiprobe sequence). The
    * corpus keeps one bucket per table; only the handful of broadcast
    * probe rows fan out, so recall rises with zero index growth. */
  case class SrpProbeBuckets(child: Expression, tables: Int, bits: Int,
      probes: Int) extends UnaryExpression {
    require(tables > 0 && bits > 0 && bits <= 30,
      s"srp_probe_buckets needs tables>0 and 0<bits<=30; got ($tables, $bits)")
    require(probes > 0 && probes <= bits + 1,
      s"srp_probe_buckets needs 0<probes<=bits+1; got $probes for $bits bits")
    private def isFloatArr: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this, child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }, "array<float> or array<double>")
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      if (isFloatArr) srpProbesEvalFloat(a, tables, bits, probes)
      else srpProbesEvalDouble(a, tables, bits, probes)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (isFloatArr) "srpProbesEvalFloat" else "srpProbesEvalDouble"
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.TextHashExprs.$fn($c, $tables, $bits, $probes);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** srp_buckets(embedding, tables, bits): per-table
    * sign-random-projection bucket ids — the multi-table LSH recall
    * lever (a neighbor is a candidate when it collides in ANY table:
    * recall 1-(1-p^bits)^tables vs one table's p^bits). */
  case class SrpBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {
    require(tables > 0 && bits > 0 && bits <= 30,
      s"srp_buckets needs tables>0 and 0<bits<=30; got ($tables, $bits)")
    private def isFloatArr: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(this, child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }, "array<float> or array<double>")
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      if (isFloatArr) srpTablesEvalFloat(a, tables, bits)
      else srpTablesEvalDouble(a, tables, bits)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (isFloatArr) "srpTablesEvalFloat" else "srpTablesEvalDouble"
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.TextHashExprs.$fn($c, $tables, $bits);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column-API entry points ----

  def minhash_signature(text: Column, n: Int): Column =
    column(MinHashSignature(expression(text), n))
  def band_hashes(sig: Column): Column =
    column(BandHashes(expression(sig)))
  def simhash64(text: Column): Column =
    column(SimHash64(expression(text)))
  def srp_bucket(embedding: Column): Column =
    column(SrpBucket(expression(embedding)))
  def srp_buckets(embedding: Column, tables: Int = TextHash.SrpTables,
      bits: Int = TextHash.SrpTableBits): Column =
    column(SrpBuckets(expression(embedding), tables, bits))
  def srp_probe_buckets(embedding: Column,
      tables: Int = TextHash.SrpTables,
      bits: Int = TextHash.SrpTableBits,
      probes: Int = TextHash.SrpProbes): Column =
    column(SrpProbeBuckets(expression(embedding), tables, bits, probes))
}
