package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSketch, VectorExprs}

/** Config-only deployment of the engine's native function surface:
  *
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  * }}}
  *
  * injects the codegen'd vector expressions and the MinHash sketch
  * aggregate into every session built from that config — no code needed
  * on the user side, `SELECT cosine_similarity(a.e, b.e)` just works.
  * (The per-session registration path, `VectorExprs.register`, stays for
  * programmatic use; this is the cluster-wide story, the Spark-idiomatic
  * equivalent of the reference's "drop the jar + set fs.*.impl" flow.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${es.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine of two float/double vectors"),
      (es: Seq[Expression]) => {
        arity("cosine_similarity", 2)(es)
        VectorExprs.CosineSimilarity(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - dot product of two float/double vectors"),
      (es: Seq[Expression]) => {
        arity("dot_product", 2)(es)
        VectorExprs.DotProduct(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sketch"),
      info("minhash_sketch",
        "minhash_sketch(shingle) - 64-permutation MinHash signature aggregate"),
      (es: Seq[Expression]) => {
        arity("minhash_sketch", 1)(es)
        MinHashSketch(es.head)
      }))
  }
}
