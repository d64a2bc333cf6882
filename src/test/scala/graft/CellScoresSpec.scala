package graft

import graft.functions.VectorExprs.cosine_similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exactness gate for the native IVF scoring expression
  * ([[graft.functions.IvfExprs.CellScores]], r21): it replaced the
  * interpreted-HOF spelling
  * `sort_array(transform(typedlit(cents), c => struct(cosine, -cid)),
  * asc=false)` in every IVF operator (k-means assign, index encode,
  * probe fan-out, cell-scoped semantic dedup), whose RESULTS are
  * declared — so the two must agree to the last bit, including the
  * float-to-double widening the old elementwise cast performed, NULL
  * sims (zero norms, ragged vectors) and the (sim desc, ncid desc)
  * tie order. */
class CellScoresSpec extends TestBase {

  /** The pre-r21 spelling, verbatim. */
  private def oldCellScores(cents: Seq[(Int, Seq[Double])],
      v: Column): Column =
    sort_array(transform(typedlit(cents), c =>
      struct(cosine_similarity(v, c.getField("_2")).as("sim"),
        (c.getField("_1") * -1).as("ncid"))), asc = false)

  private def dv(c: Column): Column = transform(c, x => x.cast("double"))

  private def diff(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Seq[Double])], useCast: Boolean): Long = {
    val vNew = col("embedding")
    val vOld = if (useCast) dv(col("embedding")) else col("embedding")
    df.select(
        graft.functions.IvfExprs.cell_scores(vNew, cents).as("a"),
        oldCellScores(cents, vOld).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
  }

  test("native == HOF spelling on the parquet fixture (float arrays, " +
      "old elementwise cast path)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.operators.SketchQueries
      .kmeansCentroids(spark, e.select("vec_id", "embedding"), 16, 3)
    assert(diff(e, cents, useCast = true) == 0L)
  }

  test("native == HOF spelling on the clustered fixture + edge cases " +
      "(zero vector, zero centroid, ragged vector, null)") {
    val s = spark
    import s.implicits._
    val base = TestBase.clusteredEmbeddings(s)
    val cents = graft.operators.SketchQueries
      .kmeansCentroids(s, base, 8, 2)
    assert(diff(base, cents, useCast = true) == 0L)
    // edge rows: all-zero vector (null sims), ragged vector (null
    // sims), a null vector (null result)
    val dim = 64
    val edge = Seq(
      (9001L, Some(Seq.fill(dim)(0.0f))),
      (9002L, Some(Seq.fill(dim - 3)(0.5f))),
      (9003L, None))
      .toDF("vec_id", "embedding")
    assert(diff(edge, cents, useCast = true) == 0L)
    // zero centroid: every sim against it is NULL on both paths
    val withZero = cents :+ (99, Seq.fill(dim)(0.0))
    assert(diff(base, withZero, useCast = true) == 0L)
    assert(diff(edge, withZero, useCast = true) == 0L)
  }

  test("native == HOF spelling on double arrays (no cast)") {
    val s = spark
    import s.implicits._
    val base = TestBase.clusteredEmbeddings(s)
      .select(col("vec_id"), dv(col("embedding")).as("embedding"))
    val cents = graft.operators.SketchQueries.kmeansCentroids(s,
      TestBase.clusteredEmbeddings(s), 8, 2)
    assert(diff(base, cents, useCast = false) == 0L)
  }

  test("tie order pins: equal sims order by cid ascending (ncid desc)") {
    val s = spark
    import s.implicits._
    // two identical centroids with different cids: sims tie exactly
    val cents = Seq((3, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0)),
      (2, Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = df.select(graft.functions.IvfExprs
        .cell_scores(col("embedding"), cents).as("cs"))
      .select(transform(col("cs"), x => x.getField("ncid") * -1))
      .head.getSeq[Int](0)
    assert(got == Seq(1, 3, 2)) // tied pair: lower cid first
    val old = df.select(oldCellScores(cents, dv(col("embedding"))).as("cs"))
      .select(transform(col("cs"), x => x.getField("ncid") * -1))
      .head.getSeq[Int](0)
    assert(old == got)
  }
}
