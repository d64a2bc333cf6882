package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (matches the driver's
  * Verify/Bench session config: UTC, small shuffle partition count,
  * and — like those surfaces and the production deployment — the
  * GraftExtensions installed, so SQL DML (UPDATE/MERGE) plans; suites
  * that specifically test the extensions-FREE fallback build their own
  * bare session). */
trait TestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = TestBase.session

  val sfDir = "/root/testdata/sf0.001"
}

object TestBase {

  /** Deterministic mixture-of-Gaussians embedding corpus — the regime
    * real-world embedding models produce (tight within-cluster cosine),
    * as opposed to the near-random parquet fixture (the LSH worst
    * case). 10 unit-norm centers, 50 points each at per-dim noise
    * sigma 0.06 (noise norm ~0.5 vs unit centers -> within-cluster
    * cosine ~0.9, cross-cluster ~0), cluster = vec_id % 10 so the probe
    * set (vec_id < 10) covers every cluster. Seeded: bit-identical
    * across runs. */
  def clusteredEmbeddings(spark: SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(42)
    val dim = 64
    val nClusters = 10
    val n = 500
    def normalize(v: Array[Double]): Array[Double] = {
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
    val centers = Array.fill(nClusters)(
      normalize(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.06).toFloat).toSeq)
    }
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Driver-side exact top-k cosine ground truth over a (vec_id,
    * embedding) corpus for the probe set vec_id < nQueries. */
  def exactTopK(df: org.apache.spark.sql.DataFrame, nQueries: Int,
      k: Int): Set[(Long, Long)] = {
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.filter(_._1 < nQueries).flatMap { case (qid, q) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, v) => (nid, cos(q, v)) }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(k).map { case (nid, _) => (qid, nid) }
    }.toSet
  }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
