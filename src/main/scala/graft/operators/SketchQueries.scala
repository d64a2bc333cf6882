package graft.operators

import graft.Tables
import graft.functions.Det.dround
import graft.functions.MinHashAgg.minhash_sketch
import graft.functions.VectorExprs.cosine_similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-style aggregation + IVF similarity: the two remaining
  * scale-path shapes.
  *
  *  - q54: per-GROUP MinHash sketches via the native
  *    TypedImperativeAggregate (map-side partial agg, 512-byte buffer
  *    per group) — estimates Jaccard overlap between whole sources
  *    without ever materializing their shingle sets side by side.
  *  - q46b: IVF-style ANN — vectors are assigned to their nearest
  *    centroid once (the inverted file); queries probe the 2 nearest
  *    cells only. The cluster id is the partition key at scale.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- 54. Per-source MinHash sketch + pairwise overlap estimate ----
  // No DuckDB oracle (hash-permutation family); SketchSpec cross-checks
  // the estimate against the exact per-source shingle Jaccard.
  val q54_source_sketch: Q = (s, dir) => {
    val shingled = t(s, dir, "documents")
      .select(col("source"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("source"), explode(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
        .as("shingle"))
    val sketches = shingled.groupBy("source")
      .agg(minhash_sketch(col("shingle")).as("sig"))
    val a = sketches.select(col("source").as("src_a"), col("sig").as("sig_a"))
    val b = sketches.select(col("source").as("src_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("est_jaccard", dround(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          p => p)).cast("double") / lit(graft.functions.TextHash.NumPerms), 4))
      .select(col("src_a"), col("src_b"), col("est_jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Spherical k-means (Lloyd) for the IVF coarse quantizer: assign each
    * vector to its max-cosine centroid, recompute cell means, normalize.
    * Seeds are deterministic (the first k vectors). Centroids are model
    * state — k×dim doubles — so the per-round collect is legitimate
    * driver traffic (the same k rows every cluster job must broadcast),
    * not a distributed-operator smell; each round is one broadcast join
    * + one shuffle of k×dim partial sums.
    */
  private[operators] def kmeansCentroids(s: SparkSession, e: DataFrame,
      k: Int, iters: Int): DataFrame = {
    import s.implicits._
    // scanned once per Lloyd round + once for seeds: cache the cast
    val vd = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[(Int, Seq[Double])] = vd.filter(col("vec_id") < k)
      .orderBy("vec_id").collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    // degenerate input (no vectors under the seed ids): no centroids, no
    // rounds — the caller's joins simply produce no assignments
    if (cents.isEmpty) { vd.unpersist(blocking = false); return cents.toDF("cid", "ce") }
    // the dimension comes free with the seed collect — no separate job
    val dim = cents.head._2.length
    for (_ <- 1 to iters) {
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
      val means = vd.join(broadcast(cents.toDF("cid", "ce")))
        .withColumn("sim", cosine_similarity(col("v"), col("ce")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("cid")
        .agg(array((0 until dim).map(i => avg(col("v").getItem(i))): _*).as("m"))
      val updated = means.collect().map { r =>
        val m = r.getSeq[Double](1)
        val norm = math.sqrt(m.map(x => x * x).sum)
        (r.getInt(0), if (norm == 0.0) m else m.map(_ / norm))
      }.toMap
      // empty cells keep their previous centroid
      cents = cents.map { case (cid, ce) => (cid, updated.getOrElse(cid, ce)) }
    }
    vd.unpersist(blocking = false)
    cents.toDF("cid", "ce")
  }

  // ---- 46b. IVF (inverted-file) approximate nearest neighbors ----
  // The coarse quantizer is a real spherical k-means (3 Lloyd rounds,
  // deterministic seeds) — cells reflect the data distribution, not an
  // arbitrary sample.
  val q46b_ann_ivf: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val centroids = kmeansCentroids(s, e, k = 16, iters = 3)

    // invert: each corpus vector -> nearest centroid cell
    val assignW = Window.partitionBy("vec_id")
      .orderBy(col("cdist").desc, col("cid"))
    val assigned = e.join(broadcast(centroids))
      .withColumn("cdist", cosine_similarity(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("cid").as("cell"))

    // queries probe their 2 nearest cells
    val probeW = Window.partitionBy("vec_id")
      .orderBy(col("cdist").desc, col("cid"))
    val probes = e.filter(col("vec_id") < 10)
      .join(broadcast(centroids))
      .withColumn("cdist", cosine_similarity(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("cid").as("cell"))

    val rankW = Window.partitionBy("qid")
      .orderBy(col("sim_raw").desc, col("nid"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim_raw", cosine_similarity(col("qe"), col("ne")))
      .withColumn("rn", row_number().over(rankW).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("nid"),
        dround(col("sim_raw"), 4).as("sim"))
      .orderBy("qid", "rn")
  }

  val queries: Map[String, Q] = Map(
    "q54_source_sketch" -> q54_source_sketch,
    "q46b_ann_ivf" -> q46b_ann_ivf)

  // both are sketch/ANN families DuckDB cannot replicate: rows-only
  // driver checks; value-level validation lives in SketchSpec.
  val oracles: Map[String, String] = Map.empty
}
