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

  // ---- 46b. IVF (inverted-file) approximate nearest neighbors ----
  // Centroids here are a deterministic sample (first 16 vectors); a
  // production build would k-means them — the query shape is identical.
  val q46b_ann_ivf: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

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
