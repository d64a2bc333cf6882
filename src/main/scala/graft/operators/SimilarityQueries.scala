package graft.operators

import graft.Tables
import graft.functions.Det.dround
import graft.functions.TextHash
import graft.functions.VectorExprs.cosine_similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY.md §2B row 31 +
  * builder-prompt extension list).
  *
  * Scale design: the query set is broadcast and the corpus is scanned
  * once (the 100 TB-correct shape: queries are small, the corpus is not).
  * q45 is the exact brute-force baseline (oracle-checked); q46 is the
  * bucketed approximate path — sign-random-projection LSH prunes the
  * corpus to same-bucket candidates so the per-query work drops from
  * O(corpus) to O(bucket), the structure you'd use with billions of
  * vectors (bucket id becomes the partition/cluster key).
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val K = 5

  // ---- 45. Exact top-k cosine (brute force, oracle-checked) ----
  val q45_knn_brute: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val w = Window.partitionBy("qid")
      .orderBy(col("sim_raw").desc, col("nid"))
    corpus.join(broadcast(queries), col("qid") =!= col("nid"))
      .withColumn("sim_raw", cosine_similarity(col("qe"), col("ne")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("qid"), col("rn"), col("nid"), dround(col("sim_raw"), 4).as("sim"))
      .orderBy("qid", "rn")
  }

  val q45_knn_brute_sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |           FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne
       |      FROM embeddings),
       |s AS (
       |  SELECT qid, nid,
       |    list_dot_product(qe, ne) /
       |    (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))) AS sim_raw
       |  FROM q JOIN c ON qid <> nid
       |), r AS (
       |  SELECT qid, nid, sim_raw,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, nid) AS rn
       |  FROM s
       |)
       |SELECT qid, rn, nid, round(sim_raw, 4) + 0 AS sim
       |FROM r WHERE rn <= $K ORDER BY qid, rn""".stripMargin

  // ---- 46. Approximate top-k via multi-table multiprobe SRP-LSH ----
  // Bench-only (the hyperplane family is not DuckDB-expressible): the
  // driver records rows>0; SimilaritySpec gates recall AND candidate
  // budget vs q45.
  // 4 independent tables of 4 hyperplanes each; the QUERY side
  // additionally probes each table's nearest alternative buckets
  // (lowest-|margin| single-plane flips — Lv et al. multiprobe), so a
  // true neighbor is a candidate when it lands in ANY probed bucket of
  // ANY table. The corpus index stays one bucket per table (zero index
  // growth — the scale lever: at billions of vectors only the handful
  // of broadcast probe rows fan out), per-query work stays O(Σ probed
  // bucket), and the cosine runs ONCE per deduped candidate pair. The
  // scores are EXACT; only candidate pruning is approximate.

  /** The deduped (qid, nid, qe, ne) candidate pairs — shared by q46 and
    * its spec's candidate-budget gate, so the cost side of the
    * recall/cost trade is pinned against the same plan. */
  private[graft] def annCandidates(s: SparkSession, dir: String): DataFrame =
    annCandidatesOf(t(s, dir, "embeddings"))

  /** [[annCandidates]] over an explicit (vec_id, embedding) corpus —
    * the spec's clustered-fixture gates drive the SAME plan the query
    * runs, just over a different distribution. The (tables, bits,
    * probes) knobs default to the production constants; a CLUSTERED
    * corpus wants narrower buckets and less probing than the
    * near-random worst case (the spec pins both operating points). */
  private[graft] def annCandidatesOf(e: DataFrame,
      tables: Int = graft.functions.TextHash.SrpTables,
      bits: Int = graft.functions.TextHash.SrpTableBits,
      probes: Int = graft.functions.TextHash.SrpProbes): DataFrame = {
    import graft.functions.TextHashExprs.{srp_buckets, srp_probe_buckets}
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        posexplode(srp_probe_buckets(col("embedding"), tables, bits, probes))
          .as(Seq("pidx", "bucket")))
      .withColumn("tbl", (col("pidx") / lit(probes)).cast("int"))
      .drop("pidx")
    val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("ne"),
      posexplode(srp_buckets(col("embedding"), tables, bits))
        .as(Seq("tbl", "bucket")))
    corpus.join(broadcast(queries), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      // dedup BEFORE scoring: a pair colliding in several tables/probes
      // must pay the full-embedding cosine once, not once per collision
      .dropDuplicates("qid", "nid")
      .select("qid", "nid", "qe", "ne")
  }

  val q46_ann_lsh: Q = (s, dir) => {
    val w = Window.partitionBy("qid")
      .orderBy(col("sim_raw").desc, col("nid"))
    annCandidates(s, dir)
      .withColumn("sim_raw", cosine_similarity(col("qe"), col("ne")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("qid"), col("rn"), col("nid"),
        dround(col("sim_raw"), 4).as("sim"))
      .orderBy("qid", "rn")
  }

  val queries: Map[String, Q] = Map(
    "q45_knn_brute" -> q45_knn_brute,
    "q46_ann_lsh" -> q46_ann_lsh)

  val oracles: Map[String, String] = Map(
    "q45_knn_brute" -> q45_knn_brute_sql)
}
