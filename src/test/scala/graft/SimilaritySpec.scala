package graft

import graft.operators.SimilarityQueries

/** Recall gate for the SRP-LSH approximate ANN (q46) against the exact
  * brute-force top-k (q45) — q46 is declared bench-only (the
  * hyperplane family is not DuckDB-expressible), so THIS spec is its
  * correctness gate: if the banding silently broke (wrong bucket ids,
  * empty joins, a seed change), recall collapses and this fails. */
class SimilaritySpec extends TestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SRP-LSH ANN: deterministic, self-consistent, recall above chance vs exact top-k") {
    val exactDf = SimilarityQueries.q45_knn_brute(spark, sfDir)
    val annDf = SimilarityQueries.q46_ann_lsh(spark, sfDir)
    val exact = pairs(exactDf)
    val ann = pairs(annDf)
    assert(exact.nonEmpty && ann.nonEmpty)
    val recall = exact.intersect(ann).size.toDouble / exact.size
    info(s"SRP-LSH recall vs exact top-k: $recall " +
      s"(${exact.intersect(ann).size}/${exact.size})")
    // measured 0.64 on the fixture (deterministic hash family + data);
    // pinned with headroom only for K-tie ordering, not for chance
    assert(recall >= 0.50, s"recall $recall")
    // every reported similarity is the TRUE cosine for that pair: the
    // approximation is in candidate pruning only, never in the score
    val exactSims = exactDf.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    annDf.collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      exactSims.get(k).foreach(s => assert(r.getDouble(3) == s,
        s"pair $k: ann sim ${r.getDouble(3)} vs exact $s"))
    }
    // the hyperplane family is seeded: a re-run is bit-identical
    assert(pairs(SimilarityQueries.q46_ann_lsh(spark, sfDir)) == ann,
      "SRP bucketing must be deterministic")
  }
}
