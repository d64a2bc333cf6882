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
    // measured 0.88 on the fixture (4 tables × 4 bits, 3 multiprobes —
    // deterministic hash family + data); pinned with headroom only for
    // K-tie ordering, not for chance. NOTE the fixture is the LSH
    // worst case: near-random vectors (within-label cosine ~0.02), so
    // recall/candidate-fraction lift is bounded ~1.5× — clustered
    // real-world embeddings fare far better at the same settings.
    assert(recall >= 0.80, s"recall $recall")
    // the COST side of the trade must be pinned too, or recall could be
    // bought by de-facto brute force: candidates examined per query
    // must stay a bounded fraction of the corpus (measured 0.57)
    val nQueries = 10L
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val cands = SimilarityQueries.annCandidates(spark, sfDir).count()
    val frac = cands.toDouble / (nQueries * (corpus - 1))
    info(s"candidates/query: ${cands / nQueries} of ${corpus - 1} " +
      s"(fraction $frac)")
    assert(frac <= 0.62, s"candidate fraction $frac — de-facto brute force")
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

  test("clustered embeddings (the real regime): SRP-LSH recall/cost lift is real") {
    // The parquet fixture is the LSH worst case (near-random vectors,
    // lift bounded ~1.5x — gated above). This drives the SAME plan over
    // a deterministic mixture-of-Gaussians corpus (within-cluster
    // cosine ~0.9 — the regime real embedding models produce) and pins
    // BOTH operating points:
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val exact = TestBase.exactTopK(e, 10, 5)
      assert(exact.size == 50)
      // the fixture really is clustered: true top-5 neighbors are
      // same-cluster (cluster = vec_id % 10)
      val sameCluster = exact.count { case (q, n) => q % 10 == n % 10 }
      assert(sameCluster >= 48, s"fixture not clustered: $sameCluster/50")
      def measure(t: Int, b: Int, p: Int): (Double, Double) = {
        val cands = SimilarityQueries.annCandidatesOf(e, t, b, p)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact.intersect(cands).size.toDouble / exact.size,
          cands.size.toDouble / (10.0 * 499))
      }
      // 1) the PRODUCTION worst-case settings (4 tables x 4 bits x 3
      // probes): recall jumps 0.88 -> 1.0 on clustered data (the wide
      // buckets stay costly — that knob exists for the worst case)
      val (prodRecall, prodFrac) = measure(4, 4, 3)
      info(s"clustered SRP prod(4,4,3): recall=$prodRecall frac=$prodFrac")
      assert(prodRecall >= 0.95,
        s"production settings must saturate recall on clustered data: $prodRecall")
      // 2) the clustered-regime settings (8 tables x 12 bits x 3
      // probes — narrower buckets, same query-side multiprobe):
      // measured recall 0.88 at candidate fraction 0.083, a ~10x
      // recall/cost lift where the near-random fixture caps at ~1.5x.
      // Both sides gated, same contract as the worst-case gates above.
      val (cluRecall, cluFrac) = measure(8, 12, 3)
      info(s"clustered SRP tuned(8,12,3): recall=$cluRecall frac=$cluFrac " +
        s"lift=${cluRecall / cluFrac}")
      assert(cluRecall >= 0.80, s"clustered recall $cluRecall")
      assert(cluFrac <= 0.12, s"clustered candidate fraction $cluFrac")
      assert(cluRecall / cluFrac >= 5.0,
        s"clustered lift ${cluRecall / cluFrac} — the data-dependent " +
          "regime must beat the worst case's ~1.5x decisively")
    } finally { e.unpersist(); () }
  }
}
