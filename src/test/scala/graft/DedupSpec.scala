package graft

import graft.operators.DedupQueries

/** Cross-validates the approximate dedup operators against the exact
  * n-gram Jaccard ground truth (the fixture generator plants ~25
  * near-dup pairs with shingle jaccard >= 0.9).
  */
class DedupSpec extends TestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] =
    pairs(DedupQueries.q43_ngram_jaccard(spark, sfDir))

  test("ground truth near-dup pairs exist in the fixture") {
    assert(exact.nonEmpty)
  }

  test("LSH-verified near-dup equals the exact all-pairs ground truth") {
    // q43 (exact sum(df²) self-join) is spec-only; q43b must reproduce
    // it row-for-row — same pairs AND same jaccard values
    val a = DedupQueries.q43_ngram_jaccard(spark, sfDir).collect().toSeq
    val b = DedupQueries.q43b_lsh_verified(spark, sfDir).collect().toSeq
    assert(a == b, s"exact=${a.size} lsh=${b.size}")
  }

  test("prefix-filtered join equals the exact all-pairs ground truth") {
    // q104's recall is 1 BY CONSTRUCTION (prefix lemma), not by the
    // rarity of band non-collisions — same rows, same jaccard values
    val a = DedupQueries.q43_ngram_jaccard(spark, sfDir).collect().toSeq
    val b = DedupQueries.q104_jaccard_join(spark, sfDir).collect().toSeq
    assert(a == b, s"exact=${a.size} prefix=${b.size}")
  }

  test("minhash LSH finds every exact near-dup pair") {
    val approx = pairs(DedupQueries.q41_minhash_lsh(spark, sfDir))
    assert(exact.subsetOf(approx),
      s"missed: ${exact -- approx}")
  }

  test("simhash candidates cover the exact near-dup pairs") {
    val sh = pairs(DedupQueries.q42_simhash(spark, sfDir))
    val covered = exact.intersect(sh)
    // simhash is word-multiset based; near-dups differ slightly, so
    // expect high (not necessarily perfect) coverage
    assert(covered.size * 2 >= exact.size,
      s"covered only ${covered.size}/${exact.size}")
  }

  // ---- q142b: cell-scoped semantic dedup (SURVEY row 112's scale
  // path). The dominated-set DECISION must equal the exact all-pairs
  // decision while the candidate-pair count stays far under N²/2 —
  // recall by cell-capture, precision by exact cosines. ----

  /** Driver-side exact dominated set: ids with any lower-id vector at
    * cosine >= tau (the q142 rule, brute force). */
  private def bruteDominated(
      df: org.apache.spark.sql.DataFrame, tau: Double): Set[Long] = {
    val vecs = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    (for {
      j <- vecs.indices
      i <- 0 until j
      if cos(vecs(i)._2, vecs(j)._2) >= tau
    } yield vecs(j)._1).toSet
  }

  test("cell-scoped semantic dedup: exact decision through a persisted " +
      "index model at a fraction of the all-pairs candidates") {
    import graft.operators.AnnIndex
    import graft.table.GraftTable
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("dedup_cells").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    val n = e.count()
    // the composition the operator documents: the frozen model comes
    // from a REAL persisted AnnIndex root (row 107), not a private
    // retrain — semantic dedup rides the index the corpus already has
    val corpus = GraftTable(spark, s"$root/corpus_data",
      s"$root/corpus_man", "vec_id")
    corpus.create(e, 4)
    AnnIndex.build(spark, corpus, 1, root)
    val cents = AnnIndex.loadModel(spark, root)
    val tau = 0.85
    val got = DedupQueries.semanticDedupDominated(cents, e, tau)
      .collect().map(_.getLong(0)).toSet
    val want = bruteDominated(e, tau)
    // the clustered regime (within-cluster cosine ~0.9) is exactly
    // where SemDeDup operates: cells capture every tau-close pair
    assert(want.size > 100, s"fixture lost its near-dup mass: ${want.size}")
    assert(got == want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // the scale claim: candidate pairs ≪ N²/2 (the all-pairs plan)
    val cand = DedupQueries.semanticCellPairs(cents, e, 2)
      .select("aid", "bid").distinct().count()
    val allPairs = n * (n - 1) / 2
    assert(cand.toDouble / allPairs < 0.35,
      s"candidates $cand of $allPairs — the cell scope is not cutting " +
        "the quadratic")
    e.unpersist()
  }

  test("cell-scoped semantic dedup matches brute force on the parquet " +
      "fixture (planted duplicates)") {
    val corpus = DedupQueries.q142bCorpus(spark, sfDir).cache()
    val n = corpus.count()
    val cents = graft.operators.SketchQueries.kmeansCentroids(spark,
      corpus.select("vec_id", "embedding"), 16, 3)
    val tau = 0.85
    val got = DedupQueries.semanticDedupDominated(cents, corpus, tau)
      .collect().map(_.getLong(0)).toSet
    val want = bruteDominated(corpus, tau)
    // exactly the planted copies dominate (the fixture has no natural
    // pairs above the SemDeDup threshold) — and the plan finds them all
    assert(want == (0L until 50L).map(_ + 1000000L).toSet)
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
    val cand = DedupQueries.semanticCellPairs(cents, corpus, 2)
      .select("aid", "bid").distinct().count()
    assert(cand < n * (n - 1) / 2 / 3,
      s"candidates $cand — no quadratic cut on the near-random fixture")
    corpus.unpersist()
  }

  test("the cluster-count knob K cuts the candidate quadratic deeper; " +
      "the decision stays exact") {
    // the scale claim made quantitative: K is the knob SemDeDup grows
    // with the corpus — doubling the cells roughly halves sum n_c²
    // while recall on tau-close pairs is unaffected (duplicates share
    // cells under ANY frozen model)
    val corpus = DedupQueries.q142bCorpus(spark, sfDir).cache()
    val n = corpus.count()
    val want = (0L until 50L).map(_ + 1000000L).toSet
    val fracs = Seq(16, 64).map { k =>
      val cents = graft.operators.SketchQueries.kmeansCentroids(spark,
        corpus.select("vec_id", "embedding"), k, 3)
      val got = DedupQueries.semanticDedupDominated(cents, corpus, 0.85)
        .collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"K=$k missed=${want -- got} extra=${got -- want}")
      val cand = DedupQueries.semanticCellPairs(cents, corpus, 2)
        .select("aid", "bid").distinct().count()
      cand.toDouble / (n * (n - 1) / 2)
    }
    info(f"candidate fraction of N²/2: K=16 ${fracs.head}%.3f, " +
      f"K=64 ${fracs(1)}%.3f")
    assert(fracs(1) < fracs.head / 2,
      s"K=64 must cut at least 2x deeper than K=16: $fracs")
    corpus.unpersist()
  }

  test("exact dedup groups every document") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val df = DedupQueries.q40_dedup_exact(spark, sfDir)
    import org.apache.spark.sql.functions._
    val summed = df.agg(sum("copies")).collect()(0).getLong(0)
    assert(summed == total)
  }
}
