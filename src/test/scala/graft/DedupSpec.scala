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

  test("exact dedup groups every document") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val df = DedupQueries.q40_dedup_exact(spark, sfDir)
    import org.apache.spark.sql.functions._
    val summed = df.agg(sum("copies")).collect()(0).getLong(0)
    assert(summed == total)
  }
}
