package graft

/** Every declared query runs on sf0.001 without error; queries with an
  * oracle must be non-empty wherever the fixture data guarantees rows.
  * (Value-level correctness is the driver's DuckDB gate — mirrored
  * locally by tools/check_oracle.py.)
  */
class QuerySurfaceSpec extends TestBase {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // sketch/hash-family operators DuckDB cannot replicate:
    assert(noOracle == Set("q13_approx_distinct", "q41_minhash_lsh",
      "q42_simhash", "q46_ann_lsh", "q46b_ann_ivf", "q54_source_sketch"))
  }

  test("oracle keys are a subset of query keys") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
