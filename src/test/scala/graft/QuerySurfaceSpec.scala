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
      "q42_simhash", "q46_ann_lsh", "q46b_ann_ivf", "q46c_ann_ivfpq",
      "q46d_ann_indexed", "q46e_ann_pq_indexed", "q46f_ann_srp_indexed",
      "q54_source_sketch", "q93_kll_quantiles"))
  }

  test("oracle keys are a subset of query keys") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("q13 HLL estimates land within the sketch's error bounds") {
    import org.apache.spark.sql.functions._
    val est = operators.RelationalQueries.q13_approx_distinct(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(est.keySet == exact.keySet)
    // approx_count_distinct's default rsd is 5%; allow 4x slack
    exact.foreach { case (k, (p, o)) =>
      val (ep, eo) = est(k)
      assert(math.abs(ep - p) <= math.max(4, 0.20 * p), s"$k parts: $ep vs $p")
      assert(math.abs(eo - o) <= math.max(4, 0.20 * o), s"$k orders: $eo vs $o")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
