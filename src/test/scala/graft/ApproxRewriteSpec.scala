package graft

import org.apache.spark.sql.SparkSession

/** The opt-in COUNT(DISTINCT) -> HLL optimizer rule: inert by default,
  * a one-conf switch to sketch-based cardinality when enabled, exact
  * names/arity preserved either way. */
class ApproxRewriteSpec extends TestBase {

  private def withExtSession[A](body: SparkSession => A): A = {
    val orig = spark // keep the shared session alive for other suites
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      body(s2)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("flag off (default): COUNT(DISTINCT) stays exact, no HLL in the plan") {
    withExtSession { s =>
      val df = Tables.load(s, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.countDistinct("l_partkey")
          .as("nd"))
      assert(!df.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      val exact = Tables.load(s, sfDir, "lineitem")
        .select("l_returnflag", "l_partkey").distinct().collect()
        .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
      df.collect().foreach { r =>
        assert(r.getLong(1) == exact(r.getString(0)))
      }
    }
  }

  test("flag on: the same query plans an HLL sketch and lands within rsd bounds") {
    withExtSession { s =>
      s.conf.set("spark.graft.approxDistinct.enabled", "true")
      try {
        val df = Tables.load(s, sfDir, "lineitem")
          .groupBy("l_returnflag")
          .agg(org.apache.spark.sql.functions.countDistinct("l_partkey")
            .as("nd"))
        val plan = df.queryExecution.optimizedPlan.toString
        assert(plan.contains("approx_count_distinct"),
          s"rewrite did not fire:\n$plan")
        // output name + schema are untouched by the rewrite
        assert(df.schema.fieldNames.toSeq == Seq("l_returnflag", "nd"))
        val exact = Tables.load(s, sfDir, "lineitem")
          .select("l_returnflag", "l_partkey").distinct().collect()
          .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
        df.collect().foreach { r =>
          val (est, tru) = (r.getLong(1), exact(r.getString(0)))
          // rsd 0.02 at 99.9%+ confidence: 5 sigma ≈ 10%
          assert(math.abs(est - tru) <= math.max(4, 0.10 * tru),
            s"${r.getString(0)}: $est vs $tru")
        }
      } finally s.conf.set("spark.graft.approxDistinct.enabled", "false")
    }
  }

  test("multi-argument and non-COUNT distinct aggregates keep exact semantics") {
    withExtSession { s =>
      s.conf.set("spark.graft.approxDistinct.enabled", "true")
      try {
        import org.apache.spark.sql.functions._
        val li = Tables.load(s, sfDir, "lineitem")
        // COUNT(DISTINCT a, b): multi-arg stays exact
        val multi = li.agg(countDistinct(col("l_partkey"), col("l_suppkey"))
          .as("nd"))
        assert(!multi.queryExecution.optimizedPlan.toString
          .contains("approx_count_distinct"))
        val exactPairs = li.select("l_partkey", "l_suppkey")
          .distinct().count()
        assert(multi.collect()(0).getLong(0) == exactPairs)
        // SUM(DISTINCT x) stays exact
        val sd = li.agg(sum_distinct(col("l_linenumber")).as("sd"))
        assert(!sd.queryExecution.optimizedPlan.toString
          .contains("approx_count_distinct"))
        val exactSum = li.select("l_linenumber").distinct()
          .collect().map(_.getInt(0).toLong).sum
        assert(sd.collect()(0).getLong(0) == exactSum)
      } finally s.conf.set("spark.graft.approxDistinct.enabled", "false")
    }
  }
}
