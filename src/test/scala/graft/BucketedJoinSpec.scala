package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located fact-fact join technique for 100 TB.
  * Both tables bucketed+sorted on the join key produce a sort-merge
  * join with ZERO Exchange operators — data was shuffled once at write
  * time, every subsequent join is shuffle-free. This spec proves the
  * engine's tables can be laid out that way and that Catalyst exploits
  * it (plan has no Exchange; results match the unbucketed join).
  */
class BucketedJoinSpec extends TestBase {

  test("bucketed+sorted tables join without any exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      Tables.load(spark, sfDir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.load(spark, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"no SMJ in plan:\n$plan")
      // the JOIN itself must be exchange-free: no shuffle before the
      // SortMergeJoin (the single Exchange allowed is the one feeding
      // the final tiny groupBy)
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // same answer as the plain join
      val expected = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
      val got = joined.orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }
}
