package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BinnedRangeJoinRewrite: with the bin width unset the keyless range
  * join is Spark's nested-loop fallback; with it set, the SAME query
  * must plan a bin equi-join and return bit-identical rows.
  */
class RangeJoinRewriteSpec extends TestBase {

  private def withExtSession[A](body: SparkSession => A): A = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      body(s2)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  /** A keyless point-in-range join: every 97th event defines a ±10 min
    * window; count ALL events (any user — no equi key) inside each. */
  private def rangeQuery(s: SparkSession): DataFrame = {
    val ev = Tables.load(s, sfDir, "events")
    val iv = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("iv_id"),
        (unix_millis(col("ts")) - 600000L).as("lo"),
        (unix_millis(col("ts")) + 600000L).as("hi"))
    val pts = ev.select(unix_millis(col("ts")).as("pt"), col("value"))
    iv.join(pts, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .groupBy("iv_id")
      .agg(count(lit(1)).as("n"),
        graft.functions.Det.dround(sum("value"), 2).as("sv"))
      .orderBy("iv_id")
  }

  test("width unset: nested loop; width set: bin equi-join, same rows") {
    withExtSession { s =>
      s.conf.unset("spark.graft.rangeJoin.binSize")
      val off = rangeQuery(s)
      val offPlan = off.queryExecution.executedPlan.toString
      assert(offPlan.contains("BroadcastNestedLoopJoin") ||
        offPlan.contains("CartesianProduct"),
        s"naive plan unexpectedly found a key:\n$offPlan")
      val want = off.collect().map(_.toSeq).toSeq

      s.conf.set("spark.graft.rangeJoin.binSize", "600000") // 10 min
      val on = rangeQuery(s)
      val onPlan = on.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin") &&
        !onPlan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$onPlan")
      assert(onPlan.contains("__graft_bin"),
        s"bin key missing from the rewritten plan:\n$onPlan")
      val got = on.collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got == want)
    }
  }

  test("a join that already has an equi key is left alone") {
    withExtSession { s =>
      s.conf.set("spark.graft.rangeJoin.binSize", "600000")
      val ev = Tables.load(s, sfDir, "events")
      val a = ev.select(col("user_id").as("ua"),
        unix_millis(col("ts")).as("ta"))
      val b = ev.select(col("user_id").as("ub"),
        unix_millis(col("ts")).as("tb"))
      val j = a.join(b, col("ua") === col("ub") &&
        col("tb") >= col("ta") - 600000L && col("tb") <= col("ta"))
      assert(!j.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"),
        "rewrite fired on an equi-keyed join")
    }
  }

  test("reversed (empty) interval: no crash, empty result both modes") {
    withExtSession { s =>
      val ev = Tables.load(s, sfDir, "events").limit(50)
      def q(sess: SparkSession): DataFrame = {
        val iv = ev.select(col("event_id").as("iv_id"),
          (unix_millis(col("ts")) + 600000L).as("lo"), // lo > hi
          (unix_millis(col("ts")) - 600000L).as("hi"))
        val pts = ev.select(unix_millis(col("ts")).as("pt"))
        iv.join(pts, col("pt") >= col("lo") && col("pt") <= col("hi"))
      }
      s.conf.unset("spark.graft.rangeJoin.binSize")
      assert(q(s).count() == 0)
      s.conf.set("spark.graft.rangeJoin.binSize", "600000")
      assert(q(s).count() == 0)
    }
  }

  test("bins are exact past 2^53 (integer floor-division, no double round-trip)") {
    // snowflake-scale ids: consecutive Longs up here collapse to the
    // SAME Double (ulp = 2048 at 2^63-ish), so a float bin would merge
    // or split bins arbitrarily; negative points check the floor (not
    // truncate-toward-zero) behavior as well
    withExtSession { s =>
      import s.implicits._
      val base = Long.MaxValue - 10000L
      val iv = Seq(
        (1L, base + 100L, base + 200L),
        (2L, -9223372036854775000L, -9223372036854774000L))
        .toDF("iv_id", "lo", "hi")
      val pts = Seq(
        base + 150L,  // inside iv 1
        base + 2201L, // outside (would alias into range under double rounding)
        -9223372036854774500L, // inside iv 2
        -9223372036854773000L  // outside
      ).toDF("pt")
      def q() = iv.join(pts, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("iv_id", "pt").orderBy("iv_id", "pt")
        .collect().map(_.toSeq).toSeq
      s.conf.unset("spark.graft.rangeJoin.binSize")
      val want = q()
      assert(want.size == 2)
      s.conf.set("spark.graft.rangeJoin.binSize", "600000")
      val on = iv.join(pts, col("pt") >= col("lo") && col("pt") <= col("hi"))
      assert(on.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
        "rewrite did not fire on the 2^63-scale join")
      assert(q() == want)
    }
  }

  test("strict bounds keep their strictness through the rewrite") {
    withExtSession { s =>
      val ev = Tables.load(s, sfDir, "events").limit(200)
      def q(): Seq[Seq[Any]] = {
        val iv = ev.filter(col("event_id") % 7 === 0)
          .select(col("event_id").as("iv_id"),
            (unix_millis(col("ts")) - 600000L).as("lo"),
            (unix_millis(col("ts")) + 600000L).as("hi"))
        val pts = ev.select(col("event_id").as("p_id"),
          unix_millis(col("ts")).as("pt"))
        iv.join(pts, col("pt") > col("lo") && col("pt") < col("hi"))
          .select("iv_id", "p_id").orderBy("iv_id", "p_id")
          .collect().map(_.toSeq).toSeq
      }
      s.conf.unset("spark.graft.rangeJoin.binSize")
      val want = q()
      s.conf.set("spark.graft.rangeJoin.binSize", "600000")
      assert(q() == want)
    }
  }
}
