package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Contract of the native as-of join (custom LogicalPlan + Strategy +
  * AsOfJoinExec): semantics vs the composed q53 formulation and the
  * DuckDB oracle, edge cases the fixture can't produce, and the plan
  * shape the operator exists to deliver. */
class AsOfJoinSpec extends TestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of join equals the composed union+window formulation") {
    val native = SparkEntry.queries("q53b_asof_native")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val composed = SparkEntry.queries("q53_asof_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("edges: no-match-yet, inclusive boundary, ties, null keys/times, empty right") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")), // before any right row
      (2L, "a", ts("2024-01-01 10:00:00")), // exactly at a right time
      (3L, "a", ts("2024-01-01 12:00:00")), // between right rows
      (4L, "b", ts("2024-01-01 09:00:00")), // key with no right rows
      (5L, null, ts("2024-01-01 09:00:00")), // null key never matches
      (6L, "c", null) // null time never matches
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), "v1"),
      ("a", ts("2024-01-01 10:00:00"), "v2"), // tie: last in sort wins
      ("a", ts("2024-01-01 11:00:00"), "v3"),
      (null, ts("2024-01-01 00:00:00"), "vnull") // null key: consumed, no match
    ).toDF("rk", "rt", "v")
    val out = AsOfJoin.asof(left, right,
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"))
      .select(col("id"), col("rt"), col("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.getString(2)))).toMap
    assert(out(1L) == (None, None)) // left time before all right rows
    assert(out(2L)._1.contains("2024-01-01 10:00:00.0")) // inclusive <=
    assert(Set("v1", "v2").contains(out(2L)._2.get)) // tie: one of the tied rows
    assert(out(3L) == (Some("2024-01-01 11:00:00.0"), Some("v3")))
    assert(out(4L) == (None, None)) // key absent on the right
    assert(out(5L) == (None, None)) // null key
    assert(out(6L) == (None, None)) // null time

    val empty = AsOfJoin.asof(left, right.filter(lit(false)),
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"))
      .select(col("id"), col("v")).collect()
    assert(empty.length == 6 && empty.forall(_.isNullAt(1)))
  }

  test("multiple left rows per key advance monotonically through the right side") {
    val left = (1 to 100).map(i => ("k", i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00")))
      .toDF("k", "id", "t")
    val right = (0 until 24).map(h => ("k", ts(f"2024-01-01 $h%02d:00:00"), h))
      .toDF("rk", "rt", "h")
    val out = AsOfJoin.asof(left, right,
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"))
      .select(col("id"), col("h")).collect()
    assert(out.length == 100)
    // every left row must match the right row at exactly its own hour
    out.foreach { r => assert(r.getInt(1) == (r.getLong(0) % 24).toInt) }
  }

  test("mismatched key types and floating-point keys are rejected at construction") {
    // no analyzer coercion runs on a hand-built node, so a type
    // mismatch would silently mis-partition — it must fail loudly
    val left = Seq((1, 1L, ts("2024-01-01 00:00:00"))).toDF("ik", "lk", "t")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), "v")).toDF("rk", "rt", "v")
    val mismatch = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, Seq(left("ik")), Seq(right("rk")),
        left("t"), right("rt"))
    }
    assert(mismatch.getMessage.contains("key types must match"))
    val fleft = Seq((1.0, ts("2024-01-01 00:00:00"))).toDF("fk", "t")
    val fright = Seq((1.0, ts("2024-01-01 00:00:00"), "v")).toDF("fk", "rt", "v")
    val float = intercept[IllegalArgumentException] {
      AsOfJoin.asof(fleft, fright, Seq(fleft("fk")), Seq(fright("fk")),
        fleft("t"), fright("rt"))
    }
    assert(float.getMessage.contains("FLOAT/DOUBLE"))
  }

  test("forward direction: earliest right time >= left time, inclusive, first tie wins") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 09:00:00")), // before both right rows
      (2L, "a", ts("2024-01-01 10:00:00")), // exactly at a right time (inclusive)
      (3L, "a", ts("2024-01-01 10:30:00")), // between right rows
      (4L, "a", ts("2024-01-01 12:00:00")), // after all right rows: no match
      (5L, "b", ts("2024-01-01 09:00:00"))  // key absent on the right
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), "v1"),
      ("a", ts("2024-01-01 11:00:00"), "v2"),
      ("a", ts("2024-01-01 11:00:00"), "v3") // tie on (key, time)
    ).toDF("rk", "rt", "v")
    val out = AsOfJoin.asof(left, right,
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
      direction = AsOfJoin.Forward)
      .select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("v1"))
    assert(out(2L).contains("v1")) // inclusive >=
    assert(out(3L).contains("v2")) // first of the tied group wins
    assert(out(4L).isEmpty)        // nothing at/after 12:00
    assert(out(5L).isEmpty)
  }

  test("nearest direction: smaller absolute distance wins; equal distance resolves backward") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:20:00")), // 20m after v1, 40m before v2 -> v1
      (2L, "a", ts("2024-01-01 10:40:00")), // 40m after v1, 20m before v2 -> v2
      (3L, "a", ts("2024-01-01 10:30:00")), // equidistant -> backward (v1)
      (4L, "a", ts("2024-01-01 09:00:00")), // only a forward candidate -> v1
      (5L, "a", ts("2024-01-01 23:00:00"))  // only a backward candidate -> v2
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), "v1"),
      ("a", ts("2024-01-01 11:00:00"), "v2")
    ).toDF("rk", "rt", "v")
    val out = AsOfJoin.asof(left, right,
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
      direction = AsOfJoin.Nearest)
      .select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("v1"))
    assert(out(2L).contains("v2"))
    assert(out(3L).contains("v1")) // tie -> backward
    assert(out(4L).contains("v1"))
    assert(out(5L).contains("v2"))
  }

  test("tolerance bounds the match distance in every direction") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:30:00")), // 30m after the right row
      (2L, "a", ts("2024-01-01 12:00:00"))  // 2h after the right row
    ).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 10:00:00"), "v1")).toDF("rk", "rt", "v")
    val tol = Some(java.time.Duration.ofHours(1))
    val bw = AsOfJoin.asof(left, right,
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
      tolerance = tol)
      .select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(bw(1L).contains("v1") && bw(2L).isEmpty) // 2h > 1h tolerance
    val fwLeft = Seq(
      (1L, "a", ts("2024-01-01 09:30:00")), // 30m before
      (2L, "a", ts("2024-01-01 08:00:00"))  // 2h before
    ).toDF("id", "k", "t")
    val fw = AsOfJoin.asof(fwLeft, right,
      Seq(fwLeft("k")), Seq(right("rk")), fwLeft("t"), right("rt"),
      direction = AsOfJoin.Forward, tolerance = tol)
      .select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fw(1L).contains("v1") && fw(2L).isEmpty)
    val nr = AsOfJoin.asof(left, right,
      Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
      direction = AsOfJoin.Nearest, tolerance = tol)
      .select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(nr(1L).contains("v1") && nr(2L).isEmpty)
  }

  test("bad direction is rejected at construction") {
    val left = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 00:00:00"), "v")).toDF("rk", "rt", "v")
    val bad = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, Seq(left("k")), Seq(right("rk")),
        left("t"), right("rt"), direction = "sideways")
    }
    assert(bad.getMessage.contains("direction"))
  }

  test("self-as-of-join: shared lineage deduplicates; right refs bind to the right side") {
    // the same frame on both sides exposes identical exprIds — the
    // entry point must re-alias the right side and remap its key/time
    // expressions, or resolution is ambiguous (ADVICE r6)
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1L),
      ("a", ts("2024-01-01 11:00:00"), 2L),
      ("a", ts("2024-01-01 12:00:00"), 3L)
    ).toDF("k", "t", "seq")
    val out = AsOfJoin.asof(df, df,
      Seq(df("k")), Seq(df("k")), df("t"), df("t"))
      .collect()
    assert(out.length == 3)
    // output carries both sides' columns, distinct attributes
    assert(out.head.length == 6)
    // backward-inclusive self-match: every row matches itself (the
    // latest right time <= its own time is its own time)
    out.foreach { r => assert(r.getTimestamp(1) == r.getTimestamp(4)) }
  }

  test("asof on an extensions-built session does not duplicate the planner strategy") {
    // spark.sql.extensions=graft.GraftExtensions already injects
    // GraftStrategies; ensureStrategy must detect it and not append a
    // second copy to experimental.extraStrategies (ADVICE r6). Session
    // juggling follows ExtensionsSpec: reuse the shared context, never
    // close s2, restore the shared session in finally.
    val orig = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val sqlImplicits = s2.implicits
      import sqlImplicits._
      val left = Seq(("a", ts("2024-01-01 10:00:00"), 1L)).toDF("k", "t", "id")
      val right = Seq(("a", ts("2024-01-01 09:00:00"), "v")).toDF("rk", "rt", "v")
      val out = AsOfJoin.asof(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"))
      assert(out.collect().length == 1)
      assert(s2.experimental.extraStrategies.isEmpty,
        "ensureStrategy appended a duplicate of the extensions-injected strategy")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
    }
  }

  test("the physical plan is the native merge: AsOfJoin node, no Window, no Union") {
    Seq("q53b_asof_native", "q53c_asof_forward", "q53d_asof_nearest")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        assert(plan.contains("AsOfJoin"), s"$name native node missing:\n$plan")
        assert(!plan.contains("Window"), s"$name window crept back in:\n$plan")
        assert(!plan.contains("Union"), s"$name union crept back in:\n$plan")
      }
  }
}
