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

  test("the physical plan is the native merge: AsOfJoin node, no Window, no Union") {
    val plan = SparkEntry.queries("q53b_asof_native")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native node missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Union"), s"union crept back in:\n$plan")
  }
}
