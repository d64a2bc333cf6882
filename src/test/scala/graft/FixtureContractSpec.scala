package graft

import org.apache.spark.sql.functions._

/** Canary for the driver-generated fixtures: the test-data generator has
  * regenerated `/root/testdata` mid-build before (round 8 flipped
  * `events.ts` from parquet NANOS to MICROS), and every Spark-vs-Spark
  * spec is self-consistent under a wrong decode — so these assertions pin
  * the PHYSICAL contract the whole query surface assumes. If a
  * regeneration changes an encoding again, this suite fails loudly
  * instead of 14 oracle queries failing silently.
  */
class FixtureContractSpec extends TestBase {

  test("decoded events.ts lands in a sane era and spans more than one day") {
    val r = Tables.load(spark, sfDir, "events")
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .selectExpr(
        "year(lo) as ylo", "year(hi) as yhi",
        "cast(hi as double) - cast(lo as double) as span_sec")
      .head()
    val (ylo, yhi, span) = (r.getInt(0), r.getInt(1), r.getDouble(2))
    // A ÷1000-of-micros decode collapses to 1970; a ×1000 misread of nanos
    // explodes past year 2100. Either way this fails.
    assert(ylo >= 2000 && yhi <= 2100,
      s"events.ts decoded outside a plausible era: years [$ylo, $yhi] — " +
        "the parquet timestamp unit is being mis-decoded (see Tables.load)")
    assert(span > 86400.0,
      s"events.ts spans only $span s (<1 day) — timeline compressed, " +
        "timestamp unit mis-decoded")
  }

  test("the canary REJECTS a wrong-unit decode (simulated ÷1000 and ×1000)") {
    // simulate the round-8 bug (micros divided by 1000 → 1970 pileup)
    // and its inverse (nanos read as micros → far future) on the real
    // data, and check the era/span predicates the first test enforces
    // actually fail for both — the canary must be able to fire
    def eraAndSpan(df: org.apache.spark.sql.DataFrame): (Int, Int, Double) = {
      val r = df.agg(min("ts").as("lo"), max("ts").as("hi"))
        .selectExpr("year(lo)", "year(hi)",
          "cast(hi as double) - cast(lo as double)").head()
      (r.getInt(0), r.getInt(1), r.getDouble(2))
    }
    val real = Tables.load(spark, sfDir, "events")
    val div1000 = real.withColumn("ts",
      expr("timestamp_micros(unix_micros(ts) div 1000)"))
    val (dLo, _, dSpan) = eraAndSpan(div1000)
    assert(dLo < 2000 || dSpan <= 86400.0,
      "÷1000 decode not detectable — canary predicates too loose")
    val times1000 = real.withColumn("ts",
      expr("try_cast(unix_micros(ts) * 1000 as timestamp)")) // overflow-safe
    val anyBad = times1000.filter(col("ts").isNull ||
      year(col("ts")) > 2100).count()
    assert(anyBad > 0,
      "×1000 decode not detectable — canary predicates too loose")
  }

  test("events era overlaps or follows the orders era (as-of joins assume it)") {
    val eLo = Tables.load(spark, sfDir, "events").agg(min("ts")).head().getTimestamp(0)
    val oLo = Tables.load(spark, sfDir, "orders").agg(min("o_orderdate")).head().getTimestamp(0)
    // Backward as-of (q53) matches each event to the latest preceding order:
    // every event must come at or after the first order.
    assert(!eLo.before(oLo),
      s"first event $eLo precedes first order $oLo — as-of/backward joins " +
        "would go all-NULL; events timestamp decode is suspect")
  }

  test("every Tables schema reads its parquet with non-zero rows and exact columns") {
    Tables.schemas.foreach { case (name, schema) =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.schema.fieldNames.toSeq == schema.fieldNames.toSeq,
        s"$name column order drifted")
      assert(df.schema == schema, s"$name decoded schema drifted from Tables.$name")
      assert(df.limit(1).count() == 1, s"$name read zero rows")
    }
  }

  test("embeddings are fixed-dimension non-empty vectors (similarity ops assume it)") {
    val r = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("min(size(embedding)) AS lo", "max(size(embedding)) AS hi",
        "count_if(embedding IS NULL) AS nulls")
      .head()
    assert(r.getLong(2) == 0, "NULL embedding vectors appeared")
    assert(r.getInt(0) == r.getInt(1) && r.getInt(0) > 0,
      s"embedding dimension not constant: [${r.getInt(0)}, ${r.getInt(1)}] — " +
        "a regeneration changed the vector shape")
  }

  test("documents carry non-empty text (dedup/text ops assume it)") {
    val bad = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNull || length(col("text")) === 0).count()
    assert(bad == 0, s"$bad NULL/empty documents — text fixture drifted")
  }

  test("no decoded timestamp column is all-NULL (schema/footer type mismatch canary)") {
    Seq("events" -> "ts", "orders" -> "o_orderdate", "lineitem" -> "l_shipdate")
      .foreach { case (t, c) =>
        val nulls = Tables.load(spark, sfDir, t).filter(col(c).isNull).count()
        assert(nulls == 0, s"$t.$c has $nulls NULLs — explicit-schema read is " +
          "silently nulling a mistyped column")
      }
  }
}
