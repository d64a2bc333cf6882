package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query at the bench scale factor,
  * one JSON line on stdout (driver contract).
  *
  * Timing forces full materialization via `collect()` on the query's
  * final (already small, ORDER BY'd) output — `count()` would let
  * Catalyst prune projections and windows out of the measured plan.
  * One untimed warm-up query absorbs JVM/classloader costs so per-query
  * numbers measure the engine, not first-touch initialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (untimed): run the whole surface once at the smallest sf so
    // codegen/classloading/regex-compile costs don't pollute per-query
    // numbers; the timed pass below measures steady-state execution
    val warmDir = "/root/testdata/sf0.001"
    val warm = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, warm).limit(1000).collect()
      catch { case _: Throwable => }
    }
    // drop persisted relations left by the warm-up (dedup/cluster
    // queries cache their self-join inputs) so the timed pass starts
    // with empty storage memory
    spark.catalog.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          val df = fn(spark, sfDir)
          // large per-row outputs: count() after a forced projection would
          // still skip work, so cap materialization instead of pruning it
          df.limit(2000000).collect()
          true
        } catch { case _: Throwable => false }
      // a crashed query must not masquerade as a fast success
      val elapsed = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // per-query storage hygiene: persisted inputs must not bleed
      // into (or slow) the next query's measurement
      spark.catalog.clearCache()
      name -> elapsed
    }
    // millisecond precision keeps the single JSON line short (the round-1
    // full-precision doubles got its tail truncated in capture); the same
    // line also goes to bench_out.json as a durable copy
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
