package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan and timed runs of
  * one named query (or all, comma-separated). Used to keep every
  * operator's plan the one you'd want at 100 TB — filters pushed to the
  * scan, dims broadcast, codegen spans wide.
  *
  * Usage: runMain graft.Profile <queryName>[,<queryName>...] [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q11_agg_pricing").split(",").toSeq
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"==== $name ====")
      fn(spark, sfDir).explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).limit(2000000).collect().length
        println(f"[profile] $name run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      // the formatted explain above is the INITIAL plan; AQE decisions
      // (runtime broadcasts, stage/exchange reuse, skew splits) only
      // show in the executed plan of a finished run — and only on the
      // SAME QueryExecution that ran (a fresh .limit(...) would execute
      // its own copy and leave this one un-finalized)
      val limited = fn(spark, sfDir).limit(2000000)
      limited.collect()
      println(s"==== $name executed (post-AQE) ====")
      println(limited.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
