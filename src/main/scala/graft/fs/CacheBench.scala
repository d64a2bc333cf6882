package graft.fs

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Caching-FS observable bench (BASELINE.md §4): scan lineitem through
  * graft:// cold (remote tier) and warm (page cache), print one JSON
  * line with timings and per-tier byte counters. The warm/cold ratio is
  * the sidecar-equivalent speedup the layer exists to provide.
  */
object CacheBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val scratch = java.nio.file.Files.createTempDirectory("graft_cache_bench")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graft.impl",
        classOf[GraftCachingFileSystem].getName)
      .config("spark.hadoop.graft.fs.disk.cache.dir", s"$scratch/pages")
      .config("spark.hadoop.graft.fs.write.cache.dir", s"$scratch/wc")
      .config("spark.hadoop.graft.fs.memory.cache.size", (512L << 20).toString)
      .config("spark.hadoop.graft.fs.data.cache.mode",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_MODE", "ALL"))
      .config("spark.hadoop.graft.fs.cache.minsize.threshold",
        sys.env.getOrElse("SPARK_GRAFT_MINSIZE", (100L << 20).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"graft://local$sfDir/lineitem.parquet"
    def scan(): Long = {
      val t0 = System.nanoTime()
      spark.read.schema(Tables.lineitem).parquet(path)
        .groupBy("l_returnflag").agg(sum("l_quantity"), sum("l_extendedprice"))
        .collect()
      System.nanoTime() - t0
    }
    val cold = scan() / 1e9
    val warm1 = scan() / 1e9
    val warm2 = scan() / 1e9
    // write round-trip through the caching FS (rename-based commit +
    // read-your-writes): orders out and back, row counts must agree
    val outPath = s"graft://local$scratch/bench_out"
    val orders = Tables.load(spark, sfDir, "orders")
    val nIn = orders.count()
    orders.write.mode("overwrite").parquet(outPath)
    val nOut = spark.read.schema(Tables.orders).parquet(outPath).count()
    require(nIn == nOut, s"write round-trip mismatch: $nIn != $nOut")

    val st = GraftCachingFileSystem.instanceFor("graft://local/")
      .map(_.stats.snapshot).getOrElse(Map.empty)
    val tiers = st.filter { case (k, _) => k.startsWith("bytes") }
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(
      s"""{"metric":"cache_scan","cold_s":$cold,"warm_s":${math.min(warm1, warm2)},""" +
        s""""speedup":${cold / math.min(warm1, warm2)},$tiers,"sf":"$sfDir"}""")
    spark.stop()
  }
}
