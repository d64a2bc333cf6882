package graft.fs

import graft.{Tables, TestBase}
import org.apache.spark.sql.functions._

/** End-to-end: Spark reads and writes parquet THROUGH the caching
  * filesystem (`graft://` scheme). This is the integration the whole
  * layer exists for — the reference is "a caching FS under Spark"
  * (SURVEY.md §0); here Spark's parquet scans, vectorized readers and
  * rename-based commit protocol all run against GraftCachingFileSystem.
  */
class SparkGraftFsSpec extends TestBase {

  private lazy val scratch =
    java.nio.file.Files.createTempDirectory("graft_spark_fs").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graft.impl", classOf[GraftCachingFileSystem].getName)
    hc.set("graft.fs.disk.cache.dir", s"$scratch/pages")
    hc.set("graft.fs.write.cache.dir", s"$scratch/wc")
  }

  private def fsInstance: GraftCachingFileSystem =
    GraftCachingFileSystem.instanceFor("graft://local/").getOrElse(
      fail("graft fs instance not registered"))

  test("spark reads parquet through the caching fs; re-read is remote-free") {
    val path = s"graft://local$sfDir/lineitem.parquet"
    val df = spark.read.schema(Tables.lineitem).parquet(path)
    val n1 = df.count()
    assert(n1 > 0)
    val stats = fsInstance.stats
    val remoteAfterFirst = stats.bytesFromRemote.get
    assert(remoteAfterFirst > 0, "first scan should hit the remote tier")

    val agg = spark.read.schema(Tables.lineitem).parquet(path)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(agg.collect().length > 0)
    val remoteAfterSecond = stats.bytesFromRemote.get
    assert(remoteAfterSecond == remoteAfterFirst,
      s"second scan went remote: $remoteAfterFirst -> $remoteAfterSecond " +
        s"(page cache should serve it; ${stats.snapshot.filter(_._2 > 0)})")
    assert(stats.bytesFromPageCache.get + stats.bytesFromPrefetch.get > 0)
  }

  test("spark writes parquet through the caching fs (rename-based commit)") {
    val out = s"graft://local$scratch/out_orders"
    val orders = Tables.load(spark, sfDir, "orders")
    orders.write.mode("overwrite").parquet(out)

    // written files are readable back through the cache...
    val back = spark.read.schema(Tables.orders).parquet(out)
    assert(back.count() == orders.count())
    // ...and the copies landed in the write cache (read-your-writes tier)
    assert(fsInstance.stats.filesWritten.get > 0)
    assert(fsInstance.stats.bytesWritten.get > 0)
  }

  test("structured streaming sink + checkpoint run through graft://") {
    // checkpoints go through CheckpointFileManager, which prefers the
    // FileContext API — wiring the AbstractFileSystem shim makes the
    // atomic checkpoint renames flow through the caching FS too
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.AbstractFileSystem.graft.impl",
      classOf[graft.fs.adapters.GraftFs].getName)
    val src = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/nation.parquet"),
      src.resolve("nation.parquet"))
    val outPath = s"graft://local$scratch/stream_out"
    val ckpt = s"graft://local$scratch/stream_ckpt"
    val q = spark.readStream.schema(Tables.nation).parquet(src.toString)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val written = spark.read.schema(Tables.nation).parquet(outPath).count()
    val expected = Tables.load(spark, sfDir, "nation").count()
    assert(written == expected, s"streamed $written vs $expected")
    // the checkpoint landed through the caching filesystem
    val fs = fsInstance
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ckpt/offsets")),
      "checkpoint offsets dir missing behind graft://")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ckpt/commits")))
  }

  test("query results identical with and without the caching layer") {
    val direct = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("q"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    val cached = spark.read.schema(Tables.lineitem)
      .parquet(s"graft://local$sfDir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("q"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    assert(direct == cached)
  }
}
