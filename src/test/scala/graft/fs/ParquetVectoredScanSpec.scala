package graft.fs

import graft.{Tables, TestBase}
import org.apache.spark.sql.functions.col

/** End-to-end vectored-read integration: a REAL Spark parquet scan over
  * `graft://` with `parquet.hadoop.vectored.io.enabled=true` must enter
  * the caching stream through `readVectored` (the Hadoop 3.4 vectored
  * API parquet 1.14+ uses for column-chunk I/O) — VectoredReadSpec
  * proves the API contract; this proves Spark's scan actually takes the
  * path. Counter deltas are the evidence: `vectoredReads` must move
  * with the flag on, and the scan's answer must equal the plain-path
  * read byte for byte.
  */
class ParquetVectoredScanSpec extends TestBase {

  test("a Spark parquet scan through graft:// exercises readVectored") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_vec_scan")
    val hc = spark.sparkContext.hadoopConfiguration
    val prevVec = Option(hc.get("parquet.hadoop.vectored.io.enabled"))
    hc.set("fs.graft.impl", classOf[GraftCachingFileSystem].getName)
    hc.set("graft.fs.disk.cache.dir", s"$scratch/pages")
    hc.set("graft.fs.write.cache.dir", s"$scratch/wc")
    hc.set("graft.fs.data.cache.mode", "ALL")
    hc.set("parquet.hadoop.vectored.io.enabled", "true")
    try {
      val gPath = s"graft://local$sfDir/lineitem.parquet"
      val read = () => spark.read
        .schema(Tables.schemas("lineitem"))
        .parquet(gPath)
        .select(col("l_orderkey"), col("l_quantity")) // pruned scan:
        // column chunks are non-adjacent ranges, the vectored sweet spot
        .collect()

      val viaGraft = read()
      val inst = GraftCachingFileSystem.instanceFor("graft://local/")
      assert(inst.nonEmpty, "graft:// instance not registered after scan")
      val n0 = inst.get.stats.vectoredReads.get()
      val r0 = inst.get.stats.vectoredRanges.get()
      assert(n0 > 0,
        "parquet scan did not call readVectored — vectored I/O not wired")
      assert(r0 >= n0, "ranges counter must cover every vectored call")

      // warm re-scan still goes vectored and matches the plain path
      val again = read()
      assert(inst.get.stats.vectoredReads.get() > n0,
        "second scan did not go through readVectored")
      val plain = spark.read
        .schema(Tables.schemas("lineitem"))
        .parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
        .collect()
      def key(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(key(viaGraft).sameElements(key(plain)))
      assert(key(again).sameElements(key(plain)))
    } finally {
      prevVec match {
        case Some(v) => hc.set("parquet.hadoop.vectored.io.enabled", v)
        case None => hc.unset("parquet.hadoop.vectored.io.enabled")
      }
    }
  }
}
