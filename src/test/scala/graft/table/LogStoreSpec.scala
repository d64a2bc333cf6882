package graft.table

import graft.{Tables, TestBase}
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** A local filesystem whose `rename` deliberately has OBJECT-STORE
  * semantics — non-atomic copy+delete, and POSIX mv-INTO-dir when the
  * destination exists as a directory (`FileUtil.copy` implements
  * exactly both) — while exclusive create (`overwrite=false`) is
  * ATOMIC (`File.createNewFile`), which is what S3 conditional PUT /
  * HDFS create-no-overwrite provide. The pointer log store's entire
  * commit path must survive on this; the rename store's must not be
  * trusted on it. */
class BrokenRenameFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("broken:///")

  override def rename(src: Path, dst: Path): Boolean = {
    BrokenRenameFileSystem.renames.incrementAndGet()
    try org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
      true /* deleteSource */, getConf)
    catch { case _: java.io.IOException => false }
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable)
      : FSDataOutputStream = {
    if (!overwrite) {
      val file = pathToFile(f)
      file.getParentFile.mkdirs()
      if (!file.createNewFile()) // ATOMIC exclusive create
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }
}

object BrokenRenameFileSystem {
  val renames = new java.util.concurrent.atomic.AtomicLong
}

/** The putIfAbsent LogStore behind the `atomicPublish` seam (VERDICT
  * r10 next-round #2): `logStore = "pointer"` commits via atomic
  * exclusive create of a pointer file — no rename in the commit path —
  * so the full table protocol (create, OCC appends under real
  * concurrency, merge, compaction, time travel, tags, vacuum) survives
  * a store whose rename is copy+delete / mv-into-dir. The store choice
  * persists in `_table_props`, so readers holding only the manifest
  * path resolve pointer-committed tables. */
class LogStoreSpec extends TestBase {

  private def brokenRoot(tag: String): String = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.broken.impl", classOf[BrokenRenameFileSystem].getName)
    // the capability gate doesn't know 'broken:'; this FS's exclusive
    // create IS atomic (File.createNewFile), so declare it — exactly
    // the override an operator uses for S3-with-conditional-PUT
    spark.conf.set("spark.graft.logstore.pointer.allowSchemes", "broken")
    "broken:" + java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
  }

  test("capability gate: pointer-store CREATE on an undeclared scheme fails loudly") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.broken.impl", classOf[BrokenRenameFileSystem].getName)
    val root = "broken:" +
      java.nio.file.Files.createTempDirectory("graft_gate").toString
    val prev = spark.conf.getOption("spark.graft.logstore.pointer.allowSchemes")
    spark.conf.unset("spark.graft.logstore.pointer.allowSchemes")
    try {
      val e = intercept[IllegalArgumentException] {
        GraftTable(spark, s"$root/data", s"$root/man", "o_orderkey",
          logStore = "pointer").create(orders, 2)
      }
      assert(e.getMessage.contains("ATOMIC exclusive create") &&
        e.getMessage.contains("allowSchemes=broken"), e.getMessage)
      // declaring the scheme turns the same create into a success
      spark.conf.set("spark.graft.logstore.pointer.allowSchemes", "broken")
      val t = GraftTable(spark, s"$root/data", s"$root/man", "o_orderkey",
        logStore = "pointer").create(orders, 2)
      assert(t.committedVersions == Seq(1))
      // known-safe schemes (local file) need no declaration
      spark.conf.unset("spark.graft.logstore.pointer.allowSchemes")
      val local = java.nio.file.Files.createTempDirectory("graft_gate2").toString
      assert(GraftTable(spark, s"$local/data", s"$local/man", "o_orderkey",
        logStore = "pointer").create(orders.limit(10), 1)
        .committedVersions == Seq(1))
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.graft.logstore.pointer.allowSchemes", v)
      case None => () // brokenRoot re-sets it for the other tests
    }
  }

  private def orders: DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  test("the broken FS really is broken: rename nests into an existing dir") {
    val root = brokenRoot("sanity")
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(s"$root/a"))
    fs.create(new Path(s"$root/a/x"), true).close()
    fs.mkdirs(new Path(s"$root/b"))
    assert(fs.rename(new Path(s"$root/a"), new Path(s"$root/b")),
      "POSIX mv 'succeeds' into an existing destination dir")
    assert(fs.exists(new Path(s"$root/b/a/x")),
      "the payload nested INSIDE the destination — the object-store trap")
    // and exclusive create is atomic + exclusive
    fs.create(new Path(s"$root/excl"), false).close()
    intercept[java.io.IOException] {
      fs.create(new Path(s"$root/excl"), false).close()
    }
  }

  test("pointer store: the full table lifecycle on the broken-rename FS") {
    val root = brokenRoot("ptr")
    val table = GraftTable(spark, s"$root/data", s"$root/man",
      "o_orderkey", logStore = "pointer").create(orders, 4)
    val n1 = orders.count()
    assert(table.committedVersions == Seq(1))

    // append, merge, compaction — every commit path
    val appended = orders.filter(col("o_orderkey").between(1, 500))
      .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
    table.commitAppend(appended, 1, 2, tag = Some("b0"))
    val nApp = appended.count()
    assert(table.readAsOf(2).count() == n1 + nApp)
    assert(table.tagCommitted("b0") && table.versionWithTag("b0").contains(2))

    val updates = orders.filter(col("o_orderkey").between(1000, 2000))
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    table.commitMerge(updates, 2)
    assert(table.readAsOf(3).count() == n1 + nApp, "merge changed row count")
    assert(table.readAsOf(2).count() == n1 + nApp, "snapshot isolation broken")

    val packed = table.commitCompaction(3, targetBytes = 1L << 30)
    assert(packed > 1 && table.committedVersions == Seq(1, 2, 3, 4))
    assert(!table.dataChange(4) && table.dataChange(3))
    assert(table.readAsOf(4).count() == n1 + nApp)

    // box pruning plans from pointer-resolved manifests
    val (kept, total) = table.prune(4, 100L, 2000L)
    assert(kept.size < total || total == 1)

    // time travel by commit timestamp
    assert(table.versionAsOfTime(System.currentTimeMillis()) == 4)

    // vacuum: reclaims expired versions' files, preserves tags, spares
    // live pointer-target dirs
    val removed = table.vacuum(4, 4)
    assert(removed.nonEmpty, "compaction left nothing to vacuum?")
    assert(table.committedVersions == Seq(4))
    assert(table.tagCommitted("b0"), "vacuum lost the tag ledger")
    assert(table.readAsOf(4).count() == n1 + nApp, "vacuum broke the live snapshot")
  }

  test("a reader holding only the manifest path resolves a pointer table via props") {
    val root = brokenRoot("props")
    GraftTable(spark, s"$root/data", s"$root/man", "o_orderkey",
      logStore = "pointer").create(orders, 2)
    // no logStore declared — must come from _table_props
    val reader = GraftTable(spark, data = "", man = s"$root/man", key = "")
    assert(reader.committedVersions == Seq(1))
    assert(reader.readAsOf(1).count() == orders.count())
    assert(GraftTable.loadProps(spark, s"$root/man")
      .flatMap(_.logStore).contains("pointer"))
  }

  test("concurrent OCC appends on the broken FS: the full concurrency matrix") {
    val root = brokenRoot("occ")
    val table = GraftTable(spark, s"$root/data", s"$root/man",
      "o_orderkey", logStore = "pointer").create(orders, 4)
    val initRows = orders.count()

    val nWriters = 4
    val perWriter = 2
    val batchRows = 100L
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val writers = (0 until nWriters).map { w =>
        Future {
          (0 until perWriter).map { i =>
            val base = (w * perWriter + i + 1) * 100000L
            val batch = orders.limit(batchRows.toInt)
              .select((-col("o_orderkey") - base).as("o_orderkey"),
                col("o_custkey"), col("o_totalprice"))
            table.commitAppendOcc(batch)
          }
        }
      }
      val committed = Await.result(Future.sequence(writers), 300.seconds).flatten
      val total = nWriters * perWriter
      val latest = 1 + total
      assert(committed.toSet == (2 to latest).toSet,
        s"versions not contiguous: ${committed.sorted}")
      assert(table.committedVersions == (1 to latest))
      assert(table.readAsOf(latest).count() == initRows + total * batchRows)
      (1 until latest).foreach { v =>
        assert(table.readAsOf(v + 1).count() - table.readAsOf(v).count()
          == batchRows, s"version ${v + 1} does not add one batch")
      }
      val refs = table.files(latest)
      assert(refs.size == refs.distinct.size, "manifest references a file twice")
      // losers' staging dirs were dropped; winners' are live version
      // dirs vacuum must NOT reclaim
      assert(table.vacuum(latest, latest).isEmpty,
        "concurrent appends left unreferenced files")
      assert(table.readAsOf(latest).count() == initRows + total * batchRows,
        "vacuum reclaimed a live pointer-target dir")
    } finally pool.shutdown()
  }

  test("rename-store publish on the broken FS loses the race detectably (witness)") {
    val root = brokenRoot("witness")
    // rename store, deliberately on the broken FS: the first commit
    // lands (dst did not exist), the second must REPORT loss — the
    // mv-into-dir 'success' is caught by the witness check and undone
    val table = GraftTable(spark, s"$root/data", s"$root/man", "o_orderkey")
    table.create(orders, 2)
    val entries = table.manifest(1)
    assert(!table.tryCommitManifest(entries, 1),
      "second publish of v=1 must lose")
    // the nested payload was cleaned up: v=1 still reads exactly
    assert(table.readAsOf(1).count() == orders.count())
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val nested = fs.listStatus(new Path(s"$root/man/v=1"))
      .filter(_.getPath.getName.startsWith("_tmp_"))
    assert(nested.isEmpty, s"nested staging left inside v=1: ${nested.toSeq}")
  }
}
