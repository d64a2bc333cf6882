package graft.table

import graft.{Tables, TestBase}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** `format("graft")` — the table format as a first-class Spark data
  * source. Read correctness (latest / VERSION AS OF / TIMESTAMP AS OF),
  * write modes over the OCC commit protocol, and the plan-mechanical
  * proof that pushed-down filters reach the manifest: the physical
  * scan's `numFiles` metric counts the files the [[GraftManifestFileIndex]]
  * kept, not the snapshot's total. */
class GraftDataSourceSpec extends TestBase {

  private def freshDirs(tag: String): (String, String) = (
    java.nio.file.Files.createTempDirectory(s"graft_ds_${tag}_d").toString,
    java.nio.file.Files.createTempDirectory(s"graft_ds_${tag}_m").toString)

  private def orders: DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def scannedFileCount(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in the plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("overwrite creates; read round-trips; append commits a new version") {
    val (data, man) = freshDirs("rt")
    orders.write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "o_orderkey").option("data", data).save(man)
    val back = spark.read.format("graft").load(man)
    assert(back.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)

    // append needs NOTHING but the manifest path — shape comes from props
    val batch = orders.limit(50)
      .select((col("o_orderkey") + 90000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
    batch.write.format("graft").mode(SaveMode.Append).save(man)
    val t = GraftTable(spark, data, man, "o_orderkey")
    assert(t.committedVersions == Seq(1, 2))
    assert(spark.read.format("graft").load(man).count() ==
      orders.count() + 50)
    // VERSION AS OF still sees the pre-append snapshot
    assert(spark.read.format("graft").option("versionAsOf", 1).load(man)
      .count() == orders.count())
    // TIMESTAMP AS OF: v1's commit instant resolves to v1
    val ts1 = t.commitTimeOf(1)
    assert(spark.read.format("graft")
      .option("timestampAsOf", ts1.toString).load(man)
      .count() == orders.count())
  }

  test("planning opens ZERO data files: the schema rides the commit") {
    val (data, man) = freshDirs("zeroio")
    orders.write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "o_orderkey").option("data", data).save(man)
    val expected = spark.read.format("graft").load(man).schema
    // hide every data byte: if planning needed a footer, it would fail
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hidden = new org.apache.hadoop.fs.Path(data + ".hidden")
    assert(fs.rename(new org.apache.hadoop.fs.Path(data), hidden))
    try {
      val df = spark.read.format("graft").load(man)
      assert(df.schema == expected, s"${df.schema} vs $expected")
      // the TVF surface plans schema-from-commit too
      graft.table.SnapshotSql.register(spark)
      val tvf = spark.sql(s"SELECT * FROM graft_snapshot('$man', 1)")
      assert(tvf.schema.fieldNames.toSeq == expected.fieldNames.toSeq)
    } finally assert(fs.rename(hidden, new org.apache.hadoop.fs.Path(data)))
    // data restored: the same plans execute
    assert(spark.read.format("graft").load(man).count() == orders.count())
  }

  test("pushed-down key filters prune files at the physical scan") {
    val (data, man) = freshDirs("prune")
    orders.write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "o_orderkey").option("data", data)
      .option("numFiles", 8).save(man)
    val all = scannedFileCount(spark.read.format("graft").load(man))
    assert(all == 8, s"expected the 8 clustered files, scanned $all")
    val narrow = spark.read.format("graft").load(man)
      .filter(col("o_orderkey") <= 100)
    val few = scannedFileCount(narrow)
    assert(few > 0 && few < all, s"key filter must skip files: $few of $all")
    // correctness: pruned read == full filter
    assert(narrow.count() ==
      orders.filter(col("o_orderkey") <= 100).count())
    // a column with no recorded stats cannot prune
    val noStats = scannedFileCount(spark.read.format("graft").load(man)
      .filter(col("o_custkey") === 7))
    assert(noStats == all, "no stats -> no pruning")
  }

  test("bloom probes prune point lookups through the data source") {
    import spark.implicits._
    val (data, man) = freshDirs("bloom")
    // ev is a permutation of the id domain: boxes useless, blooms sharp
    val df = (0 until 800).map { i =>
      (i.toLong, ((i * 7919) % 800).toLong)
    }.toDF("id", "ev")
    df.write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "id").option("data", data)
      .option("bloom", "ev").option("numFiles", 8).save(man)
    val probe = spark.read.format("graft").load(man)
      .filter(col("ev") === 123)
    val few = scannedFileCount(probe)
    assert(few <= 2, s"bloom probe must prune to ~1 file: $few of 8")
    assert(probe.count() == 1)
    // ranges never consult blooms
    assert(scannedFileCount(spark.read.format("graft").load(man)
      .filter(col("ev") >= 10)) == 8)
  }

  test("save modes: ErrorIfExists refuses, Ignore no-ops, Overwrite recreates") {
    val (data, man) = freshDirs("modes")
    orders.write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "o_orderkey").option("data", data).save(man)
    intercept[IllegalStateException] {
      orders.write.format("graft").mode(SaveMode.ErrorIfExists)
        .option("key", "o_orderkey").option("data", data).save(man)
    }
    val before = spark.read.format("graft").load(man).count()
    orders.limit(5).write.format("graft").mode(SaveMode.Ignore)
      .option("key", "o_orderkey").option("data", data).save(man)
    assert(spark.read.format("graft").load(man).count() == before,
      "Ignore must not touch an existing table")
    orders.limit(7).write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "o_orderkey").option("data", data).save(man)
    assert(spark.read.format("graft").load(man).count() == 7,
      "Overwrite must recreate")
  }

  test("declaration errors fail loudly; stats options flow into props") {
    val (data, man) = freshDirs("errs")
    val noKey = intercept[IllegalArgumentException] {
      orders.write.format("graft").mode(SaveMode.Overwrite)
        .option("data", data).save(man)
    }
    assert(noKey.getMessage.contains("key"), noKey.getMessage)
    val noData = intercept[IllegalArgumentException] {
      orders.write.format("graft").mode(SaveMode.Overwrite)
        .option("key", "o_orderkey").save(man)
    }
    assert(noData.getMessage.contains("data"), noData.getMessage)
    // a stats column CORRELATED with the clustering (v2 = key * 10) has
    // tight per-file boxes and real pruning power; an uncorrelated one
    // would have domain-spanning boxes in every file
    import spark.implicits._
    val withV2 = (0 until 800).map(i => (i.toLong, i * 10L)).toDF("id", "v2")
    withV2.write.format("graft").mode(SaveMode.Overwrite)
      .option("key", "id").option("data", data)
      .option("stats", "v2").option("numFiles", 8).save(man)
    val p = GraftTable.loadProps(spark, man).get
    assert(p.key.contains("id") && p.statsCols == Seq("v2")
      && p.data.contains(data))
    // and the declared stats column prunes through the read path
    val pruned = scannedFileCount(spark.read.format("graft").load(man)
      .filter(col("v2") >= 7000))
    val all = scannedFileCount(spark.read.format("graft").load(man))
    assert(pruned > 0 && pruned < all,
      s"stats option did not gain pruning: $pruned of $all")
  }

  test("readStream.format(graft): commits become micro-batches, exactly once, orphans never") {
    val (data, man) = freshDirs("stream")
    val t = GraftTable(spark, data, man, "o_orderkey")
    t.create(orders.filter(col("o_orderkey") % 3 === 0), 2)
    t.commitAppend(orders.filter(col("o_orderkey") % 3 === 1), 1, 2)
    // crash orphan: data written, never committed — must not deliver
    orders.filter(col("o_orderkey") % 3 === 2).limit(10)
      .coalesce(1).write.mode("append").parquet(data)

    val seen = scala.collection.mutable.Set[Long]()
    val nDelivered = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format("graft").load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("o_orderkey").collect().map(_.getLong(0))
        nDelivered.addAndGet(ids.length)
        seen.synchronized { ids.foreach(seen += _) }
      }.start()
    try {
      q.processAllAvailable()
      val committed = orders.filter(col("o_orderkey") % 3 =!= 2)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(seen.synchronized(seen.toSet) == committed,
        s"initial replay delivered ${seen.size} of ${committed.size} rows")
      // a new commit delivers incrementally, exactly once
      t.commitAppendOcc(orders.filter(col("o_orderkey") % 3 === 2))
      q.processAllAvailable()
      val all = orders.select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(seen.synchronized(seen.toSet) == all,
        "new commit not delivered exactly once")

      // OPTIMIZE under the live stream: dataChange=false, so the
      // repacked (content-identical) files must NOT re-deliver — the
      // ROW counter is the witness (re-delivered rows carry already-
      // seen keys, so the key set alone could not catch them)
      val deliveredBefore = nDelivered.get()
      val packed = t.commitCompaction(t.committedVersions.max,
        targetBytes = 1L << 30)
      assert(packed > 1, s"compaction packed nothing (packed=$packed)")
      q.processAllAvailable()
      assert(nDelivered.get() == deliveredBefore,
        s"compaction re-delivered ${nDelivered.get() - deliveredBefore} " +
          "repacked rows through the stream")
      // ...while an append AFTER the compaction still delivers exactly
      // its own rows (the walk advanced the seen set past the repack)
      t.commitAppendOcc(orders.orderBy("o_orderkey").limit(7).select(
        (col("o_orderkey") + 95000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice")))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) ==
        all ++ all.toSeq.sorted.take(7).map(_ + 95000000L),
        "post-compaction append not delivered exactly once")
    } finally q.stop()
  }

  test("readChangeFeed stream: row-level ops per commit, snapshot as inserts, OPTIMIZE silent") {
    val (data, man) = freshDirs("cdf")
    val t = GraftTable(spark, data, man, "o_orderkey")
    val base = orders.filter(col("o_orderkey") <= 2000)
    t.create(base, 3)

    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("op", "_commit_version", "o_orderkey").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        got.synchronized { rows.foreach(got += _) }
      }.start()
    try {
      q.processAllAvailable()
      val n0 = base.count()
      assert(got.synchronized(got.size) == n0,
        s"snapshot delivered ${got.size} of $n0 rows")
      assert(got.synchronized(got.forall(c => c._1 == "insert" && c._2 == 1L)),
        "starting snapshot must deliver as insert@v1")

      // a merge delivers row-level update/insert ops stamped v=2;
      // rewritten-but-unchanged survivors do NOT deliver (cdc contract)
      val updates = base.filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      // strictly positive keys only: -0 would collide with an existing
      // identical row 0 and (correctly) drop as an unchanged survivor
      val inserts = base.filter(col("o_orderkey").between(1, 40))
        .select((-col("o_orderkey")).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      val nUpd = updates.count(); val nIns = inserts.count()
      t.commitMerge(updates.unionByName(inserts), 1)
      q.processAllAvailable()
      val d2 = got.synchronized(got.filter(_._2 == 2L).toList)
      assert(d2.count(_._1 == "update") == nUpd &&
        d2.count(_._1 == "insert") == nIns && d2.size == nUpd + nIns,
        s"merge CDF: ${d2.groupBy(_._1).view.mapValues(_.size).toMap} " +
          s"vs expected update=$nUpd insert=$nIns")

      // OPTIMIZE: dataChange=false, the change feed stays silent
      val before = got.synchronized(got.size)
      assert(t.commitCompaction(t.committedVersions.max, 1L << 30) > 1)
      q.processAllAvailable()
      assert(got.synchronized(got.size) == before,
        "compaction delivered rows through the change feed")

      // post-compaction append delivers its own inserts at v=4
      t.commitAppend(base.filter(col("o_orderkey") <= 16)
        .select((col("o_orderkey") + 97000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")), t.committedVersions.max)
      q.processAllAvailable()
      val d4 = got.synchronized(got.filter(_._3 >= 97000000L).toList)
      assert(d4.nonEmpty && d4.forall(c => c._1 == "insert" && c._2 == 4L),
        s"post-compaction append CDF wrong: ${d4.take(3)}")
    } finally q.stop()
  }

  test("readChangeFeed stream delivers a RESTORE's symmetric difference exactly once") {
    val (data, man) = freshDirs("cdf_restore")
    val t = GraftTable(spark, data, man, "o_orderkey")
    val base = orders.filter(col("o_orderkey") <= 2000)
    t.create(base, 3)

    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("op", "_commit_version", "o_orderkey").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        got.synchronized { rows.foreach(got += _) }
      }.start()
    try {
      q.processAllAvailable()
      val n0 = base.count()
      assert(got.synchronized(got.size) == n0)

      // v2: the merge a restore will undo (updates + fresh inserts)
      val updates = base.filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      val inserts = base.filter(col("o_orderkey").between(1, 40))
        .select((-col("o_orderkey")).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      val nUpd = updates.count(); val nIns = inserts.count()
      t.commitMerge(updates.unionByName(inserts), 1)
      q.processAllAvailable()

      // v3 = RESTORE to v1: the change feed sees ordinary COW churn —
      // the undone inserts deliver as DELETEs, the reverted updates as
      // UPDATEs, each exactly once (the r11/r12 open proof: cdc's
      // symmetric-difference math needs no restore special case, shown
      // through the live STREAM, not just batch cdc())
      val v = t.commitRestore(1)
      assert(v == 3, s"expected the restore to commit v=3, got $v")
      q.processAllAvailable()
      val d3 = got.synchronized(got.filter(_._2 == 3L).toList)
      assert(d3.count(_._1 == "delete") == nIns &&
        d3.count(_._1 == "update") == nUpd && d3.size == nIns + nUpd,
        s"restore CDF: ${d3.groupBy(_._1).view.mapValues(_.size).toMap} " +
          s"vs expected delete=$nIns update=$nUpd")
      // exactly once across the whole run: snapshot + merge + restore
      assert(got.synchronized(got.size) == n0 + 2 * (nUpd + nIns),
        "a change delivered twice (or was dropped) across the restore")
      // the stream's view converged back to v1's content
      assert(t.readAsOf(3).count() == n0)
    } finally q.stop()
  }

  test("writeStream.format(graft): batches become snapshot commits, exactly once across restart") {
    import spark.implicits._
    val (data, man) = freshDirs("wsink")
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_ds_wsink_src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ds_wsink_ckpt").toString

    def feed(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 10L)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def start() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("appId", "wsink-spec")
      .option("key", "id").option("data", data)
      .start(man)

    feed(0 until 40)
    feed(40 until 70)
    val q = start()
    try q.processAllAvailable() finally q.stop()

    val t = GraftTable(spark, data, man, "id")
    assert(t.committedVersions.min == 1, "empty initial snapshot missing")
    assert(t.committedVersions.max >= 3, // empty v1 + >=2 batch commits
      s"expected one commit per micro-batch, saw ${t.committedVersions}")
    assert(spark.read.format("graft").load(man).count() == 70)

    // restart on the SAME checkpoint + appId: a replayed batch is a
    // tag-detected no-op, new data still lands — exactly once overall
    feed(70 until 100)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.format("graft").load(man)
      .select("id").collect().map(_.getLong(0))
    assert(ids.length == 100 && ids.toSet == (0L until 100L).toSet,
      s"expected exactly 0..99 once each, got ${ids.length} rows")
    // the streamed table prunes like a batch one (key boxes recorded)
    val pruned = scannedFileCount(spark.read.format("graft").load(man)
      .filter(col("id") < 5))
    val all = scannedFileCount(spark.read.format("graft").load(man))
    assert(pruned < all, s"streamed commits did not gain pruning: $pruned/$all")
  }

  test("readChangeFeed startingVersion: resume from a watermark, no snapshot replay; vacuumed start loud") {
    val (data, man) = freshDirs("cdf_sv")
    val t = GraftTable(spark, data, man, "o_orderkey")
    val base = orders.filter(col("o_orderkey") <= 2000)
    t.create(base, 3)
    // v2: a merge (updates + inserts); v3: an append
    val updates = base.filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    val inserts = base.filter(col("o_orderkey").between(1, 40))
      .select((-col("o_orderkey")).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
    val (nUpd, nIns) = (updates.count(), inserts.count())
    t.commitMerge(updates.unionByName(inserts), 1)
    t.commitAppend(base.limit(10).select(
      (col("o_orderkey") + 98000000L).as("o_orderkey"),
      col("o_custkey"), col("o_totalprice")), 2)

    // start AT v2: deliver commits 2 and 3 as row-level diffs — the
    // v1 snapshot must NOT replay (that is the option's entire point:
    // a restarted consumer resumes from its watermark)
    val got = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("op", "_commit_version").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        got.synchronized { rows.foreach(got += _) }
      }.start()
    try {
      q.processAllAvailable()
      val byV = got.synchronized(got.groupBy(_._2).view.mapValues(_.size).toMap)
      assert(!byV.contains(1L), s"startingVersion=2 replayed the snapshot: $byV")
      assert(byV.get(2L).contains((nUpd + nIns).toInt), s"v2 diff wrong: $byV")
      assert(byV.get(3L).contains(10), s"v3 diff wrong: $byV")
      // the stream keeps tailing: a NEW commit still delivers
      t.commitAppend(base.limit(5).select(
        (col("o_orderkey") + 99000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice")), 3)
      q.processAllAvailable()
      assert(got.synchronized(got.count(_._2 == 4L)) == 5,
        "post-start commit not delivered")
    } finally q.stop()

    // startingVersion=1 is the v1-has-no-predecessor case: snapshot 1
    // delivers as inserts, later commits as diffs — content-complete
    val got1 = new java.util.concurrent.atomic.AtomicLong(0)
    val q1 = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got1.addAndGet(b.count()); ()
      }.start()
    try {
      q1.processAllAvailable()
      assert(got1.get() == base.count() + (nUpd + nIns) + 10 + 5,
        s"startingVersion=1 delivered ${got1.get()}")
    } finally q1.stop()

    // vacuum away v1..v2: a start needing an expired predecessor (or an
    // expired start itself) fails LOUDLY, never silently re-snapshots
    t.vacuum(keepFrom = 3, latest = t.committedVersions.max)
    val q3 = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 3)
      .load(man)
      .writeStream.foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[Exception] {
      try q3.processAllAvailable() finally q3.stop()
    }
    def full(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(full).getOrElse("")
    assert(full(e).contains("startingVersion") && full(e).contains("vacuum"),
      full(e))
    // and pairing it with the committed-rows stream (no change feed)
    // is rejected at source construction
    val e2 = intercept[Exception] {
      val qb = spark.readStream.format("graft")
        .option("startingVersion", 2).load(man)
        .writeStream.foreachBatch {
          (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
      try qb.processAllAvailable() finally qb.stop()
    }
    assert(full(e2).contains("readChangeFeed"), full(e2))
  }

  test("CDF startingVersion AHEAD of the log holds at no-progress, then delivers exactly from it") {
    val (data, man) = freshDirs("cdf_ahead")
    val t = GraftTable(spark, data, man, "o_orderkey")
    val base = orders.filter(col("o_orderkey") <= 500)
    t.create(base, 2) // latest = 1, start asks for 3
    val got = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 3)
      .load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("op", "_commit_version").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        got.synchronized { rows.foreach(got += _) }
      }.start()
    try {
      // latest(1) < startingVersion(3): the offset must HOLD — advancing
      // the checkpoint here would mark v2..v3 delivered before they
      // exist, and the catch-up would hand the consumer versions BELOW
      // its requested start (the r15 defect)
      q.processAllAvailable()
      assert(got.synchronized(got.isEmpty),
        s"nothing may deliver while latest < startingVersion: $got")
      // v2 lands — still below the requested start: still nothing
      t.commitAppend(base.limit(10).select(
        (col("o_orderkey") + 91000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice")), 1)
      q.processAllAvailable()
      assert(got.synchronized(got.isEmpty),
        s"v2 < startingVersion=3 must not deliver: $got")
      // v3 lands: delivery begins EXACTLY at startingVersion — v3's
      // diff only, no v1 snapshot replay, no v2
      t.commitAppend(base.limit(7).select(
        (col("o_orderkey") + 92000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice")), 2)
      q.processAllAvailable()
      val byV = got.synchronized(
        got.groupBy(_._2).view.mapValues(_.size).toMap)
      assert(byV.keySet == Set(3L), s"must deliver v3 and only v3: $byV")
      assert(byV(3L) == 7, s"v3 diff wrong: $byV")
    } finally q.stop()
  }

  test("streaming BY NAME: readStream.table and writeStream.toTable through the catalog") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_ds_named_stream").toString
    spark.conf.set("spark.sql.catalog.gqs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gqs.dir", s"$root/catalog")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gqs.db")

    // ---- read side: the committed-rows stream, by name ----
    val t = GraftTable(spark, s"$root/data", s"$root/man", "id")
    t.create((1L to 50L).map(i => (i, i * 2L)).toDF("id", "v"), 2)
    spark.sql(s"CREATE TABLE gqs.db.t USING graft OPTIONS (man '$root/man')")
    val seen = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.table("gqs.db.t")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("id").collect().map(_.getLong(0))
        seen.synchronized { ids.foreach(seen += _) }
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 50L).toSet,
        s"named stream initial replay delivered ${seen.size} of 50")
      t.commitAppendOcc((51L to 60L).map(i => (i, i * 2L)).toDF("id", "v"))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 60L).toSet,
        "named stream missed the new commit")
    } finally q.stop()

    // ---- read side: the CHANGE FEED, by name (reader options flow) ----
    val ops = scala.collection.mutable.ArrayBuffer[String]()
    val qc = spark.readStream
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .table("gqs.db.t")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val o = b.select("op").collect().map(_.getString(0))
        ops.synchronized { o.foreach(ops += _) }
      }.start()
    try {
      qc.processAllAvailable()
      assert(ops.synchronized(ops.size) == 10 &&
        ops.synchronized(ops.forall(_ == "insert")),
        s"named CDF stream: ${ops.take(5)} (n=${ops.size})")
    } finally qc.stop()

    // ---- write side: writeStream.toTable with exactly-once restart ----
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_ds_named_src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ds_named_ckpt").toString
    spark.sql(
      s"""CREATE TABLE gqs.db.sink (id BIGINT, v BIGINT) USING graft
         |OPTIONS (man '$root/man2', data '$root/data2', key 'id')
         |""".stripMargin)
    def feed(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 10L)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)
    // .format("graft") is required: toTable's v1 fallback insists the
    // writer's declared source match the table's provider (the same
    // contract Delta's toTable carries)
    def start() = spark.readStream
      .schema("id LONG, v LONG")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("appId", "named-sink-spec")
      .toTable("gqs.db.sink")
    feed(0 until 30)
    val qw = start()
    try qw.processAllAvailable() finally qw.stop()
    assert(spark.sql("SELECT count(*) AS c FROM gqs.db.sink").head.getLong(0)
      == 30L)
    // restart on the SAME checkpoint + appId: replays are tag-detected
    // no-ops, new data lands — exactly once overall, BY NAME
    feed(30 until 50)
    val qw2 = start()
    try qw2.processAllAvailable() finally qw2.stop()
    val ids = spark.sql("SELECT id FROM gqs.db.sink").collect()
      .map(_.getLong(0))
    assert(ids.length == 50 && ids.toSet == (0L until 50L).toSet,
      s"expected exactly 0..49 once each, got ${ids.length} rows")
  }

  test("maxFilesPerTrigger paces replay and tail; exactly once across restart mid-stream") {
    import spark.implicits._
    val (data, man) = freshDirs("rate")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ds_rate_ckpt").toString
    val t = GraftTable(spark, data, man, "id")
    // 8-file snapshot + one 2-file append
    t.create((1L to 800L).map(i => (i, i)).toDF("id", "v"), 8)
    t.commitAppend((801L to 900L).map(i => (i, i)).toDF("id", "v"), 1, 2)

    val seen = scala.collection.mutable.Set[Long]()
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    def start() = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", 3).load(man)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("id").collect().map(_.getLong(0))
        batchSizes.synchronized { batchSizes += ids.length }
        seen.synchronized { ids.foreach(seen += _) }
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 900L).toSet,
        s"paced replay delivered ${seen.size} of 900 rows")
      // 10 files at <=3 per trigger: at least 4 non-empty batches, and
      // no batch larger than 3 files' worth (3 x 100 rows)
      val sizes = batchSizes.synchronized(batchSizes.filter(_ > 0).toList)
      assert(sizes.size >= 4, s"expected paced batches, got $sizes")
      assert(sizes.forall(_ <= 300L), s"a batch exceeded 3 files: $sizes")
    } finally q.stop()

    // restart on the same checkpoint: only NEW data delivers
    t.commitAppendOcc((901L to 950L).map(i => (i, i)).toDF("id", "v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 950L).toSet,
        "restart lost or re-delivered rows")
    } finally q2.stop()

    // a compaction mid-stream still delivers nothing (dataChange=false
    // versions contribute empty fresh lists in the paced walk too)
    val q3 = start()
    try {
      val before = seen.synchronized(seen.size)
      assert(t.commitCompaction(t.committedVersions.max, 1L << 30) > 1)
      q3.processAllAvailable()
      assert(seen.synchronized(seen.size) == before,
        "paced stream re-delivered repacked rows")
    } finally q3.stop()
  }

  test("maxBytesPerTrigger paces by manifest bytes (soft max: >=1 file per trigger)") {
    import spark.implicits._
    val (data, man) = freshDirs("byterate")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ds_byterate_ckpt").toString
    val t = GraftTable(spark, data, man, "id")
    t.create((1L to 800L).map(i => (i, i)).toDF("id", "v"), 8)

    // 1-byte budget: every file exceeds it, so the soft max delivers
    // exactly ONE file per trigger — 8 deterministic 100-row batches
    val seen = scala.collection.mutable.Set[Long]()
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    def start(extra: Map[String, String]) = {
      var r = spark.readStream.format("graft")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load(man).writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = b.select("id").collect().map(_.getLong(0))
          batchSizes.synchronized { batchSizes += ids.length }
          seen.synchronized { ids.foreach(seen += _) }
        }.start()
    }
    val q = start(Map("maxBytesPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 800L).toSet,
        s"byte-paced replay delivered ${seen.size} of 800 rows")
      val sizes = batchSizes.synchronized(batchSizes.filter(_ > 0).toList)
      assert(sizes == List.fill(8)(100L),
        s"1-byte budget must deliver exactly one 100-row file per batch: $sizes")
    } finally q.stop()

    // a generous budget takes the whole tail in one trigger (the
    // budget only binds when exceeded); maxFilesPerTrigger composes —
    // the TIGHTER of the two budgets decides
    t.commitAppendOcc((801L to 1000L).map(i => (i, i)).toDF("id", "v"),
      nParts = 2)
    batchSizes.synchronized(batchSizes.clear())
    val q2 = start(Map("maxBytesPerTrigger" -> (1L << 40).toString))
    try {
      q2.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 1000L).toSet)
      val sizes = batchSizes.synchronized(batchSizes.filter(_ > 0).toList)
      assert(sizes == List(200L),
        s"a generous byte budget must take the whole 2-file tail at once: $sizes")
    } finally q2.stop()
    t.commitAppendOcc((1001L to 1200L).map(i => (i, i)).toDF("id", "v"),
      nParts = 2)
    batchSizes.synchronized(batchSizes.clear())
    val q3 = start(Map("maxBytesPerTrigger" -> (1L << 40).toString,
      "maxFilesPerTrigger" -> "1"))
    try {
      q3.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1L to 1200L).toSet)
      val sizes = batchSizes.synchronized(batchSizes.filter(_ > 0).toList)
      assert(sizes == List(100L, 100L),
        s"maxFilesPerTrigger=1 must bind under a generous byte budget: $sizes")
    } finally q3.stop()

    // misuse is loud at source construction
    val e = intercept[Exception] {
      spark.readStream.format("graft")
        .option("maxBytesPerTrigger", "0").load(man)
        .writeStream.format("noop").start().processAllAvailable()
    }
    def msg(x: Throwable): String = Option(x.getMessage).getOrElse("") +
      Option(x.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("maxBytesPerTrigger"), msg(e))
  }

  test("Trigger.AvailableNow drains the whole paced backlog, then terminates; mid-run commits wait") {
    import spark.implicits._
    val (data, man) = freshDirs("avnow")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ds_avnow_ckpt").toString
    val t = GraftTable(spark, data, man, "id")
    // 8-file snapshot + a 2-file append: a 10-file backlog
    t.create((1L to 800L).map(i => (i, i)).toDF("id", "v"), 8)
    t.commitAppendOcc((801L to 1000L).map(i => (i, i)).toDF("id", "v"),
      nParts = 2)

    val seen = scala.collection.mutable.Set[Long]()
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", 3).load(man)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = b.select("id").collect().map(_.getLong(0))
          batchSizes.synchronized { batchSizes += ids.length }
          seen.synchronized { ids.foreach(seen += _) }
        }.start()
      // AvailableNow must SELF-terminate once the fence is drained —
      // without SupportsTriggerAvailableNow, Spark's generic wrapper
      // would have captured ONE budget slice and stopped at 300 rows
      assert(q.awaitTermination(120000L),
        "AvailableNow query did not self-terminate")
    }
    run()
    assert(seen.synchronized(seen.toSet) == (1L to 1000L).toSet,
      s"AvailableNow drained ${seen.size} of the 1000-row backlog")
    val sizes = batchSizes.synchronized(batchSizes.filter(_ > 0).toList)
    assert(sizes.size >= 4 && sizes.forall(_ <= 300L),
      s"expected >=4 paced batches of <=3 files: $sizes")

    // a second run picks up exactly the rows committed since
    t.commitAppendOcc((1001L to 1100L).map(i => (i, i)).toDF("id", "v"))
    run()
    assert(seen.synchronized(seen.toSet) == (1L to 1100L).toSet,
      "second AvailableNow run lost or re-delivered rows")
  }

  test("Trigger.AvailableNow on the CDF stream drains bounded commit ranges, then terminates") {
    import spark.implicits._
    val (data, man) = freshDirs("avnowcdf")
    val t = GraftTable(spark, data, man, "id")
    t.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), 2)
    (2 to 5).foreach { k =>
      t.commitAppend((k * 1000L to k * 1000L + 9)
        .map(i => (i, i)).toDF("id", "v"), t.committedVersions.max, 1)
    }
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2)
      .option("maxVersionsPerTrigger", 1).load(man)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vsb = b.select("_commit_version").collect()
          .map(_.getLong(0)).toSet
        perBatch.synchronized { perBatch += vsb }
        ()
      }.start()
    assert(q.awaitTermination(120000L),
      "AvailableNow CDF query did not self-terminate")
    val nonEmpty = perBatch.synchronized(perBatch.filter(_.nonEmpty).toList)
    assert(nonEmpty.map(_.size).forall(_ == 1),
      s"a batch spanned multiple commits: $nonEmpty")
    assert(nonEmpty.flatten.toSet == Set(2L, 3L, 4L, 5L),
      s"commit coverage wrong: $nonEmpty")
  }

  test("CDF maxVersionsPerTrigger bounds each micro-batch's commit range") {
    import spark.implicits._
    val (data, man) = freshDirs("cdfrate")
    val t = GraftTable(spark, data, man, "id")
    t.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), 2)
    (2 to 5).foreach { k =>
      t.commitAppend((k * 1000L to k * 1000L + 9)
        .map(i => (i, i)).toDF("id", "v"), t.committedVersions.max, 1)
    }
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2)
      .option("maxVersionsPerTrigger", 1).load(man)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vsb = b.select("_commit_version").collect()
          .map(_.getLong(0)).toSet
        perBatch.synchronized { perBatch += vsb }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val nonEmpty = perBatch.synchronized(perBatch.filter(_.nonEmpty).toList)
      assert(nonEmpty.map(_.size).forall(_ == 1),
        s"a batch spanned multiple commits: $nonEmpty")
      assert(nonEmpty.flatten.toSet == Set(2L, 3L, 4L, 5L),
        s"commit coverage wrong: $nonEmpty")
    } finally q.stop()
  }

  test("writeStream.format(graft) rejects missing appId and non-append modes") {
    import spark.implicits._
    val (data, man) = freshDirs("wsink_err")
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_ds_wsinkerr_src").toString
    Seq((1L, 1L)).toDF("id", "v").write.mode("append").parquet(srcDir)
    def reader = spark.readStream
      .schema("id LONG, v LONG").parquet(srcDir)

    val noApp = intercept[Exception] {
      reader.writeStream.format("graft")
        .option("key", "id").option("data", data).start(man)
    }
    assert(noApp.getMessage.contains("appId"), noApp.getMessage)

    val badMode = intercept[Exception] {
      reader.groupBy($"id").count()
        .writeStream.format("graft").outputMode("complete")
        .option("appId", "x").option("key", "id").option("data", data)
        .start(man)
    }
    assert(badMode.getMessage.contains("append-only") ||
      badMode.getMessage.contains("Complete"), badMode.getMessage)
  }

  test("reading a non-table directory fails with a diagnosable error") {
    val bogus = java.nio.file.Files.createTempDirectory("graft_ds_bogus")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load(bogus.toString).count()
    }
    assert(e.getMessage.contains("no committed snapshots"), e.getMessage)
  }
}
