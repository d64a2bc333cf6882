package graft.table

import graft.{GraftExtensions, TestBase}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ALTER TABLE RENAME COLUMN through the logical->physical column
  * mapping (SURVEY §2B row 114): files keep the frozen physical name —
  * zero byte movement — while reads alias to the renamed logical name,
  * writes re-label batches back to the physical name, time travel
  * answers in each snapshot's own name, and the loud edges (key/stats/
  * check guards, physical-name collisions, RESTORE across a rename,
  * the raw format("graft") relation) refuse instead of serving wrong
  * bytes. */
class RenameColumnSpec extends TestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_rename").toString

  private def mkTable(root: String): GraftTable = {
    val s = spark
    import s.implicits._
    val df = (1L to 20L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "label", "amount")
    GraftTable(spark, s"$root/data", s"$root/man", "id").create(df, 2)
  }

  test("rename -> read-back, append, time travel, physical layout intact") {
    val root = freshRoot()
    val t = mkTable(root)                                  // v1
    val v2 = t.commitRenameColumn("amount", "price", 1)    // v2
    assert(v2 == 2)

    // reads speak the NEW name; values are the old column's
    val cur = t.readAsOf(2)
    assert(cur.columns.toSeq == Seq("id", "label", "price"))
    assert(cur.agg(sum("price")).head.getDouble(0) == (1 to 20).map(_ * 10.0).sum)

    // the rename moved ZERO bytes: same file list, physical footer
    // still carries the OLD name
    assert(t.files(2).sorted == t.files(1).sorted)
    val footer = spark.read.parquet(t.files(2): _*).schema.fieldNames.toSeq
    assert(footer.contains("amount") && !footer.contains("price"))

    // time travel below the rename answers in the OLD name
    val old = t.readAsOf(1)
    assert(old.columns.toSeq == Seq("id", "label", "amount"))
    assert(old.agg(sum("amount")).head.getDouble(0) == (1 to 20).map(_ * 10.0).sum)

    // appends arrive in the NEW logical name but the staged files store
    // the frozen PHYSICAL name — the layout never goes heterogeneous
    val s = spark
    import s.implicits._
    t.commitAppend(Seq((21L, "name_21", 210.0)).toDF("id", "label", "price"),
      2, 1)                                                // v3
    val mixed = t.readAsOf(3)
    assert(mixed.count() == 21)
    assert(mixed.agg(sum("price")).head.getDouble(0) ==
      (1 to 21).map(_ * 10.0).sum)
    val newFiles = t.files(3).toSet -- t.files(2).toSet
    assert(newFiles.nonEmpty)
    val newFooter = spark.read.parquet(newFiles.toSeq: _*)
      .schema.fieldNames.toSeq
    assert(newFooter.contains("amount") && !newFooter.contains("price"),
      s"appended file should store the physical name: $newFooter")
  }

  test("chained rename resolves per version; predicates and DML track " +
      "the current name") {
    val root = freshRoot()
    val t = mkTable(root)                                  // v1
    t.commitRenameColumn("amount", "price", 1)             // v2
    t.commitRenameColumn("price", "total", 2)              // v3
    assert(t.readAsOf(3).columns.toSeq == Seq("id", "label", "total"))
    assert(t.readAsOf(2).columns.toSeq == Seq("id", "label", "price"))
    assert(t.readAsOf(1).columns.toSeq == Seq("id", "label", "amount"))
    // filter by the current name answers from the old bytes
    assert(t.readAsOf(3).filter(col("total") > 150.0).count() == 5)

    // COW DELETE with a predicate ON the renamed column (the general-
    // predicate path reads MoR through the mapping)
    val nDel = t.commitDelete(Seq.empty, col("total") > 180.0, 3, 1, None)
    assert(nDel == 2) // ids 19, 20
    assert(t.readAsOf(4).agg(sum("total")).head.getDouble(0) ==
      (1 to 18).map(_ * 10.0).sum)

    // MoR DELETE on the renamed column (dmlScan path)
    val nDel2 = t.commitDeleteMor(Seq.empty, col("total") === 180.0, 4)
    assert(nDel2 == 1)
    assert(t.readAsOf(5).agg(sum("total")).head.getDouble(0) ==
      (1 to 17).map(_ * 10.0).sum)

    // cdc across the deletes speaks the CURRENT logical name
    val feed = t.cdc(3, 5)
    assert(feed.columns.contains("old_total") &&
      !feed.columns.exists(_.contains("amount")))
    assert(feed.filter(col("op") === "delete").count() == 3)
  }

  test("guards: key/stats/check refuse; collisions refuse; restore and " +
      "raw relation refuse across a rename") {
    val root = freshRoot()
    val s = spark
    import s.implicits._
    val df = (1L to 9L).map(i => (i, s"g${i % 3}", i * 1.5))
      .toDF("id", "grp", "score")
    val t = GraftTable(spark, s"$root/data", s"$root/man", "id",
      statsCols = Seq("grp")).create(df, 2)                // v1

    // table key and declared stats column refuse
    val e1 = intercept[IllegalArgumentException](
      t.commitRenameColumn("id", "pk", 1))
    assert(e1.getMessage.contains("table key"))
    val e2 = intercept[IllegalArgumentException](
      t.commitRenameColumn("grp", "bucket", 1))
    assert(e2.getMessage.contains("stats/bloom"))

    // CHECK-referenced column refuses until the constraint is unset
    t.setCheckProp("score_pos", Some("score >= 0"))
    val e3 = intercept[IllegalArgumentException](
      t.commitRenameColumn("score", "points", 1))
    assert(e3.getMessage.contains("CHECK constraint"))
    t.setCheckProp("score_pos", None)

    // logical collision refuses; self-rename refuses
    val e4 = intercept[IllegalArgumentException](
      t.commitRenameColumn("score", "grp", 1))
    assert(e4.getMessage.contains("already exists"))
    intercept[IllegalArgumentException](
      t.commitRenameColumn("score", "score", 1))

    t.commitRenameColumn("score", "points", 1)             // v2

    // the frozen physical name cannot be re-added (resurrection guard)
    // on the ALTER path...
    val e5 = intercept[IllegalArgumentException](t.commitWidenSchema(
      org.apache.spark.sql.types.StructType(
        t.versionSchema(2).get.fields :+ org.apache.spark.sql.types
          .StructField("score", org.apache.spark.sql.types.DoubleType)), 2))
    assert(e5.getMessage.contains("physically present"))
    // ...NOR through a write: a batch smuggling the frozen physical
    // name refuses at the staging door (toPhysical collision guard)
    val e6 = intercept[IllegalArgumentException](t.commitAppend(
      Seq((100L, "g1", 5.0)).toDF("id", "grp", "score"), 2, 1))
    assert(e6.getMessage.contains("frozen physical name"))

    // RESTORE across the rename refuses with the recovery named
    val e8 = intercept[IllegalArgumentException](t.commitRestore(1))
    assert(e8.getMessage.contains("RENAME COLUMN"))

    // the raw format("graft") relation refuses (it cannot alias)
    val e9 = intercept[IllegalArgumentException](
      spark.read.format("graft").load(s"$root/man").collect())
    assert(e9.getMessage.contains("renamed columns"))

    // the physical name is FROZEN FOREVER (Delta name-mode semantics):
    // even after a full rewrite + vacuum, rewritten files still store
    // it, reads still alias it, and re-adding the old name still
    // refuses — the mapping never silently collapses
    t.commitCompaction(2, 1L << 30)                        // v3 repack
    t.vacuum(3, 3)
    val footer = spark.read.parquet(t.files(3): _*).schema.fieldNames
    assert(footer.contains("score") && !footer.contains("points"),
      s"rewritten files must keep the frozen physical name: $footer")
    assert(t.readAsOf(3).columns.toSeq == Seq("id", "grp", "points"))
    val e10 = intercept[IllegalArgumentException](t.commitWidenSchema(
      org.apache.spark.sql.types.StructType(
        t.versionSchema(3).get.fields :+ org.apache.spark.sql.types
          .StructField("score", org.apache.spark.sql.types.DoubleType)), 3))
    assert(e10.getMessage.contains("physically present"))
  }

  test("a CHECK added AFTER a rename enforces against the frozen " +
      "physical bytes — never a silent NULL pass") {
    val root = freshRoot()
    val s = spark
    import s.implicits._
    val t = mkTable(root)                                  // v1
    t.commitRenameColumn("amount", "price", 1)             // v2
    t.setCheckProp("price_pos", Some("price >= 0"))
    // the violating batch arrives in the NEW name; the staged file
    // stores the PHYSICAL name — the check must map through the column
    // mapping instead of NULL-substituting a "missing" column
    val e = intercept[IllegalArgumentException](t.commitAppend(
      Seq((30L, "bad", -5.0)).toDF("id", "label", "price"), 2, 1))
    assert(e.getMessage.contains("price_pos"), e.getMessage)
    // a satisfying batch lands
    t.commitAppend(Seq((31L, "ok", 5.0)).toDF("id", "label", "price"), 2, 1)
    assert(t.readAsOf(3).count() == 21)
  }

  test("SQL surface: ALTER TABLE ... RENAME COLUMN by name, reads, " +
      "UPDATE and pruning through the catalog") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val root = freshRoot()
      s.conf.set("spark.sql.catalog.gr", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gr.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gr.db")
      s.sql(s"""CREATE TABLE gr.db.t (id BIGINT, v DOUBLE) USING graft
        |OPTIONS (man '$root/man', data '$root/data', key 'id')""".stripMargin)
      import s.implicits._
      (1L to 10L).map(i => (i, i * 2.0)).toDF("id", "v")
        .createOrReplaceTempView("src")
      s.sql("INSERT INTO gr.db.t SELECT * FROM src")
      s.sql("ALTER TABLE gr.db.t RENAME COLUMN v TO score")
      assert(s.sql("SELECT * FROM gr.db.t").columns.toSeq ==
        Seq("id", "score"))
      assert(s.sql("SELECT sum(score) AS x FROM gr.db.t").head.getDouble(0)
        == (1 to 10).map(_ * 2.0).sum)
      // key pruning is untouched by the rename (boxes bind to the key)
      assert(s.sql("SELECT score FROM gr.db.t WHERE id = 3")
        .head.getDouble(0) == 6.0)
      // SQL UPDATE through the renamed name
      s.sql("UPDATE gr.db.t SET score = score + 1 WHERE id <= 2")
      assert(s.sql("SELECT sum(score) AS x FROM gr.db.t").head.getDouble(0)
        == (1 to 10).map(_ * 2.0).sum + 2)
      // SQL DELETE with a predicate on the renamed column
      s.sql("DELETE FROM gr.db.t WHERE score > 19")
      assert(s.sql("SELECT count(*) AS c FROM gr.db.t").head.getLong(0) == 9)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("a stream over a renamed table delivers the NEW logical name " +
      "with the old bytes — initial replay and incremental commits") {
    val root = freshRoot()
    val s = spark
    import s.implicits._
    val t = mkTable(root)                                  // v1
    t.commitRenameColumn("amount", "price", 1)             // v2
    val seen = scala.collection.mutable.Map[Long, Double]()
    val q = spark.readStream.format("graft").load(s"$root/man")
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // the source schema must speak the CURRENT logical name while
          // the files store the frozen physical one (readLogical)
          assert(b.columns.toSeq == Seq("id", "label", "price"))
          b.select("id", "price").collect().foreach(r =>
            seen.synchronized { seen(r.getLong(0)) = r.getDouble(1) })
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toMap) ==
        (1L to 20L).map(i => i -> i * 10.0).toMap)
      // an incremental post-rename commit delivers under the new name
      t.commitAppend(Seq((21L, "x", 210.0)).toDF("id", "label", "price"),
        2, 1)
      q.processAllAvailable()
      assert(seen.synchronized(seen(21L)) == 210.0)
    } finally q.stop()
  }

  test("SQL MERGE INTO a renamed table: assignments through the new " +
      "name update the old bytes") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val root = freshRoot()
      s.conf.set("spark.sql.catalog.gm", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gm.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gm.db")
      s.sql(s"""CREATE TABLE gm.db.t (id BIGINT, v DOUBLE) USING graft
        |OPTIONS (man '$root/man', data '$root/data', key 'id')"""
        .stripMargin)
      import s.implicits._
      (1L to 10L).map(i => (i, i * 2.0)).toDF("id", "v")
        .createOrReplaceTempView("m_src0")
      s.sql("INSERT INTO gm.db.t SELECT * FROM m_src0")
      s.sql("ALTER TABLE gm.db.t RENAME COLUMN v TO score")
      Seq((1L, 100.0), (11L, 22.0)).toDF("id", "score")
        .createOrReplaceTempView("m_src")
      s.sql(
        """MERGE INTO gm.db.t AS tgt USING m_src AS src ON tgt.id = src.id
          |WHEN MATCHED THEN UPDATE SET tgt.score = src.score
          |WHEN NOT MATCHED THEN INSERT (id, score) VALUES (id, score)
          |""".stripMargin)
      val got = s.sql("SELECT id, score FROM gm.db.t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got == ((2L to 10L).map(i => i -> i * 2.0).toMap ++
        Map(1L -> 100.0, 11L -> 22.0)), got)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("createEmpty replay never clobbers ALTER-recorded props — the " +
      "rename mapping survives an idempotent re-create") {
    val root = freshRoot()
    val t = mkTable(root)                                  // v1
    t.commitRenameColumn("amount", "price", 1)             // v2
    // the streaming-ingest idempotent start re-invokes createEmpty on
    // the same declaration; the existing props file (carrying the
    // mapping) is authoritative — a rewrite from the handle's bare
    // declaration would silently un-map the renamed column
    GraftTable(spark, s"$root/data", s"$root/man", "id")
      .createEmpty(Some(t.versionSchema(2).get))
    val got = t.readAsOf(2)
    assert(got.columns.toSeq == Seq("id", "label", "price"))
    assert(got.agg(sum("price")).head.getDouble(0) ==
      (1 to 20).map(_ * 10.0).sum)
  }

  test("shallow clone carries the composed mapping; clone reads and " +
      "appends under the renamed name") {
    val root = freshRoot()
    val t = mkTable(root)                                  // v1
    t.commitRenameColumn("amount", "price", 1)             // v2
    val c = t.shallowClone(2, s"$root/c_data", s"$root/c_man")
    val got = c.readAsOf(1)
    assert(got.columns.toSeq == Seq("id", "label", "price"))
    assert(got.agg(sum("price")).head.getDouble(0) ==
      (1 to 20).map(_ * 10.0).sum)
    val s = spark
    import s.implicits._
    c.commitAppend(Seq((21L, "x", 210.0)).toDF("id", "label", "price"), 1, 1)
    assert(c.readAsOf(2).agg(sum("price")).head.getDouble(0) ==
      (1 to 21).map(_ * 10.0).sum)
    // the clone's new file also stores the frozen physical name
    val fresh = c.files(2).toSet -- c.files(1).toSet
    val footer = spark.read.parquet(fresh.toSeq: _*).schema.fieldNames.toSeq
    assert(footer.contains("amount") && !footer.contains("price"))
  }

  // ---- r21 ordering fix (ADVICE r20 medium #2) --------------------

  test("dangling rename event (crash residue before the commit) is " +
      "inert: reads unaffected, later ADD COLUMN of the target name " +
      "never maps to the old bytes") {
    val root = freshRoot()
    val t = mkTable(root) // v1: (id, label, amount)
    // simulate the crash window the inverted ordering leaves: the
    // event line lands, the manifest commit never does
    val props = new org.apache.hadoop.fs.Path(s"$root/man", "_table_props")
    val fs = props.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(props)
    val txt = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      bos.toString("UTF-8")
    } finally in.close()
    val out = fs.create(props, true)
    try out.write((txt + "rename.2.0=amount:price\n" +
      "schema_detached=true\n").getBytes("UTF-8"))
    finally out.close()
    // reads still answer the OLD schema with the right values
    val cur = t.readAsOf(1)
    assert(cur.columns.toSeq == Seq("id", "label", "amount"))
    assert(cur.agg(sum("amount")).head.getDouble(0) ==
      (1 to 20).map(_ * 10.0).sum)
    // a LATER legitimate column under the failed target name reads its
    // OWN values (NULL-backfilled), never the old 'amount' bytes
    val sch = org.apache.spark.sql.types.StructType(
      t.versionSchema(1).get.fields :+
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DoubleType))
    val v2 = t.commitWidenSchema(sch, 1)
    val widened = t.readAsOf(v2)
    assert(widened.columns.toSeq == Seq("id", "label", "amount", "price"))
    assert(widened.filter(col("price").isNotNull).count() == 0)
    assert(widened.agg(sum("amount")).head.getDouble(0) ==
      (1 to 20).map(_ * 10.0).sum)
  }

  test("legacy table without the schema_detached flag: ALTER ADD " +
      "COLUMN still refuses to resurrect un-purged bytes " +
      "(ADVICE r20 medium #1)") {
    val root = freshRoot()
    val t = mkTable(root) // v1: (id, label, amount)
    val v2 = t.commitNarrowSchema(Seq("amount"), 1)
    // simulate a pre-flag legacy table: strip the detach flag the
    // modern DROP wrote
    val props = new org.apache.hadoop.fs.Path(s"$root/man", "_table_props")
    val fs = props.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(props)
    val txt = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      bos.toString("UTF-8")
    } finally in.close()
    val out = fs.create(props, true)
    try out.write(txt.linesIterator
      .filterNot(_.startsWith("schema_detached="))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // re-adding the dropped name must refuse: its bytes are un-purged
    val sch = org.apache.spark.sql.types.StructType(
      t.versionSchema(v2).get.fields :+
        org.apache.spark.sql.types.StructField("amount",
          org.apache.spark.sql.types.DoubleType))
    val e = intercept[IllegalArgumentException] {
      t.commitWidenSchema(sch, v2)
    }
    assert(e.getMessage.contains("resurrect"))
  }
}
