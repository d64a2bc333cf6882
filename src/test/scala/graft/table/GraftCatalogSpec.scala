package graft.table

import graft.{GraftExtensions, Tables, TestBase}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Name-addressed tables through the DSv2 [[GraftCatalog]]: CREATE
  * TABLE / SELECT / INSERT / time travel on `graft.<ns>.<name>`
  * identifiers. The production read path (extensions installed) must
  * file-prune exactly like `graft_snapshot`; the extensions-free
  * fallback must stay correct; writes are the same OCC commits as
  * `format("graft")`. */
class GraftCatalogSpec extends TestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_catalog").toString

  /** Files referenced by the optimized plan's parquet relation(s). */
  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.toSeq
        case _ => Seq.empty[String]
      }
    }.flatten

  private def withExtSession(f: SparkSession => Unit): Unit = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(s2) finally ()
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("lifecycle: CREATE, INSERT (OCC append), pruned SELECT, time travel, OVERWRITE") {
    withExtSession { s =>
      val root = freshRoot()
      s.conf.set("spark.sql.catalog.g1", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.g1.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g1.db")
      s.sql(
        s"""CREATE TABLE g1.db.orders (o_orderkey BIGINT, o_custkey BIGINT,
           |  o_totalprice DOUBLE) USING graft
           |OPTIONS (man '$root/man', data '$root/data', key 'o_orderkey')
           |""".stripMargin)
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      o.createOrReplaceTempView("src_orders")
      s.sql("INSERT INTO g1.db.orders SELECT * FROM src_orders")
      // v1 = empty create, v2 = the insert
      assert(s.sql("SELECT count(*) AS c FROM g1.db.orders").head.getLong(0)
        == o.count())

      // the named read PRUNES like graft_snapshot: file-count proof
      val all = scannedFiles(s.sql("SELECT * FROM g1.db.orders"))
      assert(all.size >= 4, s"expected a multi-file layout, got ${all.size}")
      val lo = o.agg(min("o_orderkey")).head.getLong(0)
      val pruned = scannedFiles(s.sql(
        s"SELECT * FROM g1.db.orders WHERE o_orderkey BETWEEN $lo AND ${lo + 10}"))
      assert(pruned.nonEmpty && pruned.size < all.size,
        s"named read must file-prune: ${pruned.size} of ${all.size}")

      // a second INSERT is an OCC append; VERSION AS OF sees each state
      s.sql("INSERT INTO g1.db.orders SELECT o_orderkey + 10000000, " +
        "o_custkey, o_totalprice FROM g1.db.orders VERSION AS OF 2")
      assert(s.sql("SELECT count(*) AS c FROM g1.db.orders").head.getLong(0)
        == 2 * o.count())
      assert(s.sql("SELECT count(*) AS c FROM g1.db.orders VERSION AS OF 2")
        .head.getLong(0) == o.count())
      assert(s.sql("SELECT count(*) AS c FROM g1.db.orders VERSION AS OF 1")
        .head.getLong(0) == 0L)

      // TIMESTAMP AS OF: resolve to the version committed at that time
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "o_orderkey")
      val t2 = new java.sql.Timestamp(tbl.commitTimeOf(2)).toString
      assert(s.sql(
        s"SELECT count(*) AS c FROM g1.db.orders TIMESTAMP AS OF '$t2'")
        .head.getLong(0) == o.count())

      // INSERT OVERWRITE recreates the table
      o.limit(100).createOrReplaceTempView("src_orders_100")
      s.sql("INSERT OVERWRITE g1.db.orders " +
        "SELECT o_orderkey, o_custkey, o_totalprice FROM src_orders_100")
      assert(s.sql("SELECT count(*) AS c FROM g1.db.orders").head.getLong(0)
        == 100L)
    }
  }

  test("registering an EXISTING table needs only the manifest path") {
    withExtSession { s =>
      val root = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_orderpriority")
      GraftTable(s, s"$root/data", s"$root/man", "o_orderkey").create(o, 4)
      s.conf.set("spark.sql.catalog.g2", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.g2.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g2.default")
      s.sql(s"CREATE TABLE g2.default.ord USING graft OPTIONS (man '$root/man')")
      assert(s.sql("SELECT count(*) AS c FROM g2.default.ord").head.getLong(0)
        == o.count())
      assert(s.sql("SHOW TABLES IN g2.default").collect()
        .map(_.getString(1)).contains("ord"))
      // DROP removes the NAME only — the table itself stays readable
      s.sql("DROP TABLE g2.default.ord")
      intercept[Exception] { s.sql("SELECT * FROM g2.default.ord").collect() }
      assert(GraftTable(s, s"$root/data", s"$root/man", "o_orderkey")
        .readAsOf(1).count() == o.count(),
        "dropping the catalog entry must not touch the table")
    }
  }

  test("a MoR (deletion-vector) snapshot reads correctly through its NAME") {
    withExtSession { s =>
      val root = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "o_orderkey")
      tbl.create(o, 4)
      tbl.commitMergeMor(o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2), 1, 2)
      s.conf.set("spark.sql.catalog.g3", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.g3.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g3.default")
      s.sql(s"CREATE TABLE g3.default.t USING graft OPTIONS (man '$root/man')")
      assert(s.sql("SELECT count(*) AS c FROM g3.default.t").head.getLong(0)
        == o.count(), "masked rows leaked through the named MoR read")
      val doubled = s.sql(
        "SELECT count(*) AS c FROM g3.default.t WHERE o_orderkey % 7 = 0 " +
          "AND o_totalprice = 2 * o_totalprice / 2").head.getLong(0)
      assert(doubled == o.filter(col("o_orderkey") % 7 === 0).count())
    }
  }

  /** A session WITHOUT the extensions — the V1Scan fallback path. */
  private def withBareSession(f: SparkSession => Unit): Unit = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]").getOrCreate()
      try f(s2) finally ()
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("extensions-FREE sessions still read and write correctly (V1 fallback)") {
    withBareSession { s =>
      val root = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey")
      GraftTable(s, s"$root/data", s"$root/man", "o_orderkey").create(o, 4)
      s.conf.set("spark.sql.catalog.g4", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.g4.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g4.default")
      s.sql(s"CREATE TABLE g4.default.t USING graft OPTIONS (man '$root/man')")
      assert(s.sql(
        "SELECT count(*) AS c FROM g4.default.t WHERE o_orderkey < 1000")
        .head.getLong(0) == o.filter(col("o_orderkey") < 1000).count())
      s.sql("INSERT INTO g4.default.t " +
        "SELECT o_orderkey + 5000000, o_custkey FROM g4.default.t")
      assert(s.sql("SELECT count(*) AS c FROM g4.default.t").head.getLong(0)
        == 2 * o.count())
      // UPDATE/MERGE are extension-compiled (the Delta contract): a
      // bare session fails with Spark's own unsupported-operation error
      val e = intercept[Exception] {
        s.sql("UPDATE g4.default.t SET o_custkey = 1 WHERE o_orderkey = 1")
          .collect()
      }
      assert(fullMsg(e).contains("UPDATE"), fullMsg(e))
    }
  }

  private def fullMsg(t: Throwable): String =
    Option(t.getMessage).getOrElse("") +
      Option(t.getCause).map(fullMsg).getOrElse("")

  test("re-pointing spark.sql.catalog.<n>.dir mid-session is honored (no cached-plugin staleness)") {
    withExtSession { s =>
      val rootA = freshRoot()
      val rootB = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey")
      GraftTable(s, s"$rootA/data", s"$rootA/man", "o_orderkey")
        .create(o, 2)
      GraftTable(s, s"$rootB/data", s"$rootB/man", "o_orderkey")
        .create(o.filter(col("o_orderkey") % 5 === 0), 2)
      val nA = o.count()
      val nB = o.filter(col("o_orderkey") % 5 === 0).count()
      s.conf.set("spark.sql.catalog.g6", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.g6.dir", s"$rootA/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g6.default")
      s.sql(s"CREATE TABLE g6.default.t USING graft OPTIONS (man '$rootA/man')")
      // instantiate + cache the plugin under registry A
      assert(s.sql("SELECT count(*) AS c FROM g6.default.t").head.getLong(0)
        == nA)
      // RE-POINT the dir: Spark's CatalogManager keeps the SAME cached
      // plugin instance, so the registry dir must resolve from the live
      // conf (r12's bench crash: a captured-once dir silently kept every
      // read and write on the old registry)
      s.conf.set("spark.sql.catalog.g6.dir", s"$rootB/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g6.default")
      s.sql(s"CREATE TABLE g6.default.t USING graft OPTIONS (man '$rootB/man')")
      assert(s.sql("SELECT count(*) AS c FROM g6.default.t").head.getLong(0)
        == nB, "the re-pointed registry was not honored")
      // and back: registry A still holds its own mapping, untouched
      s.conf.set("spark.sql.catalog.g6.dir", s"$rootA/catalog")
      assert(s.sql("SELECT count(*) AS c FROM g6.default.t").head.getLong(0)
        == nA)
      // TIMESTAMP AS OF before the first commit fails loudly
      val e = intercept[Exception] {
        s.sql("SELECT * FROM g6.default.t TIMESTAMP AS OF " +
          "'1970-01-02 00:00:00'").collect()
      }
      assert(fullMsg(e).contains("no snapshot committed at or before"),
        fullMsg(e))
    }
  }

  test("name registration gates on atomic-exclusive-create, same declaration as the pointer store") {
    withExtSession { s =>
      val hc = s.sparkContext.hadoopConfiguration
      hc.set("fs.broken.impl", classOf[BrokenRenameFileSystem].getName)
      val broken = "broken:" +
        java.nio.file.Files.createTempDirectory("graft_cat_gate").toString
      val root = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey").filter(col("o_orderkey") < 2000)
      GraftTable(s, s"$root/data", s"$root/man", "o_orderkey").create(o, 1)
      val prev = s.conf.getOption("spark.graft.logstore.pointer.allowSchemes")
      s.conf.unset("spark.graft.logstore.pointer.allowSchemes")
      try {
        s.conf.set("spark.sql.catalog.g7", classOf[GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.g7.dir", s"$broken/catalog")
        s.sql("CREATE NAMESPACE IF NOT EXISTS g7.default")
        // the `.tbl` exclusive create arbitrates name races — on a
        // scheme not known to provide atomic create it must fail LOUDLY
        // (two racing CREATEs could both register), with the same
        // allowSchemes escape hatch as the pointer log store
        val e = intercept[Exception] {
          s.sql(s"CREATE TABLE g7.default.t USING graft OPTIONS (man '$root/man')")
        }
        assert(fullMsg(e).contains("ATOMIC exclusive create") &&
          fullMsg(e).contains("allowSchemes=broken"), fullMsg(e))
        // declaring the scheme (verified store) unlocks registration
        s.conf.set("spark.graft.logstore.pointer.allowSchemes", "broken")
        s.sql(s"CREATE TABLE g7.default.t USING graft OPTIONS (man '$root/man')")
        assert(s.sql("SELECT count(*) AS c FROM g7.default.t")
          .head.getLong(0) == o.count())
      } finally prev match {
        case Some(v) =>
          s.conf.set("spark.graft.logstore.pointer.allowSchemes", v)
        case None =>
          s.conf.unset("spark.graft.logstore.pointer.allowSchemes")
      }
    }
  }

  test("misuse is loud: no dir conf, missing options, writes to pinned versions") {
    withExtSession { s =>
      val root = freshRoot()
      s.conf.set("spark.sql.catalog.gbad", classOf[GraftCatalog].getName)
      // no .dir conf
      val e1 = intercept[Exception] {
        s.sql("SELECT * FROM gbad.default.x").collect()
      }
      assert(e1.getMessage.contains("dir") || e1.getCause != null)
      s.conf.set("spark.sql.catalog.g5", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.g5.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS g5.default")
      // creating a NEW table without key/data
      val e2 = intercept[Exception] {
        s.sql(s"CREATE TABLE g5.default.t USING graft OPTIONS (man '$root/man')")
      }
      assert(e2.getMessage.contains("key") || e2.getMessage.contains("man"),
        e2.getMessage)
      // unknown table
      intercept[Exception] { s.sql("SELECT * FROM g5.default.nope").collect() }
    }
  }

  test("SQL row-level DELETE by name: key range, non-key predicate, MoR, no-op, truncate") {
    withExtSession { s =>
      val root = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      // o_orderpriority declared as a STATS column: the non-key DELETE
      // below must rewrite only its envelope's files
      GraftTable(s, s"$root/data", s"$root/man", "o_orderkey",
        statsCols = Seq("o_custkey")).create(o, 6)
      s.conf.set("spark.sql.catalog.gd", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gd.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gd.db")
      s.sql(s"CREATE TABLE gd.db.t USING graft OPTIONS (man '$root/man')")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "o_orderkey",
        statsCols = Seq("o_custkey"))

      // 1. key-range DELETE — the standard Delta spelling, by name
      s.sql("DELETE FROM gd.db.t WHERE o_orderkey BETWEEN 1000 AND 2999")
      val expect1 = o.filter(!col("o_orderkey").between(1000, 2999))
      assert(s.sql("SELECT count(*) AS c FROM gd.db.t").head.getLong(0)
        == expect1.count())
      // only the envelope's files were rewritten: v1 entries outside the
      // doomed range survive into v2 BY NAME (their files untouched)
      val v1Files = tbl.files(1).toSet
      val v2Files = tbl.files(2).toSet
      assert((v1Files & v2Files).nonEmpty,
        "a key-range delete must carry the untouched files forward")

      // 2. general predicate on a NON-key column (disjunct range +
      // modulo residual): correct rows gone, count matches
      s.sql("DELETE FROM gd.db.t WHERE o_custkey > 600 AND o_custkey % 2 = 0")
      val expect2 = expect1.filter(
        !(col("o_custkey") > 600 && col("o_custkey") % 2 === 0))
      assert(s.sql("SELECT count(*) AS c FROM gd.db.t").head.getLong(0)
        == expect2.count())
      assert(s.sql(
        "SELECT count(*) AS c FROM gd.db.t " +
          "WHERE o_custkey > 600 AND o_custkey % 2 = 0").head.getLong(0)
        == 0L)

      // 3. a predicate matching NO rows burns no version
      val before = tbl.committedVersions.max
      s.sql("DELETE FROM gd.db.t WHERE o_orderkey = -42")
      assert(tbl.committedVersions.max == before,
        "a no-match DELETE must not burn a version")

      // 4. DELETE on a MoR snapshot: masked rows neither resurrect nor
      // count — mask every %7 key with a DV, then delete a range
      val mor = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1)
      tbl.commitMergeMor(mor, tbl.committedVersions.max, 2)
      val live = s.sql("SELECT count(*) AS c FROM gd.db.t").head.getLong(0)
      s.sql("DELETE FROM gd.db.t WHERE o_orderkey >= 9000")
      val liveNow = s.sql("SELECT count(*) AS c FROM gd.db.t").head.getLong(0)
      val doomed = s.sql(
        s"SELECT count(*) AS c FROM graft_snapshot('$root/man', " +
          s"${tbl.committedVersions.max - 1}) WHERE o_orderkey >= 9000")
        .head.getLong(0)
      assert(liveNow == live - doomed,
        s"MoR delete drift: $live - $doomed != $liveNow")

      // 5. unconditional DELETE = zero-entry commit (truncate), schema kept
      s.sql("DELETE FROM gd.db.t")
      assert(s.sql("SELECT count(*) AS c FROM gd.db.t").head.getLong(0) == 0L)
      assert(s.sql("SELECT * FROM gd.db.t").schema.fieldNames
        .sameElements(Array("o_orderkey", "o_orderpriority", "o_custkey")))
      // old versions still time-travel
      assert(s.sql("SELECT count(*) AS c FROM gd.db.t VERSION AS OF 2")
        .head.getLong(0) == expect1.count())
    }
  }

  test("DELETE plans from the manifest: only the predicate's envelope is rewritten") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      // 4 files of 250 keys each; delete a slice inside ONE file's box
      val df = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 4)
      s.conf.set("spark.sql.catalog.gdp", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdp.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gdp.db")
      s.sql(s"CREATE TABLE gdp.db.t USING graft OPTIONS (man '$root/man')")
      val v1 = tbl.files(1).toSet
      assert(v1.size == 4, s"expected 4 files, got ${v1.size}")
      s.sql("DELETE FROM gdp.db.t WHERE id BETWEEN 10 AND 20")
      val v2 = tbl.files(2).toSet
      assert((v1 & v2).size == 3,
        s"exactly one file's box intersects [10,20] — ${
          (v1 & v2).size} of 4 carried forward")
      assert(s.sql("SELECT count(*) AS c FROM gdp.db.t").head.getLong(0)
        == 989L)
    }
  }

  test("atomic CTAS: CREATE TABLE ... AS SELECT registers the name only after the write") {
    withExtSession { s =>
      val root = freshRoot()
      val o = Tables.load(s, sfDir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      o.createOrReplaceTempView("ctas_src")
      s.conf.set("spark.sql.catalog.gc", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gc.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gc.db")
      s.sql(
        s"""CREATE TABLE gc.db.t USING graft
           |OPTIONS (man '$root/man', data '$root/data', key 'o_orderkey')
           |AS SELECT * FROM ctas_src WHERE o_orderkey % 3 = 0""".stripMargin)
      val expect = o.filter(col("o_orderkey") % 3 === 0).count()
      assert(s.sql("SELECT count(*) AS c FROM gc.db.t").head.getLong(0)
        == expect)
      // the physical table is real: prunable, time-travelable
      assert(s.sql("SELECT count(*) AS c FROM gc.db.t VERSION AS OF 2")
        .head.getLong(0) == expect)
      // CTAS onto a TAKEN name fails and leaves the table untouched
      val e = intercept[Exception] {
        s.sql(s"""CREATE TABLE gc.db.t USING graft
             |OPTIONS (man '$root/man2', data '$root/data2', key 'o_orderkey')
             |AS SELECT * FROM ctas_src""".stripMargin)
      }
      assert(fullMsg(e).toLowerCase.contains("exists"), fullMsg(e))
      assert(s.sql("SELECT count(*) AS c FROM gc.db.t").head.getLong(0)
        == expect)
      // CREATE OR REPLACE on a taken name: the loud two-step spelling
      // (an atomic in-place replace would need a second manifest
      // location; never pretend)
      val er = intercept[Exception] {
        s.sql(s"""CREATE OR REPLACE TABLE gc.db.t USING graft
             |OPTIONS (man '$root/man3', data '$root/data3',
             |  key 'o_orderkey')
             |AS SELECT * FROM ctas_src""".stripMargin)
      }
      assert(fullMsg(er).contains("REPLACE TABLE is not supported"),
        fullMsg(er))
      // a FAILED CTAS (NULL key rejected by the stats scan) leaves NO
      // registered name and reclaims its fresh physical dirs
      s.sql("SELECT CAST(NULL AS BIGINT) AS k, 'x' AS v")
        .createOrReplaceTempView("ctas_bad")
      intercept[Exception] {
        s.sql(s"""CREATE TABLE gc.db.bad USING graft
             |OPTIONS (man '$root/badman', data '$root/baddata', key 'k')
             |AS SELECT * FROM ctas_bad""".stripMargin)
      }
      intercept[Exception] { s.sql("SELECT * FROM gc.db.bad").collect() }
      assert(!new java.io.File(s"$root/badman").exists(),
        "aborted CTAS must reclaim its fresh manifest dir")
    }
  }

  test("CTAS never destroys pre-existing bytes: non-empty target refused; abort-over-empty keeps the dir") {
    withExtSession { s =>
      val root = freshRoot()
      s.conf.set("spark.sql.catalog.gcs", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gcs.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcs.db")

      // a pre-existing NON-EMPTY target dir: refused at stageCreate
      // (BEFORE any write), its contents untouched, no name registered
      val pre = new java.io.File(s"$root/predata"); pre.mkdirs()
      val precious = new java.io.File(pre, "precious.txt")
      val w = new java.io.FileWriter(precious)
      try w.write("do not delete") finally w.close()
      s.sql("SELECT 1L AS k, 'x' AS v").createOrReplaceTempView("ctas17")
      val e = intercept[Exception] {
        s.sql(s"""CREATE TABLE gcs.db.t USING graft
             |OPTIONS (man '$root/man', data '$root/predata', key 'k')
             |AS SELECT * FROM ctas17""".stripMargin)
      }
      assert(fullMsg(e).contains("not empty"), fullMsg(e))
      assert(precious.exists, "pre-existing contents must survive")
      intercept[Exception] { s.sql("SELECT * FROM gcs.db.t").collect() }

      // an ABORTED CTAS (NULL key rejected) over a pre-existing EMPTY
      // dir: only the CTAS's own contents reclaimed, the dir itself —
      // not this CTAS's to delete — survives; the fresh man dir goes
      // wholesale
      val emptyDir = new java.io.File(s"$root/emptydata"); emptyDir.mkdirs()
      s.sql("SELECT CAST(NULL AS BIGINT) AS k, 'x' AS v")
        .createOrReplaceTempView("ctas17bad")
      intercept[Exception] {
        s.sql(s"""CREATE TABLE gcs.db.bad USING graft
             |OPTIONS (man '$root/badman', data '$root/emptydata', key 'k')
             |AS SELECT * FROM ctas17bad""".stripMargin)
      }
      assert(emptyDir.exists,
        "a pre-existing (empty) target dir must survive abort")
      assert(Option(emptyDir.listFiles).forall(_.isEmpty),
        "the CTAS's own staged files must be reclaimed")
      assert(!new java.io.File(s"$root/badman").exists,
        "a dir the CTAS created fresh is reclaimed wholesale")

      // TOCTOU guard: from a dir the CTAS did NOT create, abort may
      // reclaim only graft-shaped names — a foreign file a concurrent
      // actor wrote after the emptiness probe must survive
      assert(StagedGraftTable.graftOwned("v=3"))
      assert(StagedGraftTable.graftOwned("_tmp_v2_1"))
      assert(StagedGraftTable.graftOwned("_table_props"))
      assert(StagedGraftTable.graftOwned("part-00000-abc.snappy.parquet"))
      assert(StagedGraftTable.graftOwned("dv-1a2b3c4d.parquet"))
      assert(!StagedGraftTable.graftOwned("precious.txt"))
      assert(!StagedGraftTable.graftOwned("unrelated.parquet"))
      assert(!StagedGraftTable.graftOwned("data"))
    }
  }

  test("a transient probe failure during adoption PROPAGATES — never adopts a possibly-healthy table") {
    withExtSession { s =>
      val root = freshRoot()
      s.conf.set("spark.sql.catalog.gtp", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gtp.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gtp.db")
      // a registered name whose manifest the probe CANNOT read (the
      // filesystem itself fails to load — a stand-in for any flaky
      // object-store read): neither provably crashed nor provably
      // healthy, so adoption must not run
      val ns = new java.io.File(s"$root/catalog/db"); ns.mkdirs()
      val tbl = new java.io.File(s"$root/catalog/db/t.tbl")
      val reg = new java.io.FileWriter(tbl)
      try reg.write("man=unknownfs17://host/man\n") finally reg.close()
      assert(tbl.setLastModified(System.currentTimeMillis() - 3600 * 1000L))
      val before = scala.io.Source.fromFile(tbl).mkString
      val e = intercept[Exception] {
        s.sql(s"""CREATE TABLE gtp.db.t (id BIGINT, v BIGINT) USING graft
             |OPTIONS (man '$root/man', data '$root/data', key 'id')
             |""".stripMargin)
      }
      // the probe error surfaces (pre-fix: getOrElse(true) classified it
      // as "provably crashed" and DELETED the healthy registration)
      assert(fullMsg(e).toLowerCase.contains("unknownfs17") ||
        fullMsg(e).toLowerCase.contains("scheme"), fullMsg(e))
      assert(tbl.exists && scala.io.Source.fromFile(tbl).mkString == before,
        "the registration must survive a transient probe failure")
    }
  }

  test("ALTER TABLE ADD COLUMN widens the recorded schema; old files NULL-backfill") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create((1L to 100L).map(i => (i, i * 2)).toDF("id", "v"), 2)
      s.conf.set("spark.sql.catalog.ga", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.ga.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS ga.db")
      s.sql(s"CREATE TABLE ga.db.t USING graft OPTIONS (man '$root/man')")
      s.sql("ALTER TABLE ga.db.t ADD COLUMN note STRING")
      // widened by name; existing files read NULL (q103 semantics)
      val rows = s.sql("SELECT id, v, note FROM ga.db.t WHERE id <= 3")
        .collect()
      assert(rows.length == 3 && rows.forall(_.isNullAt(2)))
      // the widening is a dataChange=false commit: v2, layout-identical
      assert(tbl.committedVersions == Seq(1, 2) && !tbl.dataChange(2))
      assert(tbl.files(2) == tbl.files(1))
      // an appended batch CARRYING the column round-trips it
      (101L to 110L).map(i => (i, i * 2, s"n$i")).toDF("id", "v", "note")
        .createOrReplaceTempView("alter_more")
      s.sql("INSERT INTO ga.db.t SELECT * FROM alter_more")
      assert(s.sql("SELECT count(*) AS c FROM ga.db.t WHERE note IS NOT NULL")
        .head.getLong(0) == 10L)
      // misuse is loud: duplicate column, non-ADD changes
      val e1 = intercept[Exception] {
        s.sql("ALTER TABLE ga.db.t ADD COLUMN v BIGINT")
      }
      assert(fullMsg(e1).contains("already exists"), fullMsg(e1))
      // RENAME COLUMN is supported since row 114 (RenameColumnSpec);
      // other column ALTERs stay loudly unsupported — a comment change
      // reaches the catalog's catch-all (retyping is rejected by Spark's
      // own analysis even earlier)
      val e2 = intercept[Exception] {
        s.sql("ALTER TABLE ga.db.t ALTER COLUMN v COMMENT 'nope'")
      }
      assert(fullMsg(e2).contains("ADD COLUMN"), fullMsg(e2))
    }
  }

  test("ALTER TABLE DROP COLUMN narrows metadata-only; reads clip; guards hold") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id",
        statsCols = Seq("grp"))
      tbl.create((1L to 100L).map(i => (i, i % 5, s"x$i", i * 2))
        .toDF("id", "grp", "junk", "v"), 2)
      s.conf.set("spark.sql.catalog.gd", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gd.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gd.db")
      s.sql(s"CREATE TABLE gd.db.t USING graft OPTIONS (man '$root/man')")
      s.sql("ALTER TABLE gd.db.t DROP COLUMN junk")
      // metadata-only: dataChange=false, layout-identical — no byte moved
      assert(tbl.committedVersions == Seq(1, 2) && !tbl.dataChange(2))
      assert(tbl.files(2) == tbl.files(1))
      // reads clip the physical column away
      assert(!s.table("gd.db.t").columns.contains("junk"))
      assert(s.sql("SELECT CAST(sum(v) AS BIGINT) AS c FROM gd.db.t")
        .head.getLong(0) == (1L to 100L).map(_ * 2).sum)
      // time travel still reads the pre-drop shape
      assert(tbl.readAsOf(1).columns.contains("junk"))
      // post-drop appends land in the NARROWED shape
      Seq((101L, 1L, 202L)).toDF("id", "grp", "v")
        .createOrReplaceTempView("drop_more")
      s.sql("INSERT INTO gd.db.t SELECT * FROM drop_more")
      assert(s.sql("SELECT count(*) AS c FROM gd.db.t").head.getLong(0)
        == 101L)
      // a REWRITE physically purges the column (REORG PURGE for free):
      // compaction re-stages through the recorded schema
      // guards: the key, a declared stats column, an unknown column and
      // a CHECK-referenced column all refuse loudly; IF EXISTS of an
      // absent column is silent
      val eKey = intercept[Exception] {
        s.sql("ALTER TABLE gd.db.t DROP COLUMN id") }
      assert(fullMsg(eKey).contains("table key"), fullMsg(eKey))
      val eStats = intercept[Exception] {
        s.sql("ALTER TABLE gd.db.t DROP COLUMN grp") }
      assert(fullMsg(eStats).contains("stats/bloom"), fullMsg(eStats))
      val eMiss = intercept[Exception] {
        s.sql("ALTER TABLE gd.db.t DROP COLUMN nope") }
      // Spark's analyzer resolves DROP COLUMN targets itself
      assert(fullMsg(eMiss).contains("UNRESOLVED_COLUMN") ||
        fullMsg(eMiss).contains("no such column"), fullMsg(eMiss))
      val before = tbl.committedVersions
      s.sql("ALTER TABLE gd.db.t DROP COLUMN IF EXISTS nope")
      assert(tbl.committedVersions == before,
        "IF EXISTS of an absent column must be a silent no-op")
      s.sql("ALTER TABLE gd.db.t SET TBLPROPERTIES ('check.vpos' = 'v >= 0')")
      val eChk = intercept[Exception] {
        s.sql("ALTER TABLE gd.db.t DROP COLUMN v") }
      assert(fullMsg(eChk).contains("CHECK constraint"), fullMsg(eChk))
      s.sql("ALTER TABLE gd.db.t UNSET TBLPROPERTIES ('check.vpos')")
      s.sql("ALTER TABLE gd.db.t DROP COLUMN v")
      assert(s.table("gd.db.t").columns.toSeq == Seq("id", "grp"))
      // CDC straddling the drops speaks the DESTINATION schema (the
      // Delta CDF rule): the dropped columns must not leak into the
      // feed, and the post-drop append classifies as an insert
      val feed = tbl.cdc(1, tbl.committedVersions.max)
      assert(!feed.columns.exists(c =>
        c.endsWith("_junk") || c.endsWith("_v")),
        s"dropped columns leaked into the change feed: ${feed.columns.toSeq}")
      assert(feed.filter(col("op") === "insert")
        .select("id").collect().map(_.getLong(0)).toSet == Set(101L))
      // re-ADDing a dropped name while its bytes are still physically
      // present would RESURRECT the old values (parquet matches by
      // name) — refused loudly until a rewrite purges the files; a
      // genuinely new name still adds fine
      val eRes = intercept[Exception] {
        s.sql("ALTER TABLE gd.db.t ADD COLUMN junk STRING") }
      assert(fullMsg(eRes).contains("resurrect"), fullMsg(eRes))
      s.sql("ALTER TABLE gd.db.t ADD COLUMN fresh STRING")
      assert(s.table("gd.db.t").columns.toSeq == Seq("id", "grp", "fresh"))
      // a REWRITE physically purges the dropped bytes (REORG PURGE for
      // free: OPTIMIZE re-stages through the recorded schema) — and
      // with the bytes gone, the once-blocked name becomes legal again
      tbl.commitCompaction(tbl.committedVersions.max, 64L << 20)
      val phys = s.read.option("mergeSchema", "true")
        .parquet(tbl.files(tbl.committedVersions.max): _*)
        .schema.fieldNames.toSet
      assert(!phys.contains("junk") && !phys.contains("v"),
        s"rewrite must purge dropped columns physically: $phys")
      s.sql("ALTER TABLE gd.db.t ADD COLUMN junk STRING")
      assert(s.table("gd.db.t").columns.toSeq ==
        Seq("id", "grp", "fresh", "junk"))
    }
  }

  test("OVERWRITE BY FILTER (replaceWhere): one atomic pruned commit; violations rejected whole") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create((1L to 1000L).map(i => (i, i)).toDF("id", "v"), 8)
      s.conf.set("spark.sql.catalog.gw", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gw.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
      s.sql(s"CREATE TABLE gw.db.t USING graft OPTIONS (man '$root/man')")
      // replace the [1,100] key region with a recomputed subset (the
      // odd half vanishes — REPLACE deletes, it does not merge)
      (1L to 100L).filter(_ % 2 == 0).map(i => (i, i * 100))
        .toDF("id", "v").writeTo("gw.db.t")
        .overwrite(col("id").between(1L, 100L))
      // ONE commit, atomic: v2 is the whole swap
      assert(tbl.committedVersions == Seq(1, 2))
      assert(s.sql("SELECT count(*) AS c FROM gw.db.t").head.getLong(0)
        == 950L)
      assert(s.sql(
        "SELECT CAST(sum(v) AS BIGINT) AS c FROM gw.db.t WHERE id <= 100")
        .head.getLong(0) == (1L to 100L).filter(_ % 2 == 0).map(_ * 100).sum)
      assert(s.sql(
        "SELECT CAST(sum(v) AS BIGINT) AS c FROM gw.db.t WHERE id > 100")
        .head.getLong(0) == (101L to 1000L).sum)
      // the rewrite was PRUNED to the predicate's envelope: files
      // outside [1,100] carried verbatim into v2
      val carried = tbl.files(2).toSet.intersect(tbl.files(1).toSet)
      assert(carried.nonEmpty,
        "REPLACE WHERE must carry non-matching files verbatim")
      // snapshot isolation: v1 still reads the old content
      assert(tbl.readAsOf(1).count() == 1000L)
      // a replacement batch violating its own predicate is rejected
      // WHOLE — no version burned
      val eBad = intercept[Exception] {
        Seq((5000L, 1L)).toDF("id", "v").writeTo("gw.db.t")
          .overwrite(col("id") === -1L)
      }
      assert(fullMsg(eBad).contains("do not satisfy"), fullMsg(eBad))
      assert(tbl.committedVersions == Seq(1, 2),
        "a rejected REPLACE WHERE must not commit")
      // a predicate matching NOTHING degrades to a validated append:
      // every existing file carries verbatim, no survivor re-staging
      val preFiles = tbl.files(tbl.committedVersions.max).toSet
      Seq((5001L, 5001L)).toDF("id", "v").writeTo("gw.db.t")
        .overwrite(col("id") === 5001L)
      val postFiles = tbl.files(tbl.committedVersions.max).toSet
      assert(preFiles.subsetOf(postFiles) &&
        (postFiles -- preFiles).nonEmpty,
        "a no-match REPLACE WHERE must append without rewriting")
      assert(s.sql("SELECT count(*) AS c FROM gw.db.t").head.getLong(0)
        == 951L)
      s.sql("DELETE FROM gw.db.t WHERE id = 5001")
      // CHECK constraints hold on the replacement rows too: the stats
      // scan validates staged files on every commit path, this one
      // included
      s.sql("ALTER TABLE gw.db.t SET TBLPROPERTIES ('check.vpos' = 'v >= 0')")
      val vsBefore = tbl.committedVersions
      val eChk = intercept[Exception] {
        Seq((7L, -7L)).toDF("id", "v").writeTo("gw.db.t")
          .overwrite(col("id") === 7L)
      }
      assert(fullMsg(eChk).contains("CHECK constraint"), fullMsg(eChk))
      assert(tbl.committedVersions == vsBefore,
        "a CHECK-violating REPLACE WHERE must not commit")
    }
  }

  test("REPLACE WHERE rewrites ONLY the candidate files that actually " +
      "match — unmatched files carry verbatim") {
    val root = freshRoot()
    val s = spark
    import s.implicits._
    val t = GraftTable(s, s"$root/data", s"$root/man", "id")
    // two key-clustered files; `tagc` is a plain (unprunable) column, so
    // BOTH files are candidates for a tagc predicate — but only one
    // holds matching rows, and only that one may rewrite
    t.create((1L to 20L).map(i => (i, if (i <= 10) "lo" else "hi"))
      .toDF("id", "tagc"), 2)
    val before = t.files(1)
    assert(before.size == 2, s"fixture needs two files: $before")
    val nDel = t.commitReplaceWhere(Seq.empty, col("tagc") === "lo",
      (21L to 25L).map(i => (i, "lo")).toDF("id", "tagc"), 1)
    assert(nDel == 10L)
    val after = t.files(2).toSet
    val matched = t.readAsOf(1, Seq(before.head)).filter(col("tagc") === "lo")
    // exactly ONE of the two original files held 'lo' rows (the key
    // clustering splits 1-10 / 11-20); the other must survive VERBATIM
    val untouched = before.filter(after.contains)
    assert(untouched.size == 1,
      s"the unmatched candidate file must carry verbatim: " +
        s"before=$before after=$after")
    val carried = t.readAsOf(2, untouched).collect()
    assert(carried.length == 10 &&
      carried.forall(_.getString(1) == "hi"))
    // content: 'lo' region fully swapped, 'hi' region intact
    val all = t.readAsOf(2).collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(all == ((21L to 25L).map((_, "lo")) ++
      (11L to 20L).map((_, "hi"))).toSet)
  }

  test("REPLACE WHERE over deletion-vector files never resurrects masked rows") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create((1L to 1000L).map(i => (i, i)).toDF("id", "v"), 8)
      // MoR-mask one row OUTSIDE the replace predicate but (by the 8-way
      // range clustering) inside an IMPACTED file: the survivor rewrite
      // reads MoR, so the masked row must not come back to life
      assert(tbl.commitDeleteMor(
        Seq(org.apache.spark.sql.sources.EqualTo("id", 220L)),
        col("id") === 220L, 1) == 1L)
      s.conf.set("spark.sql.catalog.gm", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gm.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gm.db")
      s.sql(s"CREATE TABLE gm.db.t USING graft OPTIONS (man '$root/man')")
      (101L to 200L).filter(_ % 2 == 0).map(i => (i, i * 1000))
        .toDF("id", "v").writeTo("gm.db.t")
        .overwrite(col("id").between(101L, 200L))
      assert(s.sql("SELECT count(*) AS c FROM gm.db.t WHERE id = 220")
        .head.getLong(0) == 0L,
        "a DV-masked row in an impacted file must not resurrect")
      // 1000 - 1 (masked 220) - 100 (replaced range) + 50 (replacement)
      assert(s.sql("SELECT count(*) AS c FROM gm.db.t").head.getLong(0)
        == 949L)
      assert(s.sql(
        "SELECT CAST(sum(v) AS BIGINT) AS c FROM gm.db.t " +
          "WHERE id BETWEEN 101 AND 200").head.getLong(0)
        == (101L to 200L).filter(_ % 2 == 0).map(_ * 1000).sum)
    }
  }

  test("a crashed half-create (registered name, no props, no versions) is adopted") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      s.conf.set("spark.sql.catalog.gr", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gr.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gr.db")
      // simulate the hard kill between the exclusive .tbl create and
      // createEmpty: a registered name whose manifest dir has neither
      // _table_props nor any committed version
      val ns = new java.io.File(s"$root/catalog/db")
      ns.mkdirs()
      val reg = new java.io.FileWriter(s"$root/catalog/db/t.tbl")
      try reg.write(s"man=$root/man\n") finally reg.close()
      // the wedge the adoption cures: reads fail (no snapshots) while a
      // naive CREATE would throw TableAlreadyExists — the name is stuck
      intercept[Exception] { s.sql("SELECT * FROM gr.db.t").collect() }
      // a FRESH registration is NOT adopted (it may be an in-flight
      // concurrent create still between registration and createEmpty)
      val eFresh = intercept[Exception] {
        s.sql(s"""CREATE TABLE gr.db.t (id BIGINT, v BIGINT) USING graft
             |OPTIONS (man '$root/man', data '$root/data', key 'id')
             |""".stripMargin)
      }
      assert(fullMsg(eFresh).toLowerCase.contains("exists"), fullMsg(eFresh))
      // age the registration past the adoption grace: now it is
      // provably a crashed half-create, and CREATE TABLE adopts it
      assert(new java.io.File(s"$root/catalog/db/t.tbl")
        .setLastModified(System.currentTimeMillis() - 3600 * 1000L))
      s.sql(s"""CREATE TABLE gr.db.t (id BIGINT, v BIGINT) USING graft
           |OPTIONS (man '$root/man', data '$root/data', key 'id')
           |""".stripMargin)
      (1L to 10L).map(i => (i, i)).toDF("id", "v")
        .createOrReplaceTempView("adopt_src")
      s.sql("INSERT INTO gr.db.t SELECT * FROM adopt_src")
      assert(s.sql("SELECT count(*) AS c FROM gr.db.t").head.getLong(0)
        == 10L)
      // a HEALTHY table is never adopted: CREATE still fails loudly
      val e = intercept[Exception] {
        s.sql(s"""CREATE TABLE gr.db.t (id BIGINT, v BIGINT) USING graft
             |OPTIONS (man '$root/man2', data '$root/data2', key 'id')
             |""".stripMargin)
      }
      assert(fullMsg(e).toLowerCase.contains("exists"), fullMsg(e))
      assert(s.sql("SELECT count(*) AS c FROM gr.db.t").head.getLong(0)
        == 10L)
    }
  }

  // Spark's own TimeTravelSpec consumes the versionAsOf/timestampAsOf
  // reader options during relation resolution and routes them through
  // the catalog's time-travel loadTable overloads — these cases pin
  // that the Delta-style DataFrame spelling stays working end-to-end
  // against graft catalogs (including the loud misuse shapes).
  test("DataFrame-reader time travel: versionAsOf/timestampAsOf options on named reads") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      s.conf.set("spark.sql.catalog.gtt", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gtt.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gtt.db")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create((1L to 100L).toDF("id"), 2)
      s.sql(s"CREATE TABLE gtt.db.t USING graft OPTIONS (man '$root/man')")
      (101L to 150L).toDF("id").createOrReplaceTempView("tt_src")
      s.sql("INSERT INTO gtt.db.t SELECT * FROM tt_src")

      // versionAsOf pins; unpinned reads see the latest snapshot
      assert(s.read.option("versionAsOf", 1).table("gtt.db.t").count()
        == 100L)
      assert(s.read.table("gtt.db.t").count() == 150L)
      // timestampAsOf resolves through the commit-recorded timestamps
      // exactly like SQL TIMESTAMP AS OF
      val t1 = new java.sql.Timestamp(tbl.commitTimeOf(1)).toString
      assert(s.read.option("timestampAsOf", t1).table("gtt.db.t")
        .count() == 100L)

      // loud: both options at once, an uncommitted version
      val e1 = intercept[Exception] {
        s.read.option("versionAsOf", 1).option("timestampAsOf", t1)
          .table("gtt.db.t").count() }
      assert(fullMsg(e1).toLowerCase.contains("both"), fullMsg(e1))
      val e2 = intercept[Exception] {
        s.read.option("versionAsOf", 99).table("gtt.db.t").count() }
      assert(fullMsg(e2).contains("no committed snapshot"), fullMsg(e2))
    }
  }

  test("reader-option time travel works through the extensions-FREE fallback too") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[4]").getOrCreate()
      val root = freshRoot()
      import s.implicits._
      s.conf.set("spark.sql.catalog.gtf", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gtf.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gtf.db")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create((1L to 40L).toDF("id"), 2)
      s.sql(s"CREATE TABLE gtf.db.t USING graft OPTIONS (man '$root/man')")
      tbl.commitAppendOcc((41L to 60L).toDF("id"))
      assert(s.read.option("versionAsOf", 1).table("gtf.db.t").count()
        == 40L)
      assert(s.read.table("gtf.db.t").count() == 60L)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
