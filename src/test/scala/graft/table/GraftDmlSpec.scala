package graft.table

import graft.{GraftExtensions, Tables, TestBase}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL `UPDATE` and `MERGE INTO` on named graft tables — the
  * GraftDmlRewrite path: resolved commands compile onto the table's
  * envelope-pruned, MoR-aware rewrite primitives. Extensions required
  * (the Delta contract), so every case runs in an extension session. */
class GraftDmlSpec extends TestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_dml").toString

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

  private def fullMsg(t: Throwable): String =
    Option(t.getMessage).getOrElse("") +
      Option(t.getCause).map(fullMsg).getOrElse("")

  private def register(s: SparkSession, cat: String, root: String,
      man: String): Unit = {
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/catalog")
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    s.sql(s"CREATE TABLE $cat.db.t USING graft OPTIONS (man '$man')")
  }

  test("UPDATE: keyed envelope rewrite, non-key predicate, NULL logic, counts, no-burn") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      // 4 files of 250 keys; v column NULLable for the three-valued case
      val df = (1L to 1000L).map(i =>
        (i, if (i % 100 == 0) None else Some(i % 7), i * 2))
        .toDF("id", "grp", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 4)
      register(s, "gu", root, s"$root/man")

      // keyed range UPDATE: only the envelope's file rewrites
      val v1Files = tbl.files(1).toSet
      val n1 = s.sql(
        "UPDATE gu.db.t SET v = v + 1000000 WHERE id BETWEEN 10 AND 20")
        .head.getLong(0)
      assert(n1 == 11L, s"updated_rows $n1")
      val v2Files = tbl.files(2).toSet
      assert((v1Files & v2Files).size == 3,
        s"a keyed UPDATE must rewrite only its envelope: ${
          (v1Files & v2Files).size} of 4 carried forward")
      assert(s.sql(
        "SELECT count(*) AS c FROM gu.db.t WHERE v >= 1000000")
        .head.getLong(0) == 11L)

      // non-key predicate with arithmetic; NULL grp rows must NOT
      // update (three-valued logic: NULL predicate = not matched)
      val n2 = s.sql(
        "UPDATE gu.db.t SET v = -1 WHERE grp % 3 = 1").head.getLong(0)
      val expect = df.filter(col("grp") % 3 === 1).count()
      assert(n2 == expect, s"updated $n2 vs $expect")
      assert(s.sql("SELECT count(*) AS c FROM gu.db.t WHERE v = -1")
        .head.getLong(0) == expect)
      assert(s.sql(
        "SELECT count(*) AS c FROM gu.db.t WHERE grp IS NULL AND v = -1")
        .head.getLong(0) == 0L, "NULL-predicate rows must survive unchanged")

      // no-match burns no version
      val before = tbl.committedVersions.max
      assert(s.sql("UPDATE gu.db.t SET v = 0 WHERE id = -5")
        .head.getLong(0) == 0L)
      assert(tbl.committedVersions.max == before)

      // multi-assignment, including the key itself (files re-stat)
      val n3 = s.sql(
        "UPDATE gu.db.t SET id = id + 5000, v = 42 WHERE id BETWEEN 1 AND 5")
        .head.getLong(0)
      assert(n3 == 5L)
      assert(s.sql(
        "SELECT count(*) AS c FROM gu.db.t WHERE id BETWEEN 5001 AND 5005 " +
          "AND v = 42").head.getLong(0) == 5L)
    }
  }

  test("UPDATE reads through the MoR path: masked rows neither update nor resurrect") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 300L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      // mask every %3 key behind a deletion vector (MoR merge rewrites
      // them as new rows with v+1000)
      tbl.commitMergeMor(
        df.filter(col("id") % 3 === 0).withColumn("v", col("v") + 1000), 1, 2)
      register(s, "gm", root, s"$root/man")
      val live = s.sql("SELECT count(*) AS c FROM gm.db.t").head.getLong(0)
      assert(live == 300L)
      val n = s.sql("UPDATE gm.db.t SET v = v * -1 WHERE id <= 30")
        .head.getLong(0)
      assert(n == 30L, s"updated $n of 30 live rows")
      // every updated row came from the LIVE content (masked originals
      // of %3 keys must not leak their pre-MoR v)
      val bad = s.sql(
        "SELECT count(*) AS c FROM gm.db.t WHERE id <= 30 AND id % 3 = 0 " +
          "AND v <> -(id + 1000)").head.getLong(0)
      assert(bad == 0L, "a masked row's stale value leaked into UPDATE")
      assert(s.sql("SELECT count(*) AS c FROM gm.db.t").head.getLong(0)
        == 300L)
    }
  }

  test("MERGE INTO: upsert, clause conditions, DELETE, NOT MATCHED BY SOURCE, counts") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 400L).map(i => (i, i, "keep")).toDF("id", "v", "tag")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 4)
      register(s, "gg", root, s"$root/man")
      // source: updates for 1..50, inserts 1001..1010
      ((1L to 50L) ++ (1001L to 1010L)).map(i => (i, i * 10))
        .toDF("id", "nv").createOrReplaceTempView("src")

      // classic upsert
      val aff = s.sql(
        """MERGE INTO gg.db.t t USING src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.nv, 'new')
          |""".stripMargin).head.getLong(0)
      assert(aff == 60L, s"affected $aff")
      assert(s.sql("SELECT count(*) AS c FROM gg.db.t").head.getLong(0)
        == 410L)
      assert(s.sql(
        "SELECT count(*) AS c FROM gg.db.t WHERE id <= 50 AND v = id * 10")
        .head.getLong(0) == 50L)
      assert(s.sql(
        "SELECT count(*) AS c FROM gg.db.t WHERE tag = 'new'")
        .head.getLong(0) == 10L)

      // clause conditions + DELETE + NOT MATCHED BY SOURCE
      ((40L to 60L)).map(i => (i, i * 100)).toDF("id", "nv")
        .createOrReplaceTempView("src2")
      val aff2 = s.sql(
        """MERGE INTO gg.db.t t USING src2 s ON t.id = s.id
          |WHEN MATCHED AND t.id % 2 = 0 THEN UPDATE SET v = s.nv
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED BY SOURCE AND t.id > 1005 THEN DELETE
          |""".stripMargin).head.getLong(0)
      // matched 40..60: evens updated (11), odds deleted (10);
      // unmatched-by-source ids 1006..1010 deleted (5)
      assert(aff2 == 26L, s"affected $aff2")
      assert(s.sql(
        "SELECT count(*) AS c FROM gg.db.t WHERE id BETWEEN 40 AND 60 " +
          "AND id % 2 = 1").head.getLong(0) == 0L, "odd matched must delete")
      assert(s.sql(
        "SELECT count(*) AS c FROM gg.db.t WHERE id BETWEEN 40 AND 60 " +
          "AND v = id * 100").head.getLong(0) == 11L)
      assert(s.sql("SELECT count(*) AS c FROM gg.db.t WHERE id > 1005")
        .head.getLong(0) == 0L)

      // UPDATE SET * / INSERT * (star expansion by name)
      (s.sql("SELECT id, v, tag FROM gg.db.t WHERE id <= 3")
        .withColumn("v", col("v") + 7))
        .unionByName(Seq((2001L, 1L, "star")).toDF("id", "v", "tag"))
        .createOrReplaceTempView("src3")
      val aff3 = s.sql(
        """MERGE INTO gg.db.t t USING src3 s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |""".stripMargin).head.getLong(0)
      assert(aff3 == 4L, s"affected $aff3")
      assert(s.sql(
        "SELECT count(*) AS c FROM gg.db.t WHERE id = 2001 AND tag = 'star'")
        .head.getLong(0) == 1L)
    }
  }

  test("merge.mode=mor routes the canonical upsert through deletion vectors") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 2000L).map(i => (i, i, "t")).toDF("id", "v", "tag")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 8)
      register(s, "gmo", root, s"$root/man")
      // scattered keys (every 7th) make COW worst-case: its envelope
      // spans every file — the exact shape MoR exists for
      ((1L to 2000L).filter(_ % 7 == 0).map(i => (i, i * 10, "u")) ++
        Seq((3001L, 1L, "n"), (3002L, 2L, "n")))
        .toDF("id", "nv", "ntag").createOrReplaceTempView("morsrc")
      val v1Files = tbl.files(1).toSet
      s.conf.set("spark.graft.merge.mode", "mor")
      try {
        val aff = s.sql(
          """MERGE INTO gmo.db.t t USING morsrc s ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET id = s.id, v = s.nv, tag = s.ntag
            |WHEN NOT MATCHED THEN INSERT (id, v, tag)
            |  VALUES (s.id, s.nv, s.ntag)""".stripMargin).head.getLong(0)
        assert(aff == 2000L / 7 + 2, s"affected $aff")
        // NO pre-existing file was rewritten: every v1 file survives
        // into v2 by name (the DVs mask, the batch appends)
        assert((v1Files -- tbl.files(2).toSet).isEmpty,
          "mor-mode MERGE rewrote pre-existing files")
        assert(tbl.hasLiveDvs(2), "mor-mode MERGE left no deletion vector")
        // content equals the COW semantics exactly
        val got = s.sql("SELECT count(*) AS n, sum(v) AS sv FROM gmo.db.t")
          .head
        val expV = (1L to 2000L).map(i =>
          if (i % 7 == 0) i * 10 else i).sum + 1L + 2L
        assert(got.getLong(0) == 2002L && got.getLong(1) == expV,
          s"mor-mode MERGE content drift: $got")
        // duplicate source keys still fail the cardinality rule
        Seq((14L, 1L, "x"), (14L, 2L, "y")).toDF("id", "nv", "ntag")
          .createOrReplaceTempView("mordup")
        val e = intercept[Exception] {
          s.sql("""MERGE INTO gmo.db.t t USING mordup s ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET id = s.id, v = s.nv, tag = s.ntag
              |WHEN NOT MATCHED THEN INSERT (id, v, tag)
              |  VALUES (s.id, s.nv, s.ntag)""".stripMargin).collect()
        }
        assert(fullMsg(e).contains("cardinality"), fullMsg(e))
        // a NON-canonical statement under mor mode falls back to COW
        // with identical semantics (the mode is a hint, never a change)
        Seq((21L, 0L)).toDF("id", "nv").createOrReplaceTempView("morcond")
        val aff2 = s.sql(
          """MERGE INTO gmo.db.t t USING morcond s ON t.id = s.id
            |WHEN MATCHED AND t.v > 100 THEN UPDATE SET v = s.nv
            |""".stripMargin).head.getLong(0)
        assert(aff2 == 1L)
        assert(s.sql("SELECT v FROM gmo.db.t WHERE id = 21").head.getLong(0)
          == 0L)
      } finally s.conf.unset("spark.graft.merge.mode")
    }
  }

  test("MERGE prunes to the source key envelope; misuse is loud") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 4)
      register(s, "gp", root, s"$root/man")
      (10L to 20L).map(i => (i, -i)).toDF("id", "nv")
        .createOrReplaceTempView("psrc")
      val v1Files = tbl.files(1).toSet
      s.sql(
        """MERGE INTO gp.db.t t USING psrc s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin).collect()
      val v2Files = tbl.files(2).toSet
      assert((v1Files & v2Files).size == 3,
        s"MERGE must rewrite only the source envelope's file: ${
          (v1Files & v2Files).size} of 4 carried forward")

      // no key-equality in ON: loud, names the key
      val e1 = intercept[Exception] {
        s.sql(
          """MERGE INTO gp.db.t t USING psrc s ON t.v = s.nv
            |WHEN MATCHED THEN DELETE""".stripMargin).collect()
      }
      assert(fullMsg(e1).contains("table key 'id'"), fullMsg(e1))

      // duplicate source keys matching a target row: cardinality loud
      Seq((15L, 1L), (15L, 2L)).toDF("id", "nv")
        .createOrReplaceTempView("dupsrc")
      val e2 = intercept[Exception] {
        s.sql(
          """MERGE INTO gp.db.t t USING dupsrc s ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin).collect()
      }
      assert(fullMsg(e2).contains("cardinality"), fullMsg(e2))

      // subqueries in DML expressions are rejected loudly (they cannot
      // survive the rebinding — the Delta restriction)
      val e3 = intercept[Exception] {
        s.sql("UPDATE gp.db.t SET v = 0 WHERE id IN (SELECT id FROM psrc)")
          .collect()
      }
      assert(fullMsg(e3).toLowerCase.contains("subquer"), fullMsg(e3))

      // an all-miss source burns no version
      val before = tbl.committedVersions.max
      Seq((99999L, 0L)).toDF("id", "nv").createOrReplaceTempView("miss")
      assert(s.sql(
        """MERGE INTO gp.db.t t USING miss s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
        .head.getLong(0) == 0L)
      assert(tbl.committedVersions.max == before)

      // residual ON conjuncts narrow the match (key-miss residual rows
      // become NOT MATCHED and may insert)
      Seq((30L, 777L)).toDF("id", "nv").createOrReplaceTempView("res")
      val aff = s.sql(
        """MERGE INTO gp.db.t t USING res s ON t.id = s.id AND t.v < 0
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (-s.id, s.nv)
          |""".stripMargin).head.getLong(0)
      // id=30 exists with v=30 (>0): residual fails -> insert -30
      assert(aff == 1L)
      assert(s.sql(
        "SELECT count(*) AS c FROM gp.db.t WHERE id = -30 AND v = 777")
        .head.getLong(0) == 1L)
      assert(s.sql("SELECT v FROM gp.db.t WHERE id = 30").head.getLong(0)
        == 30L, "residual-failed match must leave the target row alone")
    }
  }

  test("delete.mode=mor / update.mode=mor: DV-masked DML, zero data files rewritten, COW parity") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      // twin tables, same content: one runs MoR, the other COW — the
      // COW results are the parity oracle for every step below
      val df = (1L to 1000L).map(i =>
        (i, if (i % 100 == 0) None else Some(i % 13), i * 3))
        .toDF("id", "grp", "v")
      val mor = GraftTable(s, s"$root/mdata", s"$root/mman", "id")
      mor.create(df, 4)
      val cow = GraftTable(s, s"$root/cdata", s"$root/cman", "id")
      cow.create(df, 4)
      register(s, "gmor", root, s"$root/mman")
      s.sql(s"CREATE TABLE gmor.db.c USING graft OPTIONS (man '$root/cman')")
      def parity(step: String): Unit = {
        val a = s.sql("SELECT * FROM gmor.db.t ORDER BY id").collect().toSeq
        val b = s.sql("SELECT * FROM gmor.db.c ORDER BY id").collect().toSeq
        assert(a == b, s"$step: MoR/COW content diverged")
      }

      // scattered-key DELETE (uniform ids — every file's envelope
      // intersects, the COW worst case): MoR must rewrite ZERO files
      val v1Files = mor.files(1).toSet
      s.conf.set("spark.graft.delete.mode", "mor")
      s.sql("DELETE FROM gmor.db.t WHERE id % 97 = 0 OR grp = 5")
      s.conf.set("spark.graft.delete.mode", "cow")
      s.sql("DELETE FROM gmor.db.c WHERE id % 97 = 0 OR grp = 5")
      parity("scattered DELETE") // includes grp IS NULL rows surviving
      assert(mor.files(2).toSet == v1Files,
        "MoR DELETE must not rewrite or add any data file")

      // scattered UPDATE: pre-existing files untouched, only the
      // matched rows re-append as new files
      s.conf.set("spark.graft.update.mode", "mor")
      val nU = s.sql("UPDATE gmor.db.t SET v = v + 7 WHERE id % 89 = 3")
        .head.getLong(0)
      s.conf.set("spark.graft.update.mode", "cow")
      val nUc = s.sql("UPDATE gmor.db.c SET v = v + 7 WHERE id % 89 = 3")
        .head.getLong(0)
      assert(nU == nUc && nU > 0L, s"update counts diverged: $nU vs $nUc")
      parity("scattered UPDATE")
      val v3Files = mor.files(3).toSet
      assert(v1Files.subsetOf(v3Files),
        "MoR UPDATE must carry every pre-existing data file forward")
      assert((v3Files -- v1Files).nonEmpty,
        "MoR UPDATE must append the updated rows as new files")

      // DV accumulation: a second MoR delete over already-masked files
      // merges vectors — masked rows neither resurrect nor re-count
      s.conf.set("spark.graft.delete.mode", "mor")
      s.sql("DELETE FROM gmor.db.t WHERE v % 11 = 0")
      s.conf.set("spark.graft.delete.mode", "cow")
      s.sql("DELETE FROM gmor.db.c WHERE v % 11 = 0")
      parity("second MoR DELETE over live DVs")

      // no-match MoR DML burns no version
      val before = mor.committedVersions.max
      s.conf.set("spark.graft.delete.mode", "mor")
      s.sql("DELETE FROM gmor.db.t WHERE id = -1")
      s.conf.set("spark.graft.update.mode", "mor")
      assert(s.sql("UPDATE gmor.db.t SET v = 0 WHERE id = -1")
        .head.getLong(0) == 0L)
      assert(mor.committedVersions.max == before,
        "no-match MoR DML must not burn a version")

      // OPTIMIZE folds the vectors back in: content identical, DVs gone
      mor.commitCompaction(before, 128L * 1024 * 1024)
      assert(!mor.hasLiveDvs(mor.committedVersions.max),
        "OPTIMIZE must fold deletion vectors")
      parity("post-OPTIMIZE")
      s.conf.unset("spark.graft.delete.mode")
      s.conf.unset("spark.graft.update.mode")
    }
  }

  test("overlapping old DVs never double-count: live n_rows stays exact through re-masking") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "gdd", root, s"$root/man")
      s.conf.set("spark.graft.delete.mode", "mor")
      // dv1 masks one row in EACH file (both envelopes intersect)
      s.sql("DELETE FROM gdd.db.t WHERE id IN (1, 501)")
      // dv2 supersedes only the LOW file's set (pruned envelope):
      // dv2 = dv1.low + {2}; the high file still points at dv1, which
      // STILL holds the low file's now-stale position too
      s.sql("DELETE FROM gdd.db.t WHERE id = 2")
      // the third delete impacts BOTH files: the low file's old debt
      // must count from ITS OWN dv2 only (2 positions) — counting
      // dv1's stale copy as well (3) would inflate live upward
      s.sql("DELETE FROM gdd.db.t WHERE id IN (3, 502)")
      s.conf.unset("spark.graft.delete.mode")
      val latest = tbl.committedVersions.max
      assert(s.sql("SELECT count(*) AS c FROM gdd.db.t").head.getLong(0)
        == 995L)
      // the manifest's live counts (what stats-only aggregation,
      // history() and OPTIMIZE debt math read) must agree with truth
      assert(tbl.manifest(latest).agg(sum("n_rows")).head.getLong(0)
        == 995L, "manifest live counts diverged from content")
      // and graft_files' per-file debt sums to exactly the masked rows
      assert(tbl.filesDetail(latest).agg(sum("masked_rows"))
        .head.getLong(0) == 5L)
    }
  }

  test("OPTIMIZE minDvFraction: only debt-heavy files fold; sub-threshold vectors survive") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "gop", root, s"$root/man")
      s.conf.set("spark.graft.delete.mode", "mor")
      s.sql("DELETE FROM gop.db.t WHERE id = 17") // tiny debt
      s.sql("DELETE FROM gop.db.t WHERE id > 500 AND id % 2 = 0") // heavy
      s.conf.unset("spark.graft.delete.mode")
      val vBefore = tbl.committedVersions.max
      val liveCount = s.sql("SELECT count(*) AS c FROM gop.db.t")
        .head.getLong(0)

      // classify per the SAME debt math the knob uses (graft_files'
      // masked_rows is the observable face of it)
      val det = tbl.filesDetail(vBefore).collect()
      def frac(r: org.apache.spark.sql.Row): Double = {
        val m = r.getAs[Long]("masked_rows")
        val l = r.getAs[Long]("n_rows")
        if (m == 0L) 0.0 else m.toDouble / (l + m).toDouble
      }
      val heavy = det.filter(frac(_) >= 0.1)
        .map(_.getAs[String]("file")).toSet
      val light = det.filter(r => frac(r) > 0.0 && frac(r) < 0.1)
        .map(_.getAs[String]("file")).toSet
      assert(heavy.nonEmpty && light.nonEmpty, "fixture must have both")

      // no file is sub-target (so size packs nothing); threshold 0.1
      val minBytes = det.map(_.getAs[Long]("bytes")).min
      s.conf.set("spark.graft.optimize.minDvFraction", "0.1")
      val packed = tbl.commitCompaction(vBefore, minBytes)
      assert(packed == heavy.size, s"packed $packed of ${heavy.size}")
      val vMid = tbl.committedVersions.max
      val after = tbl.files(vMid).toSet
      assert(light.subsetOf(after),
        "sub-threshold files must NOT be rewritten")
      assert(heavy.intersect(after).isEmpty, "debt-heavy files fold")
      assert(tbl.hasLiveDvs(vMid), "the light vector survives by design")
      assert(s.sql("SELECT count(*) AS c FROM gop.db.t").head.getLong(0)
        == liveCount, "content unchanged")

      // default threshold (0) folds everything — the historical contract
      s.conf.unset("spark.graft.optimize.minDvFraction")
      tbl.commitCompaction(vMid, 128L * 1024 * 1024)
      val vEnd = tbl.committedVersions.max
      assert(!tbl.hasLiveDvs(vEnd), "default OPTIMIZE folds all DVs")
      assert(s.sql("SELECT count(*) AS c FROM gop.db.t").head.getLong(0)
        == liveCount)
      assert(s.sql("SELECT sum(v) AS sv FROM gop.db.t").head.getLong(0)
        == (1L to 1000L).filter(i => i != 17 && !(i > 500 && i % 2 == 0))
          .sum)
    }
  }

  test("per-table DML modes: mode.<stmt> props declare the default; session conf overrides; ALTER flips live") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      s.conf.set("spark.sql.catalog.gpm", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gpm.dir", s"$root/catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gpm.db")
      s.sql(s"""CREATE TABLE gpm.db.t (id BIGINT, v BIGINT) USING graft
           |OPTIONS (man '$root/man', data '$root/data', key 'id',
           |  'mode.delete' 'mor', 'mode.update' 'mor')""".stripMargin)
      (1L to 400L).map(i => (i, i)).toDF("id", "v")
        .createOrReplaceTempView("pm_src")
      s.sql("INSERT INTO gpm.db.t SELECT * FROM pm_src")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      val v1Files = tbl.files(tbl.committedVersions.max).toSet

      // props round-trip + SHOW TBLPROPERTIES surface
      assert(GraftTable.loadProps(s, s"$root/man").get.dmlModes ==
        Map("delete" -> "mor", "update" -> "mor"))
      val shown = s.sql("SHOW TBLPROPERTIES gpm.db.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown.get("mode.delete").contains("mor"))

      // NO session conf set: the table's declared default routes MoR
      s.sql("DELETE FROM gpm.db.t WHERE id % 7 = 0")
      assert(s.sql("UPDATE gpm.db.t SET v = -v WHERE id % 11 = 1")
        .head.getLong(0) > 0L)
      val v3Files = tbl.files(tbl.committedVersions.max).toSet
      assert(v1Files.subsetOf(v3Files),
        "table-prop mor modes must not rewrite pre-existing files")

      // an explicitly SET session conf overrides the table default
      s.conf.set("spark.graft.delete.mode", "cow")
      s.sql("DELETE FROM gpm.db.t WHERE id % 7 = 1")
      val v4Files = tbl.files(tbl.committedVersions.max).toSet
      assert((v1Files -- v4Files).nonEmpty,
        "session cow override must rewrite the envelope")
      s.conf.unset("spark.graft.delete.mode")

      // ALTER flips the default live; UNSET restores cow
      // a HELD instance that was constructed WITH the mode must not
      // resurrect it after UNSET: a present props file is authoritative
      // even for keys it lacks (the r17 ADVICE case)
      val held = GraftTable(s, s"$root/data", s"$root/man", "id",
        dmlModes = Map("update" -> "mor"))
      assert(held.dmlMode("update") == "mor")
      s.sql("ALTER TABLE gpm.db.t UNSET TBLPROPERTIES ('mode.update')")
      assert(GraftTable.loadProps(s, s"$root/man").get.dmlModes ==
        Map("delete" -> "mor"))
      assert(held.dmlMode("update") == "cow",
        "an UNSET mode must not be resurrected by a held instance's " +
          "constructor-captured map")
      s.sql("ALTER TABLE gpm.db.t SET TBLPROPERTIES ('mode.merge' = 'mor')")
      assert(GraftTable.loadProps(s, s"$root/man").get.dmlModes ==
        Map("delete" -> "mor", "merge" -> "mor"))

      // misuse is loud: unknown statement, illegal value
      val e1 = intercept[Exception] {
        s.sql("ALTER TABLE gpm.db.t SET TBLPROPERTIES ('mode.insert' = 'mor')") }
      assert(fullMsg(e1).contains("unknown DML-mode"), fullMsg(e1))
      val e2 = intercept[Exception] {
        s.sql("ALTER TABLE gpm.db.t SET TBLPROPERTIES ('mode.delete' = 'fast')") }
      assert(fullMsg(e2).contains("cow or mor"), fullMsg(e2))
      val e3 = intercept[Exception] {
        s.sql(s"""CREATE TABLE gpm.db.bad (id BIGINT) USING graft
             |OPTIONS (man '$root/man2', data '$root/data2', key 'id',
             |  'mode.delete' 'zap')""".stripMargin) }
      assert(fullMsg(e3).contains("cow or mor"), fullMsg(e3))
      // a clone inherits the declared modes
      val clone = tbl.shallowClone(1, s"$root/cdata", s"$root/cman")
      assert(GraftTable.loadProps(s, clone.man).get.dmlModes
        .get("delete").contains("mor"))
    }
  }

  test("randomized COW/MoR DML parity: a seeded op sequence converges identically") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 2000L).map(i => (i, i % 37, i)).toDF("id", "grp", "v")
      val mor = GraftTable(s, s"$root/mdata", s"$root/mman", "id")
      mor.create(df, 4)
      val cow = GraftTable(s, s"$root/cdata", s"$root/cman", "id")
      cow.create(df, 4)
      register(s, "gfz", root, s"$root/mman")
      s.sql(s"CREATE TABLE gfz.db.c USING graft OPTIONS (man '$root/cman')")
      def modes(m: String): Unit = {
        s.conf.set("spark.graft.delete.mode", m)
        s.conf.set("spark.graft.update.mode", m)
        s.conf.set("spark.graft.merge.mode", m)
      }
      def run(sql: String): Unit = {
        modes("mor"); s.sql(sql.replace("%T%", "gfz.db.t")).collect()
        modes("cow"); s.sql(sql.replace("%T%", "gfz.db.c")).collect()
      }
      val rnd = new scala.util.Random(42) // seeded: deterministic replay
      var nextKey = 10000L
      (1 to 10).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => // scattered delete
            val (p, r) = (3 + rnd.nextInt(17), rnd.nextInt(3))
            run(s"DELETE FROM %T% WHERE id % $p = $r")
          case 1 => // scattered update (sometimes with a NULL-prone pred)
            val (p, r, k) = (3 + rnd.nextInt(17), rnd.nextInt(3),
              1 + rnd.nextInt(100))
            run(s"UPDATE %T% SET v = v + $k WHERE id % $p = $r")
          case 2 => // canonical upsert: half hits, half new keys
            val hits = (1 to 20).map(_ => 1L + rnd.nextInt(2000))
              .distinct
            val news = (1 to 10).map(_ => { nextKey += 1; nextKey })
            (hits ++ news).distinct.map(i => (i, i % 37, -i))
              .toDF("id", "grp", "v")
              .createOrReplaceTempView(s"fz_src_$step")
            run(s"""MERGE INTO %T% t USING fz_src_$step s ON t.id = s.id
                   |WHEN MATCHED THEN UPDATE SET *
                   |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          case 3 => // append through INSERT
            val news = (1 to 15).map(_ => { nextKey += 1; nextKey })
            news.map(i => (i, i % 37, i)).toDF("id", "grp", "v")
              .createOrReplaceTempView(s"fz_ins_$step")
            run(s"INSERT INTO %T% SELECT * FROM fz_ins_$step")
        }
        val a = s.sql("SELECT * FROM gfz.db.t ORDER BY id").collect().toSeq
        val b = s.sql("SELECT * FROM gfz.db.c ORDER BY id").collect().toSeq
        assert(a == b, s"step $step: MoR/COW diverged (${a.size}/${b.size})")
      }
      // fold every accumulated vector; content must be unchanged
      mor.commitCompaction(mor.committedVersions.max, 128L * 1024 * 1024)
      val a = s.sql("SELECT * FROM gfz.db.t ORDER BY id").collect().toSeq
      val b = s.sql("SELECT * FROM gfz.db.c ORDER BY id").collect().toSeq
      assert(a == b, "post-OPTIMIZE divergence")
      Seq("delete", "update", "merge").foreach(k =>
        s.conf.unset(s"spark.graft.$k.mode"))
    }
  }

  test("MoR DML integrates: CDF op classification, time travel, RESTORE, vacuum-safe DVs") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "gmi", root, s"$root/man")
      s.conf.set("spark.graft.delete.mode", "mor")
      s.conf.set("spark.graft.update.mode", "mor")
      s.sql("DELETE FROM gmi.db.t WHERE id % 10 = 0") // v2: 10 deletes
      assert(s.sql("UPDATE gmi.db.t SET v = v * 1000 WHERE id % 10 = 1")
        .head.getLong(0) == 10L) // v3: 10 updates
      s.conf.unset("spark.graft.delete.mode")
      s.conf.unset("spark.graft.update.mode")

      // time travel reads THROUGH the accumulated DVs at each version
      def cnt(v: Int): Long = s.sql(
        s"SELECT count(*) AS c FROM gmi.db.t VERSION AS OF $v")
        .head.getLong(0)
      assert(cnt(1) == 100L && cnt(2) == 90L && cnt(3) == 90L)

      // manifest n_rows stays LIVE-exact through DV-only commits, so
      // stats-only (metadata-only) aggregation never reads a data byte
      // and never counts a masked row
      def manRows(v: Int): Long = tbl.manifest(v)
        .agg(sum("n_rows")).head.getLong(0)
      assert(manRows(2) == 90L && manRows(3) == 90L,
        s"manifest live counts: v2=${manRows(2)} v3=${manRows(3)}")

      // the change feed classifies DV-only commits row-exactly: the
      // cdc diff is over (file, dv) PAIRS, so a commit that touched
      // only vectors still yields per-row ops
      def ops(a: Int, b: Int): Map[String, Long] =
        tbl.cdc(a, b).groupBy("op").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ops(1, 2) == Map("delete" -> 10L), s"v1->v2: ${ops(1, 2)}")
      assert(ops(2, 3) == Map("update" -> 10L), s"v2->v3: ${ops(2, 3)}")
      assert(ops(1, 3) == Map("delete" -> 10L, "update" -> 10L))

      // RESTORE to v1 resurrects the masked rows (the DV entries are
      // version-local); the restore itself is a new commit
      val rv = tbl.commitRestore(1)
      assert(s.sql("SELECT count(*) AS c FROM gmi.db.t").head.getLong(0)
        == 100L)
      assert(s.sql("SELECT sum(v) AS sv FROM gmi.db.t").head.getLong(0)
        == (1L to 100L).sum)

      // vacuum to the DV-carrying horizon: v3's dv files must survive
      // (still referenced) and v3 must still read correctly
      tbl.vacuum(keepFrom = 3, latest = rv)
      assert(tbl.readAsOf(3).count() == 90L)
      assert(tbl.readAsOf(3).agg(sum("v")).head.getLong(0) ==
        (1L to 100L).filter(_ % 10 != 0)
          .map(i => if (i % 10 == 1) i * 1000 else i).sum)
    }
  }

  test("MERGE with an EMPTY source: BY SOURCE clauses still apply to every target row") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 200L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "ge", root, s"$root/man")
      (1L to 5L).map(i => (i, i)).toDF("id", "nv").limit(0)
        .createOrReplaceTempView("empty_src")

      // no BY SOURCE clause: a true no-op — count 0, no version burned
      val before = tbl.committedVersions.max
      assert(s.sql(
        """MERGE INTO ge.db.t t USING empty_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)
          |""".stripMargin).head.getLong(0) == 0L)
      assert(tbl.committedVersions.max == before,
        "empty-source no-op must not burn a version")

      // WHEN NOT MATCHED BY SOURCE applies to EVERY target row when the
      // source is empty (Delta semantics) — a conditional UPDATE first
      val affU = s.sql(
        """MERGE INTO ge.db.t t USING empty_src s ON t.id = s.id
          |WHEN NOT MATCHED BY SOURCE AND t.id <= 50 THEN UPDATE SET v = -1
          |""".stripMargin).head.getLong(0)
      assert(affU == 50L, s"BY SOURCE UPDATE affected $affU")
      assert(s.sql("SELECT count(*) AS c FROM ge.db.t WHERE v = -1")
        .head.getLong(0) == 50L)

      // then the unconditional DELETE: every row goes, exact count
      val affD = s.sql(
        """MERGE INTO ge.db.t t USING empty_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED BY SOURCE THEN DELETE
          |""".stripMargin).head.getLong(0)
      assert(affD == 200L, s"BY SOURCE DELETE affected $affD")
      assert(s.sql("SELECT count(*) AS c FROM ge.db.t").head.getLong(0)
        == 0L, "empty-source BY SOURCE DELETE must empty the table")
    }
  }

  test("MoR commits fold only newly-masked files: unchanged debt keeps its dv pointer") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      // two files: low keys 1-500, high keys 501-1000
      val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "gkp", root, s"$root/man")
      def dvOf(v: Int): Map[String, String] = tbl.manifest(v).collect()
        .flatMap(r => Option(r.getAs[String]("dv"))
          .map(r.getAs[String]("file") -> _)).toMap
      def fileOfKey(v: Int, k: Long): String = tbl.manifest(v).collect()
        .find(r => r.getAs[Long]("lo") <= k && k <= r.getAs[Long]("hi"))
        .get.getAs[String]("file")
      s.conf.set("spark.graft.delete.mode", "mor")

      // v2: mask one row of the HIGH file only
      s.sql("DELETE FROM gkp.db.t WHERE id = 501")
      val high = fileOfKey(2, 700L)
      val dvHigh = dvOf(2)(high)

      // v3: the predicate's modulo arm defeats pruning, so the IMPACTED
      // set is every file — but only the LOW file gains a new mask. The
      // high file's entry must keep its v2 dv pointer verbatim (its
      // debt is NOT re-copied), and the commit's new vector must hold
      // ONLY the low file's new churn.
      s.sql("DELETE FROM gkp.db.t WHERE id = 2 OR id % 100000 = 99999")
      val low = fileOfKey(3, 100L)
      assert(dvOf(3)(high) == dvHigh,
        "an impacted file with zero new masks must keep its old dv pointer")
      val dvLow3 = dvOf(3)(low)
      assert(dvLow3 != dvHigh, "the low file points at the commit's vector")
      assert(s.read.parquet(dvLow3).count() == 1L,
        "per-commit DV bytes must be bounded by new churn, not envelope debt")

      // v4: re-mask the low file — its own old debt folds (2 positions),
      // the high file's still does not
      s.sql("DELETE FROM gkp.db.t WHERE id = 3 OR id % 100000 = 99999")
      assert(dvOf(4)(high) == dvHigh,
        "unchanged debt must survive a second commit untouched")
      val dvLow4 = dvOf(4)(low)
      assert(s.read.parquet(dvLow4).count() == 2L,
        "a re-masked file folds exactly its own debt + new churn")
      s.conf.unset("spark.graft.delete.mode")

      // content, live counts and debt accounting all stay exact
      assert(s.sql("SELECT count(*) AS c FROM gkp.db.t").head.getLong(0)
        == 997L)
      assert(tbl.manifest(4).agg(sum("n_rows")).head.getLong(0) == 997L)
      assert(tbl.filesDetail(4).agg(sum("masked_rows")).head.getLong(0)
        == 3L)
      // the shared old vector stays vacuum-live while any retained
      // version references it by name
      tbl.vacuum(4, 4)
      assert(s.sql("SELECT count(*) AS c FROM gkp.db.t").head.getLong(0)
        == 997L, "vacuum must keep dv files referenced by the latest version")
    }
  }

  test("mor.maxMaskFraction guardrail: a large-mask DML falls back to the COW rewrite") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "ggr", root, s"$root/man")
      s.conf.set("spark.graft.delete.mode", "mor")
      s.conf.set("spark.graft.update.mode", "mor")
      s.conf.set("spark.graft.mor.maxMaskFraction", "0.3")

      // 600/1000 live rows matched > 0.3: the statement must rewrite
      // COW — no deletion vector anywhere, content exact
      val v1Files = tbl.files(1).toSet
      s.sql("DELETE FROM ggr.db.t WHERE id <= 600")
      assert(!tbl.hasLiveDvs(2),
        "above the mask-fraction cutoff the DELETE must rewrite, not mask")
      assert(tbl.files(2).toSet != v1Files, "COW fallback rewrites files")
      assert(s.sql("SELECT count(*) AS c FROM ggr.db.t").head.getLong(0)
        == 400L)

      // same cutoff for UPDATE: 360/400 matched > 0.3 — COW, no DV,
      // values exact
      s.sql("UPDATE ggr.db.t SET v = v + 1000 WHERE id > 640")
      assert(!tbl.hasLiveDvs(3),
        "above the cutoff the UPDATE must rewrite, not mask")
      assert(s.sql(
        "SELECT count(*) AS c FROM ggr.db.t WHERE v = id + 1000 AND id > 640")
        .head.getLong(0) == 360L)

      // under the cutoff the same statements mask as declared
      s.sql("DELETE FROM ggr.db.t WHERE id % 101 = 0")
      assert(tbl.hasLiveDvs(4), "a small-mask DELETE stays MoR")

      // > 1 disables the fallback: even a full-envelope delete masks
      s.conf.set("spark.graft.mor.maxMaskFraction", "2.0")
      val before = tbl.files(tbl.committedVersions.max).toSet
      s.sql("DELETE FROM ggr.db.t WHERE id > 900")
      val latest = tbl.committedVersions.max
      assert(tbl.files(latest).toSet == before,
        "a disabled guardrail must never rewrite")
      s.conf.unset("spark.graft.mor.maxMaskFraction")
      s.conf.unset("spark.graft.delete.mode")
      s.conf.unset("spark.graft.update.mode")
    }
  }

  test("writeDvFile fans out past dv.maxRowsPerFile: one name, many tasks, same reads") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create(df, 2)
      register(s, "gfan", root, s"$root/man")
      s.conf.set("spark.graft.delete.mode", "mor")
      s.conf.set("spark.graft.dv.maxRowsPerFile", "10")
      s.sql("DELETE FROM gfan.db.t WHERE id % 20 = 0") // 50 masked rows
      s.conf.unset("spark.graft.dv.maxRowsPerFile")
      s.conf.unset("spark.graft.delete.mode")
      val dvPaths = tbl.manifest(2).collect()
        .flatMap(r => Option(r.getAs[String]("dv"))).distinct.toSeq
      assert(dvPaths.size == 1, "one DV placement per commit")
      val p = new org.apache.hadoop.fs.Path(dvPaths.head)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      assert(fs.getFileStatus(p).isDirectory,
        "past the row cutoff the DV placement is a fanned-out directory")
      assert(fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
        > 1, "the fanned-out vector must be written by multiple tasks")
      // reads, debt math and live counts see the same vector
      assert(s.sql("SELECT count(*) AS c FROM gfan.db.t").head.getLong(0)
        == 950L)
      assert(tbl.filesDetail(2).agg(sum("masked_rows")).head.getLong(0)
        == 50L)
      assert(tbl.manifest(2).agg(sum("n_rows")).head.getLong(0) == 950L)
      // OPTIMIZE folds it; vacuum then reclaims the whole directory
      tbl.commitCompaction(2, 128L * 1024 * 1024)
      tbl.vacuum(3, 3)
      assert(!fs.exists(p), "vacuum must reclaim the fanned-out DV dir")
      assert(s.sql("SELECT count(*) AS c FROM gfan.db.t").head.getLong(0)
        == 950L)
    }
  }

  test("DML conf typos fail loudly naming the key; UPDATE rejects unknown columns") {
    withExtSession { s =>
      val root = freshRoot()
      import s.implicits._
      val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
      tbl.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), 2)
      register(s, "gconf", root, s"$root/man")

      // a typo'd guardrail conf must name its key, not throw a bare
      // NumberFormatException (consistent with ivfProbes' validation)
      s.conf.set("spark.graft.mor.maxMaskFraction", "0.8x")
      s.conf.set("spark.graft.delete.mode", "mor")
      val e1 = intercept[IllegalArgumentException] {
        s.sql("DELETE FROM gconf.db.t WHERE id = 1")
      }
      assert(e1.getMessage.contains("spark.graft.mor.maxMaskFraction"))
      s.conf.unset("spark.graft.mor.maxMaskFraction")

      s.conf.set("spark.graft.dv.maxRowsPerFile", "lots")
      val e2 = intercept[IllegalArgumentException] {
        s.sql("DELETE FROM gconf.db.t WHERE id = 1")
      }
      assert(e2.getMessage.contains("spark.graft.dv.maxRowsPerFile"))
      s.conf.unset("spark.graft.dv.maxRowsPerFile")
      s.conf.unset("spark.graft.delete.mode")

      // commitUpdateCow is a public API: a misspelled assignment key
      // must fail loudly, never silently no-op
      import org.apache.spark.sql.functions._
      val e3 = intercept[IllegalArgumentException] {
        tbl.commitUpdateCow(col("id") > 0, Map("vv" -> lit(7L)),
          tbl.committedVersions.max)
      }
      assert(e3.getMessage.contains("vv"))
      // and the table is untouched (no burned version, values exact)
      assert(s.sql("SELECT count(*) AS c FROM gconf.db.t WHERE v = id")
        .head.getLong(0) == 100L)
    }
  }
}
