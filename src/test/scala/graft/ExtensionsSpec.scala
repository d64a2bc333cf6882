package graft

import org.apache.spark.sql.SparkSession

/** `spark.sql.extensions=graft.GraftExtensions` must make the native
  * functions SQL-visible with zero user code. */
class ExtensionsSpec extends TestBase {

  test("extension-injected functions resolve in plain SQL") {
    val orig = spark // keep the shared session alive for other suites
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf — applied only when the
      // session creates the SparkContext. The shared test context already
      // exists, so apply the same class through withExtensions (the
      // programmatic equivalent; deployments use the config line).
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT round(cosine_similarity(array(1.0D, 0.0D), array(1.0D, 1.0D)), 4) AS c,
          |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
          |""".stripMargin).collect()(0)
      assert(row.getDouble(0) == 0.7071)
      assert(row.getDouble(1) == 11.0)

      val sig = s2.sql(
        "SELECT minhash_sketch(s) AS sig FROM VALUES ('a b c'), ('d e f') t(s)")
        .collect()(0).getSeq[Long](0)
      assert(sig.length == graft.functions.TextHash.NumPerms)
      assert(sig.forall(_ != Long.MaxValue))

      val hashes = s2.sql(
        """SELECT size(minhash_signature('one two three four')) AS n,
          |       size(band_hashes(minhash_signature('one two three'))) AS b,
          |       simhash64('hello world') AS sh""".stripMargin).collect()(0)
      assert(hashes.getInt(0) == graft.functions.TextHash.NumPerms)
      assert(hashes.getInt(1) == graft.functions.TextHash.NumBands)
      assert(hashes.getLong(2) ==
        graft.functions.TextHash.simhash64("hello world"))

      // round-6 sketch surface: frequency + theta set algebra in SQL
      val fi = s2.sql(
        """SELECT freq_items_sketch(x) AS fi
          |FROM VALUES ('a'), ('a'), ('b') t(x)""".stripMargin)
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(fi.map(r => r.getString(0) -> r.getLong(1)).toList ==
        List("a" -> 2L, "b" -> 1L))

      val th = s2.sql(
        """WITH s AS (
          |  SELECT theta_sketch_agg(x) AS a FROM VALUES ('p'), ('q'), ('r') t(x)
          |), t AS (
          |  SELECT theta_sketch_agg(x) AS b FROM VALUES ('q'), ('r'), ('s') t(x)
          |)
          |SELECT theta_estimate(a) AS na,
          |       theta_intersect_estimate(a, b) AS ni,
          |       theta_union_estimate(a, b) AS nu,
          |       theta_anotb_estimate(a, b) AS nd
          |FROM s, t""".stripMargin).collect()(0)
      assert(th.getLong(0) == 3 && th.getLong(1) == 2 &&
        th.getLong(2) == 4 && th.getLong(3) == 1)

      // KLL quantile surface: below capacity the sketch is exact, so
      // the SQL answers are deterministic.
      val kll = s2.sql(
        """WITH s AS (
          |  SELECT kll_sketch_agg(CAST(x AS DOUBLE)) AS sk
          |  FROM range(1, 101) t(x)
          |)
          |SELECT kll_quantile(sk, 0.5D) AS q50,
          |       kll_rank(sk, 50.0D) AS r50
          |FROM s""".stripMargin).collect()(0)
      assert(kll.getDouble(0) == 50.0 && kll.getDouble(1) == 0.5)

      // optional k argument (ADVICE r6): a literal int selects the
      // sketch size; out-of-range and non-literal k fail at analysis
      val kll2 = s2.sql(
        """WITH s AS (
          |  SELECT kll_sketch_agg(CAST(x AS DOUBLE), 400) AS sk
          |  FROM range(1, 101) t(x)
          |)
          |SELECT kll_quantile(sk, 0.5D) AS q50 FROM s""".stripMargin)
        .collect()(0).getDouble(0)
      assert(kll2 == 50.0)
      val badK = intercept[Exception] {
        s2.sql("SELECT kll_sketch_agg(CAST(x AS DOUBLE), 4) FROM range(10) t(x)")
          .queryExecution.analyzed
      }
      assert(badK.getMessage.contains("[8, 65535]"))

      // round-7 top-k surface: bounded-heap top-k from plain SQL, both
      // directions; k must be a literal int
      val tk = s2.sql(
        """SELECT top_k_rows(struct(v, id), 2) AS hi,
          |       top_k_rows(struct(v, id), 2, false) AS lo
          |FROM VALUES (5, 1), (5, 2), (9, 3), (1, 4) t(v, id)""".stripMargin)
        .collect()(0)
      def pairs(i: Int) = tk.getSeq[org.apache.spark.sql.Row](i)
        .map(r => (r.getInt(0), r.getInt(1))).toList
      assert(pairs(0) == List((9, 3), (5, 2)), s"hi = ${pairs(0)}")
      assert(pairs(1) == List((1, 4), (5, 1)), s"lo = ${pairs(1)}")
      val badTk = intercept[Exception] {
        s2.sql("SELECT top_k_rows(struct(x), x) FROM range(10) t(x)")
          .queryExecution.analyzed
      }
      assert(badTk.getMessage.contains("literal INT"))

      // bloom aggregate from SQL: bytes out, membership via the reader
      // helper; absent key rejected
      val bl = s2.sql(
        """SELECT bloom_agg(x, 64, 0.01) AS b
          |FROM VALUES (1), (2), (3) t(x)""".stripMargin)
        .collect()(0).getAs[Array[Byte]](0)
      assert(graft.functions.BloomAgg.mightContainLong(bl, 2L))
      assert(!graft.functions.BloomAgg.mightContainLong(bl, 424242L))

      // round-10 sorted-merge intersect count (q104's verify primitive)
      val sic = s2.sql(
        """SELECT sorted_intersect_count(
          |         array_sort(array('b', 'a', 'd')),
          |         array_sort(array('d', 'b', 'c'))) AS c""".stripMargin)
        .collect()(0).getInt(0)
      assert(sic == 2, s"sorted_intersect_count = $sic")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("time travel runs from pure SQL text via graft_snapshot (same rows as readAsOf)") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // q108's exact layout: v1, then an append commit -> v2
      val layout @ (_, man) =
        operators.CurationQueries.versionedLayout(s2, sfDir, "q108sql")
      val batch = Tables.load(s2, sfDir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderkey").between(1, 500))
        .select((-org.apache.spark.sql.functions.col("o_orderkey")).as("o_orderkey"),
          org.apache.spark.sql.functions.col("o_custkey"),
          org.apache.spark.sql.functions.col("o_totalprice"))
      operators.CurationQueries.commitAppend(s2, layout, batch, 1, "o_orderkey")
      Seq(1, 2).foreach { v =>
        val viaSql = s2.sql(
          s"""SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
             |  min(o_orderkey) AS min_key
             |FROM graft_snapshot('$man', $v)""".stripMargin)
          .collect()(0)
        val api = operators.CurationQueries.readAsOf(s2, layout, v)
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.round(
              org.apache.spark.sql.functions.sum("o_totalprice"), 2),
            org.apache.spark.sql.functions.min("o_orderkey")).collect()(0)
        assert(viaSql.getLong(0) == api.getLong(0), s"v=$v count")
        assert(viaSql.getDouble(1) == api.getDouble(1), s"v=$v sum")
        assert(viaSql.getLong(2) == api.getLong(2), s"v=$v min")
      }
      // misuse fails at analysis with the usage message
      val bad = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_snapshot('$man', 99)").queryExecution.analyzed
      }
      assert(bad.getMessage.contains("no committed snapshot"))

      // TIMESTAMP AS OF: pin the commit times via the commit-embedded
      // `_ts_` markers (the clock of record), then a timestamp between
      // the commits resolves to v1, after both to v2, before both fails
      val (t1, t2) = (1600000000000L, 1700000000000L)
      def pinCommitTime(v: Int, ms: Long): Unit = {
        val dir = new java.io.File(s"$man/v=$v")
        dir.listFiles().filter(_.getName.startsWith("_ts_"))
          .foreach(f => assert(f.delete()))
        assert(new java.io.File(dir, s"_ts_$ms").createNewFile())
      }
      pinCommitTime(1, t1)
      pinCommitTime(2, t2)
      // file-system surgery (copy/restore/rsync rewriting mtimes) must
      // NOT rewrite history's clock: give the dirs misleading mtimes —
      // v1 "newer" than v2 — and resolution below still follows markers
      assert(new java.io.File(s"$man/v=1").setLastModified(t2 + 999999L))
      assert(new java.io.File(s"$man/v=2").setLastModified(t1 - 999999L))
      val zone = java.time.ZoneId.of(s2.sessionState.conf.sessionLocalTimeZone)
      def tsLit(ms: Long): String = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(zone)
        .format(java.time.Instant.ofEpochMilli(ms))
      def countAsOf(ms: Long): Long = s2.sql(
        s"SELECT count(*) FROM graft_snapshot('$man', TIMESTAMP'${tsLit(ms)}')")
        .collect()(0).getLong(0)
      val v1n = operators.CurationQueries.readAsOf(s2, layout, 1).count()
      val v2n = operators.CurationQueries.readAsOf(s2, layout, 2).count()
      assert(countAsOf(t1 + 3600000L) == v1n, "between commits must read v1")
      assert(countAsOf(t2 + 3600000L) == v2n, "after both commits must read v2")
      val early = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_snapshot('$man', TIMESTAMP'${tsLit(t1 - 3600000L)}')")
          .queryExecution.analyzed
      }
      assert(early.getMessage.contains("no snapshot committed at or before"))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("graft_history lists versions from SQL (parity with history(), misuse loud)") {
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlhist").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id")
    import spark.implicits._
    t.create((1L to 80L).map(i => (i, i * 2L)).toDF("id", "v"), 4)
    t.commitAppend((81L to 120L).map(i => (i, i)).toDF("id", "v"), 1, 2)
    t.commitCompaction(2, targetBytes = 1L << 30)
    val viaSql = spark.sql(
      s"""SELECT version, n_files, n_rows, data_change
         |FROM graft_history('${t.man}') ORDER BY version""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(viaSql == Seq((1L, 4L, 80L, true), (2L, 6L, 120L, true),
      (3L, 1L, 120L, false)), s"$viaSql")
    val api = t.history()
      .select("version", "n_files", "n_rows", "data_change")
      .orderBy("version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(viaSql == api)
    // commit_ts surfaces the commit-embedded clock, not dir mtime
    val ts = t.history().select("commit_ts").collect()
      .map(_.getTimestamp(0).getTime)
    assert(ts.forall(_ > 0) && ts.sorted.sameElements(ts),
      s"history commit_ts must be monotone: ${ts.toSeq}")
    val badArity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_history('/x', 2)")
        .queryExecution.analyzed
    }
    assert(badArity.getMessage.contains("1 argument"))
    val notATable = java.nio.file.Files.createTempDirectory("graft_nohist")
    val badMan = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_history('$notATable')")
        .queryExecution.analyzed
    }
    assert(badMan.getMessage.contains("no committed snapshots"))
  }

  test("graft_files exposes per-file detail + DV debt from SQL (never reads a data file)") {
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlfiles").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id")
    import spark.implicits._
    t.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), 2)
    // v1: no DVs — masked_rows all zero, dv NULL
    val v1 = spark.sql(s"SELECT * FROM graft_files('${t.man}', 1)")
      .collect()
    assert(v1.length == 2)
    assert(v1.forall(r => r.getAs[Long]("masked_rows") == 0L &&
      r.isNullAt(r.fieldIndex("dv"))))
    assert(v1.map(_.getAs[Long]("n_rows")).sum == 100L)
    // v2: a MoR merge masks 10 rows — the debt shows per file, live
    // n_rows stays exact, and the default-version call sees the latest
    t.commitMergeMor((1L to 10L).map(i => (i, -i)).toDF("id", "v"), 1)
    val v2 = spark.sql(s"SELECT * FROM graft_files('${t.man}')").collect()
    assert(v2.map(_.getAs[Long]("masked_rows")).sum == 10L, s"${v2.toSeq}")
    assert(v2.map(_.getAs[Long]("n_rows")).sum == 100L) // 90 live + 10 new
    assert(v2.exists(r => !r.isNullAt(r.fieldIndex("dv"))))
    // misuse is loud
    val badV = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_files('${t.man}', 99)")
        .queryExecution.analyzed }
    assert(badV.getMessage.contains("no committed snapshot"))
    val badArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_files('${t.man}', 1, 2)")
        .queryExecution.analyzed }
    assert(badArity.getMessage.contains("1 or 2 arguments"))
  }

  test("graft_files surfaces the per-file NULL census (write-time, DV-invariant)") {
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_census").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id",
      statsCols = Seq("c"))
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // key-clustered halves: ids 1-50 carry NULL c, 51-100 are null-free
    t.create((1L to 100L).map(i =>
      (i, if (i <= 50) None else Some(i), i)).toDF("id", "c", "v"), 2)
    // a user tuning IS NULL-heavy curation filters sees which files the
    // census will skip — the same dry-run contract graft_files gives
    // OPTIMIZE for DV debt
    val rows = spark.sql(
      s"SELECT file, nulls_c, n_rows FROM graft_files('${t.man}', 1)")
      .collect()
    assert(rows.length == 2)
    val censusByFile = rows.map(r =>
      r.getAs[String]("file") -> r.getAs[Long]("nulls_c")).toMap
    assert(censusByFile.values.toSeq.sorted == Seq(0L, 50L),
      s"one all-null-c file and one null-free file: $censusByFile")
    // the TVF's census IS fileStats' census (shared manifest columns —
    // the surfaces cannot disagree)
    val manCensus = t.manifest(1).select("file", "nulls_c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(censusByFile == manCensus)
    // write-time counts: a MoR DELETE masking null rows changes n_rows
    // (live) but NOT the census — exactly why DV entries never null-skip
    import org.apache.spark.sql.sources.LessThanOrEqual
    assert(t.commitDeleteMor(Seq(LessThanOrEqual("id", 10L)),
      col("id") <= 10L, 1) == 10L)
    val v2 = spark.sql(
      s"SELECT file, nulls_c, n_rows, masked_rows FROM graft_files('${t.man}', 2)")
      .collect()
    val masked = v2.find(_.getAs[Long]("masked_rows") == 10L).get
    assert(masked.getAs[Long]("nulls_c") == 50L,
      "the census is write-time: a deletion vector must not update it")
    assert(masked.getAs[Long]("n_rows") == 40L)
  }

  test("graft_files debt fraction agrees with OPTIMIZE's minDvFraction fold/survive decision") {
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_debt").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id")
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // two 500-row files; file A accrues 40% debt, file B 1%
    t.create((1L to 1000L).map(i => (i, i)).toDF("id", "v"), 2)
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    assert(t.commitDeleteMor(Seq(LessThanOrEqual("id", 200L)),
      col("id") <= 200L, 1) == 200L)
    assert(t.commitDeleteMor(
      Seq(GreaterThan("id", 500L), LessThanOrEqual("id", 505L)),
      col("id") > 500L && col("id") <= 505L, 2) == 5L)
    // the operator reads the debt the same way OPTIMIZE decides it:
    // masked_rows/(n_rows+masked_rows) per file vs minDvFraction
    val before = spark.sql(s"SELECT * FROM graft_files('${t.man}', 3)")
      .collect()
      .map(r => r.getAs[String]("file") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("masked_rows"))).toMap
    val minFrac = 0.1
    def debtFrac(p: (Long, Long)): Double =
      if (p._2 == 0L) 0.0 else p._2.toDouble / (p._1 + p._2)
    val shouldFold = before.filter(p => debtFrac(p._2) >= minFrac).keySet
    val shouldKeep = before.keySet -- shouldFold
    assert(shouldFold.size == 1 && shouldKeep.size == 1,
      s"fixture must split the decision: $before")
    spark.conf.set("spark.graft.optimize.minDvFraction", minFrac.toString)
    try {
      // targetBytes under every file's size disables size-packing —
      // ONLY the debt rule picks the fold set
      val minBytes = t.manifest(3).collect()
        .map(_.getAs[Long]("bytes")).min
      assert(t.commitCompaction(3, math.max(1L, minBytes / 2)) == 1)
    } finally spark.conf.unset("spark.graft.optimize.minDvFraction")
    val after = spark.sql(s"SELECT * FROM graft_files('${t.man}', 4)")
      .collect()
    // the debt-heavy file folded (gone, rewritten clean); the
    // sub-threshold file kept its vector AND its exact debt
    assert(!after.exists(r => shouldFold(r.getAs[String]("file"))),
      "the over-threshold file must fold")
    shouldKeep.foreach { f =>
      val r = after.find(_.getAs[String]("file") == f).get
      assert(!r.isNullAt(r.fieldIndex("dv")) &&
        r.getAs[Long]("masked_rows") == before(f)._2,
        "the sub-threshold vector must survive unchanged")
    }
    // content is untouched either way
    assert(t.readAsOf(4).count() == 795L)
  }

  test("OPTIMIZE and VACUUM run from pure SQL (parity with the API, misuse loud)") {
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlmaint").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id")
    import spark.implicits._
    t.create((1L to 80L).map(i => (i, i * 2L)).toDF("id", "v"), 4)
    t.commitAppend((81L to 120L).map(i => (i, i)).toDF("id", "v"), 1, 2)
    // graft_optimize packs the 6 small files into 1 as a
    // dataChange=false commit — same as commitCompaction
    val opt = spark.sql(
      s"SELECT * FROM graft_optimize('${t.man}', ${1L << 30})").collect()
    assert(opt.length == 1)
    assert(opt(0).getAs[Long]("compacted_files") == 6L, s"${opt.toSeq}")
    assert(opt(0).getAs[Long]("latest_version") == 3L)
    assert(!t.dataChange(3) && t.readAsOf(3).count() == 120)
    // an already-compact table reports 0 and burns no version
    val opt2 = spark.sql(
      s"SELECT * FROM graft_optimize('${t.man}', ${1L << 30})").collect()
    assert(opt2(0).getAs[Long]("compacted_files") == 0L &&
      opt2(0).getAs[Long]("latest_version") == 3L)
    // graft_vacuum drops versions below keepFrom and reclaims exactly
    // the packed-away files — one row each
    val removed = spark.sql(
      s"SELECT * FROM graft_vacuum('${t.man}', 3)").collect()
      .map(_.getString(0)).toSeq
    assert(removed.size == 6, s"expected the 6 packed-away files: $removed")
    assert(t.committedVersions == Seq(3) && t.readAsOf(3).count() == 120)
    // a second vacuum finds nothing
    assert(spark.sql(
      s"SELECT * FROM graft_vacuum('${t.man}', 3)").collect().isEmpty)
    // misuse is loud
    val badTarget = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_optimize('${t.man}', 0)")
        .queryExecution.analyzed
    }
    assert(badTarget.getMessage.contains("positive"), badTarget.getMessage)
    val noProps = java.nio.file.Files.createTempDirectory("graft_nomaint")
    val badMan = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_vacuum('$noProps', 1)")
        .queryExecution.analyzed
    }
    assert(badMan.getMessage.contains("_table_props"), badMan.getMessage)
  }

  test("maintenance TVFs accept catalog NAMES; unknown name / non-graft catalog are loud") {
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_named").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id")
    import spark.implicits._
    t.create((1L to 100L).map(i => (i, i * 2L)).toDF("id", "v"), 4)
    spark.conf.set("spark.sql.catalog.gnm",
      classOf[graft.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnm.dir", s"$root/catalog")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnm.db")
    spark.sql(s"CREATE TABLE gnm.db.t USING graft OPTIONS (man '$root/man')")
    // the full maintenance surface resolves 'gnm.db.t' -> the manifest:
    // a user who registered the name never needs the path (VERDICT r12 #2)
    assert(spark.sql("SELECT max(version) AS v FROM graft_history('gnm.db.t')")
      .head.getLong(0) == 1L)
    val del = spark.sql("SELECT * FROM graft_delete('gnm.db.t', 10, 39)").head
    assert(del.getAs[Long]("deleted_rows") == 30L &&
      del.getAs[Long]("latest_version") == 2L, del.toString)
    val opt = spark.sql(
      s"SELECT * FROM graft_optimize('gnm.db.t', ${1L << 30})").head
    assert(opt.getAs[Long]("latest_version") == 3L, opt.toString)
    assert(spark.sql("SELECT count(*) AS c FROM graft_snapshot('gnm.db.t', 3)")
      .head.getLong(0) == 70L)
    // parity with the path-addressed spelling of the same snapshot
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_snapshot('$root/man', 3)")
      .head.getLong(0) == 70L)
    // changes / restore / vacuum resolve the same way — the whole
    // maintenance surface is name-first
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_changes('gnm.db.t', 1, 2) " +
        "WHERE op = 'delete'").head.getLong(0) == 30L)
    val rst = spark.sql("SELECT * FROM graft_restore('gnm.db.t', 1)").head
    assert(rst.getAs[Long]("new_version") == 4L, rst.toString)
    assert(spark.sql("SELECT count(*) AS c FROM graft_snapshot('gnm.db.t', 4)")
      .head.getLong(0) == 100L)
    assert(spark.sql("SELECT * FROM graft_vacuum('gnm.db.t', 4)").collect()
      .nonEmpty, "vacuum by name reclaimed nothing despite expired versions")
    assert(t.committedVersions == Seq(4))
    // unknown table inside a graft catalog: the catalog's own error
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_history('gnm.db.nope')")
        .queryExecution.analyzed
    }
    assert(e1.getMessage.toLowerCase.contains("table"), e1.getMessage)
    // a registered NON-graft catalog must fail loudly, never be
    // silently retried as a relative path
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_history('spark_catalog.db.t')")
        .queryExecution.analyzed
    }
    assert(e2.getMessage.contains("not a graft"), e2.getMessage)
    // a dotted-3 ref naming NO registered catalog falls through to path
    // semantics — and when that path holds no graft table either, the
    // error NAMES the registered graft catalogs (a typo'd catalog name
    // is the overwhelmingly likely cause)
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_history('no.such.cat')")
        .queryExecution.analyzed
    }
    assert(e3.getMessage.contains("no committed snapshots") &&
      e3.getMessage.contains("registered graft catalog") &&
      e3.getMessage.contains("gnm"), e3.getMessage)
    // a 2-segment ref resolves against the catalog's DEFAULT namespace
    // ('gnm.dt' == 'gnm.default.dt'), so the TVF spelling matches what
    // an unqualified name means under USE gnm
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnm.default")
    spark.sql(
      s"CREATE TABLE gnm.default.dt USING graft OPTIONS (man '$root/man')")
    assert(spark.sql("SELECT max(version) AS v FROM graft_history('gnm.dt')")
      .head.getLong(0) == t.committedVersions.max.toLong,
      "2-segment ref did not resolve through the default namespace")
  }

  test("change feed runs from pure SQL text via graft_changes (same rows as cdc)") {
    import org.apache.spark.sql.functions._
    graft.table.SnapshotSql.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlcdc").toString
    val t = graft.table.GraftTable(spark, s"$root/data", s"$root/man", "id")
    import spark.implicits._
    t.create((1L to 100L).map(i => (i, i * 10L)).toDF("id", "v"), 2)
    // merge: update ids 1..10 (v -> 0), insert ids 101..105
    t.commitMerge(
      ((1L to 10L).map(i => (i, 0L)) ++ (101L to 105L).map(i => (i, i)))
        .toDF("id", "v"), 1)
    val viaSql = spark.sql(
      s"""SELECT op, count(*) AS n FROM graft_changes('${t.man}', 1, 2)
         |GROUP BY op ORDER BY op""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == Seq(("insert", 5L), ("update", 10L)), s"$viaSql")
    val api = t.cdc(1, 2).groupBy("op").agg(count(lit(1)).as("n"))
      .orderBy("op").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == api)
    // misuse fails at analysis with the usage message
    val badV = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('${t.man}', 1, 99)")
        .queryExecution.analyzed
    }
    assert(badV.getMessage.contains("no committed snapshot"))
    val badArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('${t.man}', 1)")
        .queryExecution.analyzed
    }
    assert(badArity.getMessage.contains("3 arguments"))
    val noProps = java.nio.file.Files.createTempDirectory("graft_noprops")
    val badMan = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$noProps', 1, 2)")
        .queryExecution.analyzed
    }
    assert(badMan.getMessage.contains("_table_props"))
  }

  test("as-of join runs from pure SQL text via asof_match (same answer as q53)") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      Tables.load(s2, sfDir, "events").createOrReplaceTempView("ev")
      Tables.load(s2, sfDir, "orders").createOrReplaceTempView("ord")
      val sql = s2.sql(
        """SELECT l.event_id, l.user_id, r.o_orderdate AS last_order_date
          |FROM ev l LEFT JOIN ord r
          |  ON asof_match(l.user_id, r.o_custkey, l.ts, r.o_orderdate)
          |ORDER BY event_id""".stripMargin)
      // the SQL path must plan the native merge operator
      assert(sql.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        "asof_match did not lower to the native as-of operator")
      val viaSql = sql.collect().map(_.toSeq).toSeq
      // same oracle as q53/q53b: the composed union+window formulation
      val composed = SparkEntry.queries("q53_asof_join")(s2, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(viaSql.nonEmpty && viaSql == composed)

      // direction + tolerance literals parse and restrict matches
      val tol = s2.sql(
        """SELECT count(r.o_orderdate) AS n
          |FROM ev l LEFT JOIN ord r
          |  ON asof_match(l.user_id, r.o_custkey, l.ts, r.o_orderdate,
          |                'backward', INTERVAL '1' DAY)""".stripMargin)
        .collect()(0).getLong(0)
      val untol = viaSql.count(_(2) != null).toLong
      assert(tol < untol, s"1-day tolerance did not reduce matches ($tol vs $untol)")

      // a literal negative tolerance is rejected at analysis — including
      // exactly -1 us, which must NOT alias the internal "unbounded"
      // sentinel (ADVICE r8)
      Seq("-1", "-86400000000").foreach { negUs =>
        val neg = intercept[Exception] {
          s2.sql(
            s"""SELECT count(r.o_orderdate) FROM ev l LEFT JOIN ord r
               |  ON asof_match(l.user_id, r.o_custkey, l.ts, r.o_orderdate,
               |                'backward', ${negUs}L)""".stripMargin)
            .queryExecution.analyzed
        }
        assert(neg.getMessage.contains("non-negative"),
          s"tolerance $negUs us not rejected: ${neg.getMessage}")
      }

      // misuse fails at analysis with the usage message, not at runtime
      val inner = intercept[Exception] {
        s2.sql(
          """SELECT * FROM ev l JOIN ord r
            |  ON asof_match(l.user_id, r.o_custkey, l.ts, r.o_orderdate)""".stripMargin)
          .queryExecution.analyzed
      }
      assert(inner.getMessage.contains("LEFT JOIN"))
      val misplaced = intercept[Exception] {
        s2.sql(
          """SELECT * FROM ev l LEFT JOIN ord r
            |  ON asof_match(l.user_id, r.o_custkey, l.ts, r.o_orderdate)
            |     AND l.value > 0""".stripMargin)
          .queryExecution.analyzed
      }
      assert(misplaced.getMessage.contains("outside a supported join condition"))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
