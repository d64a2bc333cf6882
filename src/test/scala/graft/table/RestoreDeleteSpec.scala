package graft.table

import graft.{Tables, TestBase}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RESTORE (commit a new version referencing an old snapshot's exact
  * file list — Delta's RESTORE TABLE) and ranged copy-on-write DELETE
  * (rewrite only the files whose manifest key boxes intersect the
  * doomed range — Delta's DELETE WHERE), plus their SQL TVF surfaces
  * `graft_restore` / `graft_delete`. The scale contracts pinned here:
  * restore moves ZERO data bytes, delete rewrites ONLY the envelope's
  * files, and both compose with the existing machinery (time travel,
  * change feed, history) without special cases. */
class RestoreDeleteSpec extends TestBase {

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private def orders: DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("restore: content and change feed round-trip; zero data bytes move") {
    val r = root("restore")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders.filter(col("o_orderkey") % 3 === 0), 4) // v1
    tbl.commitAppend(orders.filter(col("o_orderkey") % 3 === 1), 1, 2) // v2
    val v1Rows = tbl.readAsOf(1)
    val filesBefore = tbl.partFiles
    val v = tbl.commitRestore(1)
    assert(v == 3 && tbl.committedVersions == Seq(1, 2, 3))
    assert(tbl.partFiles == filesBefore,
      "restore wrote or removed data files — it must only commit a manifest")
    assert(tbl.files(3).sorted == tbl.files(1).sorted,
      "the restored snapshot must reference v1's exact file list")
    assert(sameRows(tbl.readAsOf(3), v1Rows), "restored content differs from v1")
    assert(sameRows(tbl.readAsOf(2),
      orders.filter(col("o_orderkey") % 3 === 0)
        .unionByName(orders.filter(col("o_orderkey") % 3 === 1))),
      "the undone version must stay time-travelable")
    assert(tbl.dataChange(3), "a content-changing restore is dataChange=true")
    // the change feed sees ordinary COW churn: the restore undid v2's
    // appended rows, so cdc(2 -> 3) is exactly those keys as deletes
    val ops = tbl.cdc(2, 3).groupBy("op").count().collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    val appended = orders.filter(col("o_orderkey") % 3 === 1).count()
    assert(ops == Map("delete" -> appended),
      s"cdc across the restore should be $appended deletes, got $ops")
  }

  test("restore: the restored snapshot's SCHEMA rides along — a widening append narrows back") {
    val r = root("restore_schema")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 4) // v1
    tbl.commitAppend(orders.filter(col("o_orderkey").between(1, 50))
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
      .withColumn("flag", lit(true)), 1, 2) // v2: widened by `flag`
    assert(tbl.versionSchema(2).exists(_.fieldNames.contains("flag")),
      "precondition: the append must have widened the recorded schema")
    val v = tbl.commitRestore(1)
    assert(tbl.versionSchema(v) == tbl.versionSchema(1),
      "restore must record the restored snapshot's schema, not the latest's")
  }

  test("restore: a schema-only difference is NOT a no-op — the target schema narrows back") {
    val r = root("restore_schema_only")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 4) // v1
    // v2: an EMPTY append that only widens the recorded schema — the
    // file set is v1's exactly, so a file-set-only no-op check would
    // wrongly return v2 and never narrow the schema back
    tbl.commitAppend(orders.limit(0).withColumn("flag", lit(true)), 1, 2)
    assert(tbl.files(2).toSet == tbl.files(1).toSet,
      "precondition: the empty widening append must not add files")
    assert(tbl.versionSchema(2) != tbl.versionSchema(1),
      "precondition: v2 must record a widened schema")
    val v = tbl.commitRestore(1)
    assert(v == 3, s"schema-only restore must commit a new version, got $v")
    assert(tbl.versionSchema(3) == tbl.versionSchema(1),
      "the restored version must record the target's (narrow) schema")
  }

  test("restore: identical content is a no-op — no burned version") {
    val r = root("restore_noop")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 4)
    assert(tbl.commitRestore(1) == 1, "restoring to the current content " +
      "must return the existing latest")
    assert(tbl.committedVersions == Seq(1), "no-op restore burned a version")
  }

  test("restore: a missing referenced file fails loudly before committing") {
    val r = root("restore_missing")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 4) // v1
    tbl.commitMerge(orders.filter(col("o_orderkey").between(1, 100))
      .withColumn("o_totalprice", col("o_totalprice") * 2), 1, 2) // v2
    // surgically remove a file only v1 references (COW left it on disk)
    val onlyV1 = (tbl.files(1).toSet -- tbl.files(2).toSet).head
    val p = new Path(onlyV1)
    assert(p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false))
    val e = intercept[IllegalArgumentException] { tbl.commitRestore(1) }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
    assert(tbl.committedVersions == Seq(1, 2),
      "a failed restore must not commit anything")
  }

  test("delete range: only envelope files rewritten; count, content and cdc exact") {
    val r = root("delete")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 8) // v1: clustered, so boxes are tight
    val untouched = tbl.manifest(1).collect()
      .filterNot(GraftTable.boxIntersects(_, "lo", "hi", 1000L, 2999L))
      .map(_.getAs[String]("file")).toSet
    assert(untouched.nonEmpty,
      "precondition: the range must miss at least one file's box")
    val want = orders.filter(col("o_orderkey").between(1000, 2999)).count()
    val nDel = tbl.commitDeleteRange(1000L, 2999L, 1)
    assert(nDel == want, s"deleted $nDel, expected $want")
    assert(untouched.subsetOf(tbl.files(2).toSet),
      "a file outside the doomed envelope was rewritten")
    assert(sameRows(tbl.readAsOf(2),
      orders.filter(!col("o_orderkey").between(1000, 2999))),
      "surviving content differs from NOT BETWEEN")
    assert(sameRows(tbl.readAsOf(1), orders), "snapshot isolation broken")
    val ops = tbl.cdc(1, 2).groupBy("op").count().collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(ops == Map("delete" -> nDel),
      s"cdc across the delete should be $nDel deletes, got $ops")
  }

  test("delete range: an empty range burns no version — even inside a kept box") {
    val r = root("delete_noop")
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(evens, 4)
    // beyond the key space: no box intersects, planning-only no-op
    val top = evens.agg(max("o_orderkey")).head.getLong(0)
    assert(tbl.commitDeleteRange(top + 1, top + 1000, 1) == 0L)
    // inside a kept box but on a key that does not exist (the table
    // holds only EVEN keys): the conservative box intersects, the
    // count scan finds nothing, no rewrite and no commit happen
    val mid = evens.agg(min("o_orderkey")).head.getLong(0) + 1001L
    val gap = if (mid % 2 == 0) mid + 1 else mid // an odd key mid-box
    assert(gap < top, "precondition: the probe key must sit inside the key space")
    assert(tbl.commitDeleteRange(gap, gap, 1) == 0L)
    assert(tbl.committedVersions == Seq(1), "a no-op delete burned a version")
  }

  test("delete range: string and timestamp keys go through their box codecs") {
    // string key: the doc-key shape from q122
    val r = root("delete_str")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(concat(lit("doc"),
        lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
        col("lang"), col("n_chars"))
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "doc_key")
    tbl.create(docs, 4)
    val want = docs.filter(
      col("doc_key").between("doc00000100", "doc00000199")).count()
    assert(want > 0)
    val nDel = tbl.commitDeleteRange("doc00000100", "doc00000199", 1)
    assert(nDel == want, s"string-keyed delete removed $nDel, expected $want")
    assert(sameRows(tbl.readAsOf(2),
      docs.filter(!col("doc_key").between("doc00000100", "doc00000199"))))

    // timestamp key: bounds in epoch MICROS (the box representation)
    val r2 = root("delete_ts")
    val ev = Tables.load(spark, sfDir, "events")
      .select("ts", "event_id", "event_type", "value")
    val tt = GraftTable(spark, s"$r2/data", s"$r2/man", "ts")
    tt.create(ev, 4)
    def micros(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    val (lo, hi) = (micros("2024-01-10T00:00:00Z"), micros("2024-01-12T00:00:00Z"))
    val doomed = ev.filter(unix_micros(col("ts")).between(lo, hi)).count()
    assert(doomed > 0)
    assert(tt.commitDeleteRange(lo, hi, 1) == doomed)
    assert(tt.readAsOf(2).count() == ev.count() - doomed)
  }

  test("delete/OPTIMIZE across a widening append rewrite with the RECORDED schema") {
    // After a widening append the table's files have heterogeneous
    // schemas; a rewrite that read them with sampled-file inference
    // could pick a pre-widening file and silently drop the widened
    // column from every survivor. Both rewrite paths must read with the
    // commit-recorded schema instead.
    val r = root("delete_widen")
    // split the key space by quantiles so the test holds at any sf
    val Array(q40, q60, q80) = orders.stat
      .approxQuantile("o_orderkey", Array(0.4, 0.6, 0.8), 0.0)
      .map(_.toLong)
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders.filter(col("o_orderkey") <= q40), 2) // v1: narrow files
    tbl.commitAppend(orders.filter(col("o_orderkey") > q40)
      .withColumn("flag", lit(true)), 1, 2) // v2: widened files
    // the doomed range straddles old and new files; widened rows with
    // keys above it SURVIVE inside impacted files and must keep `flag`
    val nWideSurvivors = orders.filter(col("o_orderkey") > q80).count()
    assert(nWideSurvivors > 0)
    val nDel = tbl.commitDeleteRange(q60, q80, 2)
    assert(nDel ==
      orders.filter(col("o_orderkey").between(q60, q80)).count())
    val surv = tbl.readAsOf(3)
    assert(surv.columns.contains("flag"),
      "the delete rewrite dropped the widened column")
    assert(surv.filter(col("o_orderkey") > q80 && col("flag")).count()
      == nWideSurvivors,
      "surviving widened rows lost their `flag` values in the rewrite")
    assert(tbl.versionSchema(3).exists(_.fieldNames.contains("flag")),
      "the delete commit must keep recording the widened schema")

    // OPTIMIZE over the same mixed-schema population: fold everything
    // into one file and the widened values must survive verbatim
    val packed = tbl.commitCompaction(3, 1L << 30)
    assert(packed > 0, "precondition: compaction must fold some files")
    val opt = tbl.readAsOf(tbl.committedVersions.max)
    assert(opt.columns.contains("flag") &&
      opt.filter(col("o_orderkey") > q80 && col("flag")).count()
        == nWideSurvivors,
      "compaction lost widened-column values on the mixed-schema table")
  }

  test("SQL: graft_restore / graft_delete parity, and misuse is loud") {
    SnapshotSql.register(spark)
    val r = root("sql_dml")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 4) // v1
    val del = spark.sql(
      s"SELECT * FROM graft_delete('$r/man', 1000, 2999)").head
    val wantDel = orders.filter(col("o_orderkey").between(1000, 2999)).count()
    assert(del.getLong(0) == wantDel && del.getLong(1) == 2L,
      s"graft_delete returned $del, expected ($wantDel, 2)")
    val res = spark.sql(
      s"SELECT * FROM graft_restore('$r/man', 1)").head
    assert(res.getLong(0) == 1L && res.getLong(1) == 3L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft_snapshot('$r/man', 3)")
      .head.getLong(0) == orders.count(),
      "SQL restore did not bring the deleted rows back")
    // misuse: arity, bad version, bound/key type mismatch
    intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM graft_restore('$r/man')")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM graft_restore('$r/man', 99)")
    }
    intercept[IllegalArgumentException] { // string bounds on a long key
      spark.sql(s"SELECT * FROM graft_delete('$r/man', 'a', 'z')")
    }
    val mixed = intercept[IllegalArgumentException] { // DATE lo, TIMESTAMP hi
      spark.sql(s"SELECT * FROM graft_delete('$r/man', " +
        "DATE'2024-01-01', TIMESTAMP'2024-01-02 00:00:00')")
    }
    assert(mixed.getMessage.contains("SAME kind"), mixed.getMessage)
    val wrongKind = intercept[IllegalArgumentException] { // ts on long key
      spark.sql(s"SELECT * FROM graft_delete('$r/man', " +
        "TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-02 00:00:00')")
    }
    assert(wrongKind.getMessage.contains("must be integral"),
      wrongKind.getMessage)
    val strOnLong = intercept[IllegalArgumentException] { // int lo, str hi
      spark.sql(s"SELECT * FROM graft_delete('$r/man', 1000, 'z')")
    }
    assert(strOnLong.getMessage.contains("SAME kind"), strOnLong.getMessage)
  }
}
