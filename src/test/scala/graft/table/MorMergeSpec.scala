package graft.table

import graft.{Tables, TestBase}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read (deletion-vector) MERGE — `commitMergeMor`: superseded
  * rows are masked by position-delete vectors and the batch appends,
  * instead of COW-rewriting every envelope-intersecting file. The
  * contracts pinned here:
  *  - content EXACTLY equals the COW merge's (hash-equal live rows);
  *  - per-batch WRITE cost is O(batch): no pre-existing data file is
  *    rewritten, the only new bytes are the batch's files + one DV;
  *  - reads (readAsOf, graft_snapshot SQL), cdc, the streaming change
  *    feed, history's live n_rows, and time travel all stay exact;
  *  - OPTIMIZE folds DVs back into clean files (content bit-equal,
  *    dv-free) and vacuum then reclaims the DV files;
  *  - format("graft") raw-scan reads of a DV-carrying snapshot fail
  *    loudly instead of resurrecting masked rows.
  */
class MorMergeSpec extends TestBase {

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private def orders: DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** An upsert batch: SCATTERED updates (every 7th key — they land in
    * every range-clustered file, the workload MoR exists for: a COW
    * merge would rewrite the whole table, MoR masks a few rows per
    * file) + fresh keys above the domain. */
  private def batchOf(df: DataFrame): DataFrame =
    df.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .unionByName(df.filter(col("o_orderkey") % 5 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))

  test("MoR merge content equals COW merge; no pre-existing file rewritten") {
    val rMor = root("mor"); val rCow = root("cow")
    val mor = GraftTable(spark, s"$rMor/data", s"$rMor/man", "o_orderkey")
    val cow = GraftTable(spark, s"$rCow/data", s"$rCow/man", "o_orderkey")
    mor.create(orders, 8); cow.create(orders, 8)
    val batch = batchOf(orders)
    val filesBefore = mor.files(1).toSet
    mor.commitMergeMor(batch, 1, 4)
    cow.commitMerge(batch, 1, 4)
    assert(sameRows(mor.readAsOf(2), cow.readAsOf(2)),
      "MoR live content differs from the COW merge")
    // O(batch) writes: EVERY v1 file survives into v2 (DV-masked, not
    // rewritten — the scattered updates touch all of them), while the
    // COW table rewrote every impacted file
    assert(filesBefore.subsetOf(mor.files(2).toSet),
      "the MoR merge rewrote a pre-existing file")
    assert(mor.hasLiveDvs(2), "the MoR merge recorded no deletion vector")
    assert(cow.files(2).toSet.intersect(cow.files(1).toSet).isEmpty,
      "precondition: the scattered COW merge should rewrite every file")
    // ONE combined DV file carries all masked positions
    val dvFiles = mor.entryPairs(2).flatMap(_._2).distinct
    assert(dvFiles.size == 1, s"expected one combined DV, got $dvFiles")
  }

  test("snapshot isolation + time travel: v1 still reads pre-merge content") {
    val r = root("mor_travel")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 6)
    tbl.commitMergeMor(batchOf(orders), 1, 4)
    assert(sameRows(tbl.readAsOf(1), orders),
      "v1 no longer reads the pre-merge content")
  }

  test("repeated MoR merges accumulate one combined DV per file; last write wins") {
    val r = root("mor_repeat")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 6)
    // two SCATTERED overlapping merges (every 3rd / every 2nd key)
    val b1 = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val b2 = orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
    tbl.commitMergeMor(b1, 1, 2)
    tbl.commitMergeMor(b2, 2, 2)
    val expect = orders
      .filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 2 =!= 0)
      .unionByName(b1.filter(col("o_orderkey") % 2 =!= 0))
      .unionByName(b2)
    assert(sameRows(tbl.readAsOf(3), expect),
      "overlapping MoR merges did not converge to last-writer-wins")
    // each entry still points at ONE dv (readers apply exactly one)
    val pairs = tbl.entryPairs(3)
    assert(pairs.flatMap(_._2).distinct.size <= 2,
      "more DV files than commits")
  }

  test("overlapping old DVs across partially-superseded files: manifest live counts stay exact") {
    // the merge twin of GraftDmlSpec's re-masking regression: merge 1
    // masks one key in each of two files (one combined dv); merge 2
    // re-masks only the LOW file (its dv is superseded while the high
    // file still points at the old combined vector holding the low
    // file's stale position); merge 3 hits both files — the low file's
    // old debt must count from ITS OWN vector only, or live n_rows
    // inflates and every manifest consumer (stats-only counts,
    // history, OPTIMIZE debt math) goes wrong
    val s = spark
    import s.implicits._
    val r = root("mor_overlap")
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val tbl = GraftTable(s, s"$r/data", s"$r/man", "id")
    tbl.create(df, 2)
    def upd(ids: Long*) = ids.map(i => (i, -i)).toDF("id", "v")
    tbl.commitMergeMor(upd(1L, 501L), 1)
    tbl.commitMergeMor(upd(2L), 2)
    tbl.commitMergeMor(upd(3L, 502L), 3)
    (2 to 4).foreach { v =>
      val content = tbl.readAsOf(v).count()
      val manifest = tbl.manifest(v).agg(sum("n_rows")).head.getLong(0)
      assert(content == 1000L, s"v$v content $content")
      assert(manifest == 1000L,
        s"v$v manifest live counts diverged: $manifest vs $content")
    }
    // last-writer-wins content
    assert(tbl.readAsOf(4).filter(col("v") < 0).count() == 5L)
  }

  test("cdc and the streaming change feed see a MoR merge's row-level churn") {
    val r = root("mor_cdc")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 6)
    val batch = batchOf(orders)
    tbl.commitMergeMor(batch, 1, 4)
    val nUpd = orders.filter(col("o_orderkey") % 7 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 5 === 0).count()
    val ops = tbl.cdc(1, 2).groupBy("op").count().collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(ops == Map("update" -> nUpd, "insert" -> nIns),
      s"cdc across the MoR merge: expected $nUpd updates + $nIns inserts, got $ops")
    // the update rows carry old and new values
    val one = tbl.cdc(1, 2).filter(col("op") === "update")
      .filter(col("new_o_totalprice") =!= col("old_o_totalprice") * 2)
    assert(one.isEmpty, "an update row's new value is not 2x its old")
  }

  test("history records LIVE n_rows; fully-masked entries are dropped") {
    val r = root("mor_hist")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 6)
    tbl.commitMergeMor(batchOf(orders), 1, 4)
    val h = tbl.history().orderBy("version").collect()
    assert(h(1).getAs[Long]("n_rows") == tbl.readAsOf(2).count(),
      "history n_rows must be the LIVE row count under MoR")
    // a merge that supersedes EVERY row of the table masks all entries
    // to zero live rows — they drop from the manifest entirely
    val r2 = root("mor_full")
    val t2 = GraftTable(spark, s"$r2/data", s"$r2/man", "o_orderkey")
    val slice = orders.filter(col("o_orderkey") < 500)
    t2.create(slice, 2)
    t2.commitMergeMor(slice.withColumn("o_totalprice", lit(1.0)), 1, 2)
    assert(t2.files(2).toSet.intersect(t2.files(1).toSet).isEmpty,
      "fully-masked entries must be dropped, not kept at zero rows")
    assert(sameRows(t2.readAsOf(2),
      slice.withColumn("o_totalprice", lit(1.0))))
  }

  test("OPTIMIZE folds DVs: content bit-equal, dv-free; vacuum reclaims the DV files") {
    val r = root("mor_opt")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 6)
    tbl.commitMergeMor(batchOf(orders), 1, 4)
    val live = tbl.readAsOf(2)
    val dvNames = tbl.entryPairs(2).flatMap(_._2)
      .map(p => new Path(p).getName).distinct
    assert(dvNames.nonEmpty)
    val packed = tbl.commitCompaction(2, 1L << 30)
    assert(packed > 0, "compaction must fold the DV-carrying files")
    val v3 = tbl.committedVersions.max
    assert(!tbl.hasLiveDvs(v3), "DVs survived compaction")
    assert(sameRows(tbl.readAsOf(v3), live),
      "compaction changed the live content")
    assert(!tbl.dataChange(v3), "DV folding is layout-only (live rows equal)")
    // drop the pre-compaction versions: the DV files are unreferenced
    val fs = new Path(s"$r/data").getFileSystem(
      spark.sessionState.newHadoopConf())
    tbl.vacuum(v3, v3)
    dvNames.foreach { n =>
      assert(!fs.exists(new Path(s"$r/data", n)),
        s"vacuum left unreferenced DV file $n")
    }
    // while still referenced, vacuum must SPARE them
    val r2 = root("mor_opt2")
    val t2 = GraftTable(spark, s"$r2/data", s"$r2/man", "o_orderkey")
    t2.create(orders, 4)
    t2.commitMergeMor(batchOf(orders), 1, 2)
    val dv2 = t2.entryPairs(2).flatMap(_._2).map(p => new Path(p).getName)
    t2.vacuum(2, 2) // v2 still references the DV
    val fs2 = new Path(s"$r2/data").getFileSystem(
      spark.sessionState.newHadoopConf())
    dv2.foreach(n => assert(fs2.exists(new Path(s"$r2/data", n)),
      s"vacuum deleted still-referenced DV file $n"))
  }

  test("graft_snapshot SQL reads apply DVs; format(\"graft\") fails loudly") {
    SnapshotSql.register(spark)
    val r = root("mor_sql")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 6)
    val batch = batchOf(orders)
    tbl.commitMergeMor(batch, 1, 4)
    val sql = spark.sql(
      s"""SELECT count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS ck
         |FROM graft_snapshot('$r/man', 2)
         |WHERE o_orderkey BETWEEN 1000 AND 2999""".stripMargin).head
    val want = tbl.readAsOf(2)
      .filter(col("o_orderkey").between(1000, 2999))
    assert(sql.getLong(0) == want.count() &&
      sql.getLong(1) == want.agg(sum("o_custkey")).head.getLong(0),
      "graft_snapshot over a DV snapshot returned non-live rows")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load(s"$r/man").count()
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // after OPTIMIZE the raw-scan path works again
    tbl.commitCompaction(2, 1L << 30)
    assert(spark.read.format("graft").load(s"$r/man").count()
      == tbl.readAsOf(tbl.committedVersions.max).count())
  }

  test("COW merge AFTER a MoR merge reads survivors through the DVs: masked rows stay dead") {
    val r = root("mor_then_cow")
    val t = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    t.create(orders, 8)
    // MoR: double every 7th key's price (their old rows become masked)
    t.commitMergeMor(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2), 1, 4)
    assert(t.hasLiveDvs(2))
    // a COW merge overlapping the same envelope: its survivor rewrite
    // must start from the files' EFFECTIVE content — a raw parquet read
    // would resurrect the %7 keys' OLD rows as live duplicates (the r12
    // ADVICE finding)
    t.commitMerge(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 3), 2, 4)
    val expect = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 3)
        .when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")))
    assert(t.readAsOf(3).count() == orders.count(),
      "COW-after-MoR resurrected masked rows (duplicate keys)")
    assert(sameRows(t.readAsOf(3), expect),
      "COW-after-MoR content drifted from the expected upsert result")
  }

  test("range DELETE after a MoR merge: dead rows neither counted nor resurrected") {
    val r = root("mor_then_del")
    val t = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    t.create(orders, 8)
    // MoR-update every row INSIDE the soon-to-be-deleted range: each
    // key now has a masked old row and a live new one
    t.commitMergeMor(orders.filter(col("o_orderkey").between(1000, 2999))
      .withColumn("o_totalprice", col("o_totalprice") * 2), 1, 4)
    val inRange = orders.filter(col("o_orderkey").between(1000, 2999)).count()
    // delete the range: nDel counts LIVE rows only (not the masked
    // duplicates), and the survivor rewrite applies the DVs
    val nDel = t.commitDeleteRange(1000L, 2999L, 2, 4)
    assert(nDel == inRange,
      s"delete counted masked rows: $nDel deleted vs $inRange live in range")
    assert(sameRows(t.readAsOf(3),
      orders.filter(!col("o_orderkey").between(1000, 2999))),
      "delete-after-MoR resurrected masked rows or dropped survivors")
  }

  test("vacuum reclaims crashed _stage_dv_ staging dirs") {
    val r = root("dv_stage")
    val t = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    t.create(orders.filter(col("o_orderkey") < 2000), 2)
    // simulate a MoR writer that died between staging its DV file and
    // the rename — the stage is underscore-hidden (invisible to reads)
    // but still holds bytes; vacuum's _stage_* sweep must reclaim it
    val fs = new Path(s"$r/data")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new Path(s"$r/data", "_stage_dv_deadbeef")
    fs.mkdirs(stage)
    fs.create(new Path(stage, "part-00000.parquet"), true).close()
    t.vacuum(1, 1)
    assert(!fs.exists(stage), "crashed DV staging dir not reclaimed")
  }

  test("no-key-overlap MoR merge is a pure append: no DV, no dv column") {
    val r = root("mor_disjoint")
    val tbl = GraftTable(spark, s"$r/data", s"$r/man", "o_orderkey")
    tbl.create(orders, 4)
    val fresh = orders.limit(200)
      .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
    tbl.commitMergeMor(fresh, 1, 2)
    assert(!tbl.manifest(2).columns.contains("dv"),
      "a no-overlap merge must not introduce the dv column")
    assert(sameRows(tbl.readAsOf(2), orders.unionByName(fresh)))
  }
}
