package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** Multi-writer commit protocol (GraftTable.commitAppendOcc): concurrent
  * appenders race on the atomic manifest rename, losers rebase onto the
  * winner's version and retry. The invariants that must survive ANY
  * interleaving: every batch lands exactly once (no silent drops, no
  * double-references), versions stay contiguous, each version adds
  * exactly its one batch, and no data file is left unreferenced. The
  * staged-append file tracking is what makes this sound — a directory
  * diff would misattribute files written by a concurrent writer in the
  * same window. */
class TableConcurrencySpec extends TestBase {

  test("concurrent OCC appends: each batch lands exactly once, versions contiguous, no orphans") {
    val out = java.nio.file.Files.createTempDirectory("graft_occ_data").toString
    val man = java.nio.file.Files.createTempDirectory("graft_occ_man").toString
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val table = GraftTable(spark, out, man, "o_orderkey").create(orders, 4)
    val initRows = orders.count()

    val nWriters = 4
    val perWriter = 3
    val batchRows = 100L
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val writers = (0 until nWriters).map { w =>
        Future {
          (0 until perWriter).map { i =>
            // disjoint negative key ranges per batch: content stays
            // distinguishable whatever order the commits land in
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
      // every writer got a distinct version; together they fill 2..latest
      assert(committed.toSet == (2 to latest).toSet,
        s"versions not contiguous: ${committed.sorted}")
      assert(table.committedVersions == (1 to latest),
        s"committedVersions ${table.committedVersions}")
      // no batch dropped, none double-counted
      assert(table.readAsOf(latest).count() == initRows + total * batchRows)
      // each version adds EXACTLY its one batch on top of its parent
      (1 until latest).foreach { v =>
        assert(table.readAsOf(v + 1).count() - table.readAsOf(v).count()
          == batchRows, s"version ${v + 1} does not add one batch")
      }
      // no duplicate file references, and every referenced file exists
      val refs = table.files(latest)
      assert(refs.size == refs.distinct.size, "manifest references a file twice")
      refs.foreach { f =>
        assert(new java.io.File(new java.net.URI(f).getPath).exists(),
          s"referenced file missing: $f")
      }
      // appends never unreference: the latest snapshot covers every data
      // file, so a vacuum keeping only it must delete NOTHING
      assert(table.vacuum(latest, latest).isEmpty,
        "concurrent appends left unreferenced (misattributed) files")
      // no staging residue in the data dir
      val stray = new java.io.File(out).listFiles()
        .filter(f => f.getName.startsWith("_stage_"))
      assert(stray.isEmpty, s"staging dirs left behind: ${stray.mkString(",")}")

      // a CRASHED writer's staging dir (died before the move) is hidden
      // from readers and reclaimed by vacuum
      val crashed = new java.io.File(out, "_stage_crashed")
      crashed.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(crashed, "part-crashed.parquet").toPath,
        Array[Byte](1, 2, 3))
      val preCount = table.readAsOf(latest).count()
      assert(preCount == initRows + total * batchRows,
        "hidden staging dir leaked into a read")
      table.vacuum(latest, latest)
      assert(!crashed.exists(), "vacuum did not reclaim the crashed staging dir")
      assert(table.readAsOf(latest).count() == preCount)

      // a graced vacuum leaves anything younger than the grace alone —
      // an IN-FLIGHT commit's moved files / staging dir look exactly
      // like crash residue to reference counting, so multi-writer
      // deployments vacuum with a grace exceeding their longest commit
      val inflight = new java.io.File(out, "_stage_inflight")
      inflight.mkdirs()
      table.vacuum(latest, latest, graceMs = 10 * 60 * 1000L)
      assert(inflight.exists(), "graced vacuum deleted an in-flight staging dir")
      table.vacuum(latest, latest) // quiesced (no grace): reclaimed
      assert(!inflight.exists())
    } finally pool.shutdown()
  }

  test("concurrent merges: disjoint key envelopes both commit, overlap fails loudly") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_dm_data").toString
    val man = java.nio.file.Files.createTempDirectory("graft_dm_man").toString
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val table = GraftTable(spark, out, man, "o_orderkey").create(orders, 4)
    val n = orders.count()

    // two merges BOTH planned against v=1 (the deterministic spelling
    // of a race): A commits v=2 first; B — whose key envelope sits in
    // files A never touched and outside A's new entries' boxes — must
    // REBASE mechanically onto v=2 and commit v=3 (the Delta conflict-
    // checker rule), not fail
    val lowMax = 1000L
    val highMin = orders.agg(org.apache.spark.sql.functions
      .expr("percentile(o_orderkey, 0.9)")).head.getDouble(0).toLong
    val a = orders.filter(col("o_orderkey") <= lowMax)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val b = orders.filter(col("o_orderkey") >= highMin)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
    table.commitMerge(a, 1) // v=2
    table.commitMerge(b, 1) // loses v=2, rebases, commits v=3
    assert(table.committedVersions == Seq(1, 2, 3))
    val merged = table.readAsOf(3)
    assert(merged.count() == n, "rebased merge changed the row count")
    // both merges' effects present
    val expectLow = orders.filter(col("o_orderkey") <= lowMax)
      .agg(org.apache.spark.sql.functions.sum(col("o_totalprice") * 2))
      .head.getDouble(0)
    val gotLow = merged.filter(col("o_orderkey") <= lowMax)
      .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      .head.getDouble(0)
    assert(math.abs(expectLow - gotLow) < 1e-6, "merge A's update lost")
    val expectHigh = orders.filter(col("o_orderkey") >= highMin)
      .agg(org.apache.spark.sql.functions.sum(col("o_totalprice") * 3))
      .head.getDouble(0)
    val gotHigh = merged.filter(col("o_orderkey") >= highMin)
      .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      .head.getDouble(0)
    assert(math.abs(expectHigh - gotHigh) < 1e-6, "merge B's update lost")

    // an OVERLAPPING merge still planned against v=1 targets files the
    // winner rewrote — its rewrite is stale; must fail loudly
    val c = orders.filter(col("o_orderkey") <= lowMax)
      .withColumn("o_totalprice", col("o_totalprice") * 5)
    intercept[java.util.ConcurrentModificationException] {
      table.commitMerge(c, 1)
    }
    // and the failed attempt left only vacuumable orphans, no commit
    assert(table.committedVersions == Seq(1, 2, 3))
  }

  test("concurrent MoR deletes: disjoint mask sets both commit, a re-masked file conflicts") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources.{EqualTo => V1Eq}
    val out = java.nio.file.Files.createTempDirectory("graft_dvc_data").toString
    val man = java.nio.file.Files.createTempDirectory("graft_dvc_man").toString
    val spark0 = spark
    import spark0.implicits._
    // two files: low keys 1-500, high keys 501-1000
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val table = GraftTable(spark, s"$out/d", s"$man/m", "id").create(df, 2)

    // both deletes planned against v=1 (the deterministic race): A masks
    // a LOW-file row and commits v=2; B masks a HIGH-file row, loses
    // v=2, sees its whole mask set intact in the winner, REBASES
    // mechanically and commits v=3 — both effects present, versions
    // contiguous, exact combined content
    assert(table.commitDeleteMor(Seq(V1Eq("id", 5L)),
      col("id") === 5L, 1) == 1L)
    assert(table.commitDeleteMor(Seq(V1Eq("id", 505L)),
      col("id") === 505L, 1) == 1L)
    assert(table.committedVersions == Seq(1, 2, 3))
    val got = table.readAsOf(3)
    assert(got.count() == 998L, "rebased MoR delete lost rows")
    assert(got.filter(col("id").isin(5L, 505L)).count() == 0L,
      "both concurrent deletes' masks must be present")
    // live accounting stayed exact through the rebase
    assert(table.manifest(3).agg(
      org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0)
      == 998L)

    // a delete still planned against v=1 masking a file the WINNER
    // re-pointed (the low file changed dv between v=1 and v=3): its
    // positions may be stale relative to the winner's masks — conflict,
    // loudly, never a silent wrong answer
    intercept[java.util.ConcurrentModificationException] {
      table.commitDeleteMor(Seq(V1Eq("id", 6L)), col("id") === 6L, 1)
    }
    assert(table.committedVersions == Seq(1, 2, 3))
    // planned against the LATEST snapshot the same delete commits fine
    assert(table.commitDeleteMor(Seq(V1Eq("id", 6L)),
      col("id") === 6L, 3) == 1L)
    assert(table.readAsOf(4).count() == 997L)
  }

  test("concurrent COW DML: disjoint-envelope UPDATE/DELETE both commit, overlap conflicts") {
    import org.apache.spark.sql.functions.{col, lit, sum}
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    val out = java.nio.file.Files.createTempDirectory("graft_cowc_data").toString
    val man = java.nio.file.Files.createTempDirectory("graft_cowc_man").toString
    val spark0 = spark
    import spark0.implicits._
    // two key-clustered files: low ids 1-500, high ids 501-1000
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val table = GraftTable(spark, s"$out/d", s"$man/m", "id").create(df, 2)

    // both planned against v=1 (the deterministic race): A rewrites the
    // LOW file and commits v=2; B rewrites only the HIGH file, loses
    // v=2, sees its whole impacted set intact in the winner, REBASES
    // mechanically and commits v=3 — exact combined content
    assert(table.commitUpdateCow(col("id") <= 10L,
      Map("v" -> (col("v") + 10000L)), 1,
      impactedOnly = Some(table.prune(1, 1L, 10L)._1)) == 10L)
    assert(table.commitDelete(Seq(GreaterThan("id", 990L)),
      col("id") > 990L, 1, 2, None) == 10L)
    assert(table.committedVersions == Seq(1, 2, 3))
    val got = table.readAsOf(3)
    assert(got.count() == 990L, "rebased COW delete lost rows")
    assert(got.filter(col("id") <= 10L && col("v") === col("id") + 10000L)
      .count() == 10L, "the racing UPDATE's effect must survive")
    assert(got.filter(col("id") > 990L).count() == 0L,
      "the rebased DELETE's effect must be present")
    assert(got.agg(sum("v")).head.getLong(0) ==
      (1L to 990L).sum + 10L * 10000L, "combined content must be exact")

    // an OVERLAPPING COW update still planned against v=1 rewrote the
    // low file the v=2 winner replaced — its survivors are stale; must
    // fail loudly, never silently resurrect pre-update rows
    intercept[java.util.ConcurrentModificationException] {
      table.commitUpdateCow(col("id") <= 10L,
        Map("v" -> lit(-1L)), 1,
        impactedOnly = Some(table.prune(1, 1L, 10L)._1))
    }
    assert(table.committedVersions == Seq(1, 2, 3),
      "a conflicted COW DML must not commit")
  }

  test("concurrent REPLACE WHERE: disjoint regions both commit through the rebase") {
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.sources.{And, GreaterThanOrEqual,
      LessThanOrEqual}
    val out = java.nio.file.Files.createTempDirectory("graft_rwc_data").toString
    val man = java.nio.file.Files.createTempDirectory("graft_rwc_man").toString
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val table = GraftTable(spark, s"$out/d", s"$man/m", "id").create(df, 4)
    def range(lo: Long, hi: Long) =
      Seq(And(GreaterThanOrEqual("id", lo), LessThanOrEqual("id", hi)))
    // both planned against v=1: A swaps the LOW region and wins v=2; B
    // swaps the HIGH region, loses the race, sees every file it
    // impacted intact in the winner, rebases and commits v=3 — one
    // atomic swap each, exact combined content
    assert(table.commitReplaceWhere(range(1L, 100L),
      col("id").between(1L, 100L),
      (1L to 100L).filter(_ % 2 == 0).map(i => (i, i * 100)).toDF("id", "v"),
      1) == 100L)
    assert(table.commitReplaceWhere(range(901L, 1000L),
      col("id").between(901L, 1000L),
      (901L to 1000L).filter(_ % 2 == 1).map(i => (i, -i)).toDF("id", "v"),
      1) == 100L)
    assert(table.committedVersions == Seq(1, 2, 3))
    val got = table.readAsOf(3)
    assert(got.count() == 900L, "both swaps must land exactly")
    assert(got.filter(col("id") <= 100L).agg(sum("v")).head.getLong(0) ==
      (1L to 100L).filter(_ % 2 == 0).map(_ * 100).sum)
    assert(got.filter(col("id") >= 901L).agg(sum("v")).head.getLong(0) ==
      (901L to 1000L).filter(_ % 2 == 1).map(-_).sum)
    assert(got.filter(col("id") > 100L && col("id") < 901L)
      .agg(sum("v")).head.getLong(0) == (101L to 900L).sum,
      "the untouched middle must carry verbatim")
    // an OVERLAPPING replace still planned against v=1 is stale — loud,
    // no version burned
    intercept[java.util.ConcurrentModificationException] {
      table.commitReplaceWhere(range(50L, 60L),
        col("id").between(50L, 60L),
        Seq((55L, 0L)).toDF("id", "v"), 1)
    }
    assert(table.committedVersions == Seq(1, 2, 3))
  }
}
