package graft

import graft.operators.CurationQueries
import org.apache.spark.sql.functions._

/** File-skipping manifest (q100): the min/max stats table written with
  * the layout must let the reader skip whole files — and must never
  * skip a file that could hold a matching row. The second property is
  * what the DuckDB oracle proves (pruned read == full-scan filter);
  * this spec proves the first (files actually get skipped) plus the
  * boundary cases the fixed query range cannot reach.
  */
class ManifestSkipSpec extends TestBase {

  private lazy val layout = CurationQueries.manifestLayout(spark, sfDir)

  test("the query range keeps a strict subset of files") {
    val (_, man) = layout
    val (kept, total) = CurationQueries.manifestPrune(spark, man, 100L, 2000L)
    assert(total >= 8, s"clustered layout produced only $total files")
    assert(kept.nonEmpty, "pruned everything — the range overlaps the data")
    assert(kept.size < total,
      s"no files skipped (kept ${kept.size} of $total) — manifest useless")
  }

  test("pruned read equals the full-scan filter, row for row") {
    val (out, man) = layout
    val (kept, _) = CurationQueries.manifestPrune(spark, man, 100L, 2000L)
    val pruned = spark.read.parquet(kept: _*)
      .filter(col("l_orderkey").between(100, 2000))
    val full = spark.read.parquet(out)
      .filter(col("l_orderkey").between(100, 2000))
    assert(pruned.count() == full.count())
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("an empty-intersection range prunes to zero files") {
    val (_, man) = layout
    val (kept, _) = CurationQueries.manifestPrune(spark, man, -500L, -1L)
    assert(kept.isEmpty, s"kept $kept for a range below the domain")
  }

  test("incremental append extends the manifest without touching old entries") {
    val (out, man) = layout
    val manBefore = spark.read.parquet(man)
      .collect().map(_.toSeq).toSet
    val maxKey = spark.read.parquet(out)
      .agg(max("l_orderkey")).head.getLong(0)
    // a batch entirely ABOVE the current key domain, so its files are
    // distinguishable in the manifest
    val batch = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_orderkey") + maxKey + 1000L).as("l_orderkey"),
        col("l_quantity"), col("l_extendedprice"))
      .limit(5000)
    CurationQueries.manifestAppend(spark, (out, man), batch)
    val manAfter = spark.read.parquet(man).collect()
    // old entries survive byte-identical; new entries exist and cover
    // only the shifted key range
    assert(manBefore.subsetOf(manAfter.map(_.toSeq).toSet))
    val fresh = manAfter.map(_.toSeq).toSet -- manBefore
    assert(fresh.nonEmpty)
    assert(fresh.forall(_(1).asInstanceOf[Long] > maxKey),
      s"new manifest entries leak into the old key range: $fresh")
    // a query in the new range prunes to new files only
    val (kept, total) = CurationQueries.manifestPrune(
      spark, man, maxKey + 1000L, maxKey + 2000L)
    assert(total == manAfter.length)
    assert(kept.nonEmpty && kept.size < total)
  }

  test("stats-only count: covered files answered from the manifest, boundary files read") {
    val (out, man) = layout
    val (statsRows, boundaryFiles, nCovered) =
      CurationQueries.statsOnlySplit(spark, man, 100L, 2000L)
    // the wide range fully covers most boxes — those are METADATA-only
    assert(nCovered > 0 && statsRows > 0,
      s"no file answered from stats alone (covered=$nCovered)")
    val total = spark.read.parquet(man).count()
    assert(boundaryFiles.size < nCovered,
      s"boundary ${boundaryFiles.size} vs covered $nCovered of $total — " +
        "the stats-only path carries no weight on this fixture")
    // exactness: stats + boundary scan == the full-scan answer
    val boundaryCount =
      if (boundaryFiles.isEmpty) 0L
      else spark.read.parquet(boundaryFiles: _*)
        .filter(col("l_orderkey").between(100L, 2000L)).count()
    val full = spark.read.parquet(out)
      .filter(col("l_orderkey").between(100L, 2000L)).count()
    assert(statsRows + boundaryCount == full,
      s"$statsRows (stats) + $boundaryCount (boundary) != $full")
  }

  test("multi-column boxes over the z-ordered layout prune on EITHER dimension") {
    import graft.table.GraftTable
    val (out, man) = CurationQueries.multiColLayout(spark, sfDir)
    val total = spark.read.parquet(man).count().toInt
    assert(total >= 8, s"z-ordered layout produced only $total files")
    // each dimension must prune files ON ITS OWN — the property a
    // single-column manifest cannot offer (its files span the full
    // domain of every non-key column)
    val okDomain = spark.read.parquet(out)
      .agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head
    val (okOnly, _) = GraftTable.pruneManifestMulti(spark, man,
      Seq(("l_orderkey", okDomain.getLong(0), okDomain.getLong(0) + 100L)))
    val (pkOnly, _) = GraftTable.pruneManifestMulti(spark, man,
      Seq(("l_partkey", okDomain.getLong(2), okDomain.getLong(2) + 20L)))
    assert(okOnly.nonEmpty && okOnly.size < total,
      s"l_orderkey alone kept ${okOnly.size} of $total — no pruning")
    assert(pkOnly.nonEmpty && pkOnly.size < total,
      s"l_partkey alone kept ${pkOnly.size} of $total — no pruning")
    // both predicates together keep at most the intersection
    val (both, _) = GraftTable.pruneManifestMulti(spark, man,
      Seq(("l_orderkey", okDomain.getLong(0), okDomain.getLong(0) + 100L),
        ("l_partkey", okDomain.getLong(2), okDomain.getLong(2) + 20L)))
    assert(both.size <= math.min(okOnly.size, pkOnly.size))
    // no false skip: the pruned two-sided read equals the full filter
    val (kept, _) = GraftTable.pruneManifestMulti(spark, man,
      Seq(("l_orderkey", 100L, 2000L), ("l_partkey", 50L, 1500L)))
    val pred = col("l_orderkey").between(100, 2000) &&
      col("l_partkey").between(50, 1500)
    val pruned =
      (if (kept.isEmpty) spark.read.parquet(out).where(lit(false))
       else spark.read.parquet(kept: _*)).filter(pred)
    val full = spark.read.parquet(out).filter(pred)
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("a boundary-touching range keeps the boundary file (no false skip)") {
    val (out, man) = layout
    // the global max key sits in exactly one file; a point query on it
    // must keep that file
    val maxKey = spark.read.parquet(out).agg(max("l_orderkey")).head.getLong(0)
    val (kept, total) = CurationQueries.manifestPrune(spark, man, maxKey, maxKey)
    assert(kept.nonEmpty && kept.size < total)
    val n = spark.read.parquet(kept: _*)
      .filter(col("l_orderkey") === maxKey).count()
    assert(n > 0, "boundary row lost by pruning")
  }

  // ---- string keys: bounded-prefix boxes ----------------------------

  test("string-keyed boxes skip files; pruned read equals the full filter") {
    import spark.implicits._
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_strbox").toString
    val docs = (0 until 2000).map(i => (f"doc$i%06d", i.toLong))
      .toDF("doc_id", "v")
    val t = GraftTable(spark, s"$root/data", s"$root/man", "doc_id")
    t.create(docs, 8)
    val (kept, total) = t.prune(1, "doc000100", "doc000399")
    assert(total == 8 && kept.nonEmpty && kept.size < total,
      s"string range must skip files: kept ${kept.size} of $total")
    val pred = col("doc_id").between("doc000100", "doc000399")
    val pruned = spark.read.parquet(kept: _*).filter(pred)
    val full = t.readAsOf(1).filter(pred)
    assert(pruned.count() == 300 && full.count() == 300)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // out-of-domain ranges prune everything, both sides
    assert(t.prune(1, "a", "b")._1.isEmpty)
    assert(t.prune(1, "e", "f")._1.isEmpty)
  }

  test("prefix-collision boundary: keys equal through the truncation length never falsely skip") {
    import spark.implicits._
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_strcoll").toString
    // every key shares the SAME 16-code-point prefix and is longer than
    // it, so both files' stored boxes collapse to the identical
    // [prefix, prefix⁺) interval — the boxes cannot tell the files
    // apart, and the only correct behavior is to keep BOTH
    val prefix = "sharedprefix0123" // exactly 16 code points
    val low = (0 until 50).map(i => (f"$prefix-a$i%04d", i.toLong))
    val high = (0 until 50).map(i => (f"$prefix-z$i%04d", 100L + i))
    val t = GraftTable(spark, s"$root/data", s"$root/man", "doc_id")
    t.create(low.toDF("doc_id", "v"), 1)
    t.commitAppend(high.toDF("doc_id", "v"), 1, 1)
    // stored boxes really are truncated (not the full 21-char keys)
    val entries = t.manifest(2).collect()
    assert(entries.length == 2)
    entries.foreach { r =>
      assert(r.getAs[String]("lo").length <= prefix.length &&
        r.getAs[String]("hi").length <= prefix.length + 1,
        s"box not truncated: ${r.getAs[String]("lo")} / ${r.getAs[String]("hi")}")
    }
    // a point probe on a LOW-file key must keep the low file — and,
    // boxes being identical, conservatively keeps the high file too
    val probe = low(5)._1
    val (kept, total) = t.prune(2, probe, probe)
    assert(total == 2 && kept.size == 2,
      s"collision boxes are indistinguishable — must keep both, kept ${kept.size}")
    assert(spark.read.parquet(kept: _*)
      .filter(col("doc_id") === probe).count() == 1, "false skip on collision")
    // below/above the shared prefix still prunes everything
    assert(t.prune(2, "shared", "sharedprefix0122")._1.isEmpty)
    assert(t.prune(2, "sharedprefix0125", "z")._1.isEmpty)
  }

  test("non-ASCII string keys: UTF-8 box order matches Spark's min/max order") {
    import spark.implicits._
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_strutf8").toString
    // mix ASCII, Latin-1, CJK and an astral-plane emoji — UTF-8 byte
    // order differs from UTF-16 code-unit order exactly here
    val keys = Seq("alpha", "zeta", "étude", "中文键", "日本語",
      "😀emoji", "ÿclose", "zz�repl")
    val t = GraftTable(spark, s"$root/data", s"$root/man", "doc_id")
    t.create(keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("doc_id", "v"), 4)
    keys.foreach { k =>
      val (kept, _) = t.prune(1, k, k)
      assert(spark.read.parquet(kept: _*)
        .filter(col("doc_id") === k).count() == 1,
        s"false skip on non-ASCII key '$k'")
    }
  }

  test("double boxes: NaN, signed zero and infinities never cause a false skip") {
    import spark.implicits._
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_dbl").toString
    // three key blocks so the clustered write lands them in distinct
    // files: a normal block whose x-max is -0.0 (the signed-zero trap),
    // a NaN-carrying block (its x-box must store NULL = unbounded),
    // and an infinities block
    val df = Seq(
      (1L, -5.5), (2L, -1.25), (3L, -0.0),
      (11L, 7.0), (12L, Double.NaN), (13L, 9.0),
      (21L, Double.NegativeInfinity), (22L, 42.0),
      (23L, Double.PositiveInfinity)).toDF("id", "x")
    val t = GraftTable(spark, s"$root/data", s"$root/man", "id",
      statsCols = Seq("x"))
    t.create(df, 3)
    val total = t.manifest(1).count()
    assert(total == 3, s"expected 3 clustered files, got $total")
    // conservative everywhere: pruned read == full filter, row for row
    val probes = Seq(
      (0.0, 1.0),                          // catches a -0.0 max stored raw
      (-0.0, -0.0),                        // signed-zero point probe
      (8.0, 10.0),
      (Double.NegativeInfinity, -1.0),
      (100.0, Double.PositiveInfinity))
    probes.foreach { case (lo, hi) =>
      val (kept, _) = t.pruneMulti(1, Seq(("x", lo, hi)))
      val pruned =
        (if (kept.isEmpty) df.limit(0) else spark.read.parquet(kept: _*))
          .filter(col("x").between(lo, hi))
      val full = t.readAsOf(1).filter(col("x").between(lo, hi))
      assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
        s"pruned read differs from full filter for [$lo, $hi]")
    }
    // the signed-zero trap specifically: the file holding -0.0 must be
    // KEPT by a [0.0, 1.0] query (SQL: -0.0 == 0.0)
    val (keptZero, _) = t.pruneMulti(1, Seq(("x", 0.0, 1.0)))
    assert(spark.read.parquet(keptZero: _*).filter(col("id") === 3L)
      .count() == 1, "file with x = -0.0 was falsely skipped by [0.0, 1.0]")
    // the NaN file is unbounded — kept by every probe
    val (keptHigh, _) = t.pruneMulti(1, Seq(("x", 1e6, 1e7)))
    assert(spark.read.parquet(keptHigh: _*).filter(col("id") === 12L)
      .count() == 1, "NaN-carrying file must store a NULL box and be kept")
    // and skipping still happens: the normal block is out of range
    assert(keptHigh.size < total,
      s"no file skipped for [1e6, 1e7] (kept ${keptHigh.size} of $total)")
  }

  test("decimal stats prune via one-ulp-widened double boxes; a decimal KEY is rejected") {
    import spark.implicits._
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_dec").toString
    val df = (1L to 400L).map(i => (i, BigDecimal(i) * BigDecimal("1.01")))
      .toDF("id", "amt")
      .select(col("id"), col("amt").cast("decimal(12,2)").as("amt"))
    val t = GraftTable(spark, s"$root/data", s"$root/man", "id",
      statsCols = Seq("amt"))
    t.create(df, 4)
    // bounds are given in box space (doubles); conservative row-for-row
    val (kept, total) = t.pruneMulti(1, Seq(("amt", 101.0, 202.0)))
    assert(kept.size < total, "no file skipped on the decimal stats column")
    val pruned = spark.read.parquet(kept: _*)
      .filter(col("amt").between(101.0, 202.0))
    val full = t.readAsOf(1).filter(col("amt").between(101.0, 202.0))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
      "decimal pruning dropped matching rows")
    // a decimal table KEY would make the ranged DELETE's predicate
    // disagree with its lossy planning — rejected loudly at stats time
    val e = intercept[IllegalArgumentException] {
      GraftTable(spark, s"$root/data2", s"$root/man2", "amt").create(df, 2)
    }
    assert(e.getMessage.contains("cannot be the table KEY"), e.getMessage)
  }
}
