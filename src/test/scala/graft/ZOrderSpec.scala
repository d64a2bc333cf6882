package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** The Morton interleave and the layout property it buys: after a
  * z-order write, every output file's bounding box must be small in
  * BOTH clustered dimensions — the thing a single-column sort cannot
  * do (it bounds one dimension; the other spans the full domain in
  * every file), and the reason a box-filtered 100 TB scan can skip
  * most files on parquet min/max stats alone.
  */
class ZOrderSpec extends TestBase {

  test("interleave matches a bit-by-bit reference on random values") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      (0 until 32).foreach { i =>
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(1)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrder.interleave(a, b) == ref(a, b))
    }
    assert(ZOrder.interleave(0, 0) == 0L)
    assert(ZOrder.interleave(1, 0) == 1L) // a occupies even bits
    assert(ZOrder.interleave(0, 1) == 2L) // b occupies odd bits
    assert(ZOrder.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L)
  }

  test("codegen'd z_value agrees with the Scala implementation") {
    import spark.implicits._
    val df = (1 to 500)
      .map(i => ((i.toLong * 2654435761L) & 0xFFFFFFFFL,
        (i.toLong * 40503L) & 0xFFFFFFFFL))
      .toDF("a", "b")
    df.select(col("a"), col("b"), ZOrder.z_value(col("a"), col("b")).as("z"))
      .collect()
      .foreach { r =>
        assert(r.getLong(2) == ZOrder.interleave(r.getLong(0), r.getLong(1)))
      }
  }

  test("z-order layout bounds per-file boxes in BOTH dimensions") {
    // shrink the bytes-per-file knob so the derived partition count
    // yields a multi-file layout on the small fixture (production
    // default is 128 MiB; the COUNT derivation, not the knob value, is
    // what scales to 100 TB)
    spark.conf.set("spark.graft.zorder.targetFileBytes", (4L << 10).toString)
    try SparkEntry.queries("q81_zorder_layout")(spark, sfDir).collect()
    finally spark.conf.unset("spark.graft.zorder.targetFileBytes")
    val out = operators.RelationalQueries.scratch("q81_zorder", sfDir)
    val files = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("okLo"), max("l_orderkey").as("okHi"),
        min("l_partkey").as("pkLo"), max("l_partkey").as("pkHi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(files.length >= 4, s"expected a multi-file layout, got ${files.length}")
    val okSpan = (files.map(_._2).max - files.map(_._1).min).toDouble
    val pkSpan = (files.map(_._4).max - files.map(_._3).min).toDouble
    def medianFrac(spans: Seq[Double], dom: Double): Double = {
      val s = spans.sorted
      s(s.length / 2) / dom
    }
    // median, not mean: a file whose z-interval crosses a top-level
    // quad boundary legitimately spans a whole dimension — the median
    // file must still be tightly boxed in BOTH dimensions at once
    val okMed = medianFrac(files.map(f => (f._2 - f._1).toDouble).toSeq, okSpan)
    val pkMed = medianFrac(files.map(f => (f._4 - f._3).toDouble).toSeq, pkSpan)
    assert(okMed <= 0.6, s"orderkey boxes not bounded: median frac $okMed")
    assert(pkMed <= 0.6, s"partkey boxes not bounded: median frac $pkMed")
  }

  test("OPTIMIZE ZORDER BY: content-identical layout commit, non-key pruning strictly improves") {
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_zo").toString
    import spark.implicits._
    val n = 4096L
    // b is a pseudo-random permutation of the key domain: key-clustered
    // files each span ~the FULL b range, so a b predicate prunes nothing
    val df = (1L to n).map(i => (i, (i * 7919L) % n, i * 3L))
      .toDF("a", "b", "v")
    val t = GraftTable(spark, s"$root/data", s"$root/man", "a",
      statsCols = Seq("b"))
    t.create(df, 8)
    val bPred = Seq(("b", 0L.asInstanceOf[Any], (n / 16).asInstanceOf[Any]))
    val (keptBefore, totalBefore) = t.pruneMulti(1, bPred)
    assert(keptBefore.size == totalBefore,
      "fixture must start unprunable on b (every file spans the domain)")

    // a MoR delete first: the z-order rewrite must fold the vector in
    assert(t.commitDeleteMor(
      Seq(org.apache.spark.sql.sources.EqualTo("a", 7L)),
      col("a") === 7L, 1) == 1L)

    val bytes = t.manifest(2).collect().map(_.getAs[Long]("bytes")).sum
    val v3 = t.commitZorder(2, math.max(1L, bytes / 16), "a", "b")
    assert(v3 == 3)
    // layout-only: content identical to v2 (the delete applied), the
    // change feed skips it, the DV folded
    assert(!t.dataChange(3), "z-order must commit dataChange=false")
    assert(!t.hasLiveDvs(3), "z-order must fold deletion vectors")
    assert(t.readAsOf(3).count() == n - 1)
    assert(t.readAsOf(3).exceptAll(t.readAsOf(2)).isEmpty &&
      t.readAsOf(2).exceptAll(t.readAsOf(3)).isEmpty,
      "z-order changed row content")

    // the point of the operator: the SAME manifest now skips most
    // files for a b-range predicate, and still skips on the key
    val (keptAfter, totalAfter) = t.pruneMulti(3, bPred)
    assert(totalAfter >= 4, s"expected a multi-file layout, got $totalAfter")
    assert(keptAfter.size.toDouble / totalAfter <
      keptBefore.size.toDouble / totalBefore,
      s"b pruning must improve: $keptAfter of $totalAfter")
    assert(keptAfter.size <= totalAfter / 2,
      s"a 1/16-domain b predicate should skip most z-ordered files " +
        s"(kept ${keptAfter.size}/$totalAfter)")
    val (keptKey, _) = t.pruneMulti(3,
      Seq(("a", 0L.asInstanceOf[Any], (n / 16).asInstanceOf[Any])))
    assert(keptKey.size <= totalAfter / 2,
      s"key pruning must survive the re-cluster (kept ${keptKey.size})")

    // old versions still time-travel to the old layout
    assert(t.readAsOf(1).count() == n)

    // SQL face: graft_zorder TVF (misuse loud)
    graft.table.SnapshotSql.register(spark)
    val r = spark.sql(
      s"SELECT * FROM graft_zorder('${t.man}', ${math.max(1L, bytes / 8)}, 'a', 'b')")
      .head
    assert(r.getAs[Long]("latest_version") == 4L &&
      r.getAs[Long]("files_written") > 0L)
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_zorder('${t.man}', 1024)")
        .queryExecution.analyzed
    }
    assert(bad.getMessage.contains("4 arguments"))
    val badCol = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_zorder('${t.man}', 1024, 'a', 'nope')")
        .queryExecution.analyzed
    }
    assert(badCol.getMessage.contains("nope"))
  }
}
