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
    assert(bad.getMessage.contains("3 to 10 arguments"))
    val badCol = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_zorder('${t.man}', 1024, 'a', 'nope')")
        .queryExecution.analyzed
    }
    assert(badCol.getMessage.contains("nope"))
  }

  test("interleaveN matches a bit-by-bit reference; n=2 equals the magic-number path") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def ref(vals: Array[Long]): Long = {
      val n = vals.length
      val bits = 64 / n
      var z = 0L
      vals.indices.foreach { i =>
        (0 until bits).foreach { j =>
          z |= ((vals(i) >> j) & 1L) << (j * n + i)
        }
      }
      z
    }
    val rnd = new scala.util.Random(7)
    Seq(2, 3, 4, 5, 8).foreach { n =>
      val bits = 64 / n
      val mask = (1L << bits) - 1
      (1 to 500).foreach { _ =>
        val vals = Array.fill(n)(rnd.nextLong() & mask)
        val got = ZOrder.interleaveN(
          UnsafeArrayData.fromPrimitiveArray(vals))
        assert(got == ref(vals), s"n=$n vals=${vals.toSeq}")
        if (n == 2) assert(got == ZOrder.interleave(vals(0), vals(1)))
      }
    }
    // str_prefix_long: monotone in code-point order, 48-bit range
    import org.apache.spark.unsafe.types.UTF8String
    def spl(s: String): Long = ZOrder.strPrefixLong(UTF8String.fromString(s))
    val ss = Seq("", "a", "aa", "ab", "abcdefgh", "abcdefzz", "b",
      "zzz", "éclair", "日本語")
    val sorted = ss.sorted // Java string order = code-point order here
    sorted.sliding(2).foreach { case Seq(x, y) =>
      assert(spl(x) <= spl(y), s"prefix order violated: '$x' vs '$y'")
    }
    assert(ss.forall(s => spl(s) >= 0L && spl(s) < (1L << 48)))
    // differs-past-6-bytes collapses (documented prefix semantics)
    assert(spl("abcdefgh") == spl("abcdefzz"))
  }

  test("N-dim z-order over (timestamp, string): non-integral pruning strictly improves") {
    import graft.table.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_zon").toString
    import spark.implicits._
    val n = 4096L
    // key-clustered files each span the full ts range AND the full
    // label alphabet, so neither dimension prunes before the re-cluster
    val labels = Array("apple", "berry", "cherry", "date", "elder",
      "fig", "grape", "honey")
    val df = (1L to n).map { i =>
      val scrambled = (i * 7919L) % n
      (i, new java.sql.Timestamp(1700000000000L + scrambled * 60000L),
        labels(((i * 2654435761L) % labels.length).toInt.abs), i * 2L)
    }.toDF("id", "ts", "label", "v")
    val t = GraftTable(spark, s"$root/data", s"$root/man", "id",
      statsCols = Seq("ts", "label"))
    t.create(df, 8)
    val tsPred = Seq(("ts",
      (1700000000000000L).asInstanceOf[Any],
      (1700000000000000L + (n / 16) * 60000000L).asInstanceOf[Any]))
    val labelPred = Seq(("label",
      "apple".asInstanceOf[Any], "apple".asInstanceOf[Any]))
    val (tsBefore, total1) = t.pruneMulti(1, tsPred)
    val (lblBefore, _) = t.pruneMulti(1, labelPred)
    assert(tsBefore.size == total1 && lblBefore.size == total1,
      "fixture must start unprunable on both non-key dims")

    val bytes = t.manifest(1).collect().map(_.getAs[Long]("bytes")).sum
    val v2 = t.commitZorder(1, math.max(1L, bytes / 16),
      Seq("ts", "label"))
    assert(v2 == 2)
    // content identity through the type-mapped grid
    assert(!t.dataChange(2))
    assert(t.readAsOf(2).exceptAll(t.readAsOf(1)).isEmpty &&
      t.readAsOf(1).exceptAll(t.readAsOf(2)).isEmpty,
      "N-dim z-order changed row content")
    // both non-integral dimensions now prune
    val (tsAfter, total2) = t.pruneMulti(2, tsPred)
    assert(total2 >= 4, s"expected a multi-file layout, got $total2")
    assert(tsAfter.size <= total2 / 2,
      s"a 1/16 ts predicate should skip most files (kept ${tsAfter.size}/$total2)")
    val (lblAfter, _) = t.pruneMulti(2, labelPred)
    assert(lblAfter.size < total2,
      s"an equality label predicate must skip files (kept ${lblAfter.size}/$total2)")

    // >2 dims through the SQL face; unsupported type is loud
    graft.table.SnapshotSql.register(spark)
    val r = spark.sql(
      s"SELECT * FROM graft_zorder('${t.man}', ${math.max(1L, bytes / 8)}, " +
        "'ts', 'label', 'v')").head
    assert(r.getAs[Long]("latest_version") == 3L)
    assert(t.readAsOf(3).count() == n)
    val dup = intercept[Exception] {
      t.commitZorder(3, 1024, Seq("ts", "ts"))
    }
    assert(dup.getMessage.contains("duplicate"))
  }
}
