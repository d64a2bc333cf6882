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
}
