package graft

import graft.functions.KllFuncs._
import org.apache.datasketches.kll.KllSketch
import org.apache.spark.sql.functions._

/** Contract of the KLL quantile sketch surface (q93 + the native
  * functions): the partition-invariant guarantee of a RANDOMIZED sketch
  * is its rank-error bound, not row equality — so this spec asserts
  * `|trueRank(q_hat) - p| <= eps` against the exact per-group
  * distribution, under the default AND an adversarial partitioning
  * (many input splits, co-prime shuffle fan-out). eps is twice the
  * library's 99%-confidence normalized rank error for k=200 (~1.33%)
  * plus one item of discreteness — comfortably above any non-broken
  * sketch, far below a wrong implementation (a mis-merged or
  * mis-serialized sketch is off by whole percentiles).
  */
class KllSketchSpec extends TestBase {

  private val Ps = Seq(0.25, 0.5, 0.75, 0.95)

  /** True normalized rank (INCLUSIVE: fraction of items <= v). */
  private def trueRank(sorted: Array[Double], v: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  private def assertBounds(): Unit = {
    val rows = SparkEntry.queries("q93_kll_quantiles")(spark, sfDir).collect()
    val exact = Tables.load(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, vs) => k -> vs.map(_.getDouble(1)).sorted }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val sorted = exact(et)
      val eps = 2 * KllSketch.getNormalizedRankError(200, false) +
        1.0 / sorted.length
      Ps.zipWithIndex.foreach { case (p, i) =>
        val qHat = r.getDouble(2 + i)
        val rank = trueRank(sorted, qHat)
        assert(math.abs(rank - p) <= eps,
          s"$et p=$p: sketch quantile $qHat has true rank $rank " +
            s"(|err| > $eps)")
      }
    }
  }

  test("q93 KLL quantiles meet the rank-error bound vs the exact distribution") {
    assertBounds()
  }

  test("q93 rank-error bound holds under adversarial partitioning") {
    val conf = Seq(
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "0",
      "spark.sql.shuffle.partitions" -> "7")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try assertBounds()
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("KLL sketch is exact below capacity and kll_rank inverts kll_quantile") {
    import spark.implicits._
    // 100 items < k=200: no compaction has happened, the sketch holds
    // every item, so quantile/rank answers are EXACT and deterministic.
    val df = (1 to 100).map(_.toDouble).toDF("v")
      .agg(kll_sketch_agg(col("v"), 200).as("sk"))
      .select(
        kll_quantile(col("sk"), lit(0.5)).as("q50"),
        kll_quantile(col("sk"), lit(0.01)).as("q01"),
        kll_quantile(col("sk"), lit(1.0)).as("q100"),
        kll_rank(col("sk"), lit(50.0)).as("r50"))
      .collect()(0)
    assert(df.getDouble(0) == 50.0)
    assert(df.getDouble(1) == 1.0)
    assert(df.getDouble(2) == 100.0)
    assert(df.getDouble(3) == 0.5)
  }

  test("empty sketch (all-NULL group) and out-of-range rank answer NULL, not an exception") {
    import spark.implicits._
    // an all-NULL group still aggregates to a valid (empty) sketch; the
    // post-agg expressions must answer NULL like approx_percentile, not
    // throw the library's SketchesArgumentException on an executor
    val r = Seq[Option[Double]](None, None).toDF("v")
      .agg(kll_sketch_agg(col("v"), 200).as("sk"))
      .select(
        kll_quantile(col("sk"), lit(0.5)).as("q"),
        kll_rank(col("sk"), lit(1.0)).as("r"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    val bad = (1 to 10).map(_.toDouble).toDF("v")
      .agg(kll_sketch_agg(col("v"), 200).as("sk"))
      .select(kll_quantile(col("sk"), lit(1.5)).as("q"),
        kll_quantile(col("sk"), lit(-0.1)).as("q2"))
      .collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }

  test("kll_sketch_agg rejects non-DOUBLE input at analysis time") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("s")
    val e = intercept[Exception] {
      df.agg(kll_sketch_agg(col("s"), 200)).collect()
    }
    assert(e.getMessage.contains("kll_sketch_agg"))
  }
}
