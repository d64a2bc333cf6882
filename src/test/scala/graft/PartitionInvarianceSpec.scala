package graft

/** Scale-safety property: a query's OUTPUT must not depend on how the
  * input happens to be split or how wide the shuffle fans out. On a
  * 1000-executor cluster both vary run to run (file growth, AQE,
  * speculative retries), so any dependence — an under-specified sort, a
  * window without a total order, first/last over an unordered group, a
  * partitioner-seeded sample — is a silent wrong answer at scale that
  * local runs with one stable splitting never surface.
  *
  * Every oracle-backed query declares a total output order (the DuckDB
  * hash-match requires it), so collected rows must be IDENTICAL under:
  *  - 16 KiB max split size + zero open cost (hundreds of input splits
  *    instead of one — the "many executors" read shape), and
  *  - a co-prime shuffle partition count (7 vs the default 4).
  */
class PartitionInvarianceSpec extends TestBase {

  private val AltConf = Seq(
    "spark.sql.files.maxPartitionBytes" -> "16384",
    "spark.sql.files.openCostInBytes" -> "0",
    "spark.sql.shuffle.partitions" -> "7")

  private def withConf(kv: Seq[(String, String)])(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq

  SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
    test(s"$name output invariant to input splits and shuffle fan-out") {
      val base = rows(name)
      withConf(AltConf) {
        val alt = rows(name)
        assert(alt == base,
          s"$name output depends on partitioning: " +
            s"${alt.diff(base).take(3)} vs ${base.diff(alt).take(3)}")
      }
    }
  }

  // The rows-only sketch queries escape the oracle gate, which makes
  // them exactly the place a partitioning dependence could hide. Their
  // math is commutative-by-construction (HLL max-per-bucket, minhash
  // min, simhash integer sums, IVF centroid sums over deterministic
  // seeds), so the same invariance must hold.
  //
  // q93 is the one deliberate exception: KLL compaction flips a random
  // coin per level (like Spark's own approx_percentile), so exact row
  // equality across partitionings is not part of its contract — the
  // partition-invariant guarantee is the rank-error BOUND, which
  // KllSketchSpec asserts under the same alternate partitioning.
  (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet - "q93_kll_quantiles")
    .toSeq.sorted
    .foreach { name =>
      test(s"$name (rows-only) invariant to input splits and shuffle fan-out") {
        val base = rows(name)
        withConf(AltConf) {
          val alt = rows(name)
          assert(alt == base,
            s"$name output depends on partitioning: " +
              s"${alt.diff(base).take(3)} vs ${base.diff(alt).take(3)}")
        }
      }
    }
}
