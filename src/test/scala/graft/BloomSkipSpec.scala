package graft

import graft.operators.CurationQueries
import org.apache.spark.sql.functions._

/** q102's bloom manifest: file-level skipping on a column the layout is
  * not clustered by. The oracle gate proves the query's answer; this
  * spec proves the SKIPPING — min/max can't prune this layout, the
  * bloom does, false skips are impossible, and absent-key keeps stay
  * near the configured fpp. */
class BloomSkipSpec extends TestBase {

  private lazy val layout = CurationQueries.bloomLayout(spark, sfDir)

  test("min/max keeps every file; the bloom prunes to the holding files") {
    val (_, man) = layout
    val (byBloom, byMinMax, total) =
      CurationQueries.bloomPrune(spark, man, CurationQueries.BloomKeys)
    // the layout is hash-clustered by user_id, so each file's
    // event_id box spans ~the whole domain: min/max skipping is blind
    assert(byMinMax.size == total,
      s"min/max unexpectedly pruned ($byMinMax of $total) — " +
        "the fixture no longer demonstrates the bloom's advantage")
    // 2 probe keys live in at most 2 files; 1% fpp adds ~0 of 8
    assert(byBloom.nonEmpty && byBloom.size <= 4,
      s"bloom kept ${byBloom.size} of $total files for 2 point keys")
    assert(byBloom.size < total)
  }

  test("no false skip: the pruned scan returns exactly the full-scan rows") {
    val (out, man) = layout
    val keys = CurationQueries.BloomKeys
    val (kept, _, _) = CurationQueries.bloomPrune(spark, man, keys)
    val pruned = spark.read.parquet(kept: _*)
      .filter(col("event_id").isin(keys: _*))
      .collect().map(_.toString).sorted.toSeq
    val full = spark.read.parquet(out)
      .filter(col("event_id").isin(keys: _*))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned == full && pruned.nonEmpty)
  }

  test("no false negatives through merged partials: every present key is kept") {
    val (out, man) = layout
    // sample (file, event_id) pairs from the data itself; each key's
    // bloom-kept set must include its holding file
    val pairs = spark.read.parquet(out)
      .select(col("_metadata.file_path").as("file"), col("event_id"))
      .filter(col("event_id") % 13 === 0).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.length > 20)
    val manifest = spark.read.parquet(man)
      .select("file", "bloom").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("bloom")).toMap
    pairs.foreach { case (file, id) =>
      assert(graft.functions.BloomAgg.mightContainLong(manifest(file), id),
        s"false negative: event_id=$id not in its own file's bloom ($file)")
    }
  }

  test("absent keys keep close to nothing (fpp holds at file granularity)") {
    val (_, man) = layout
    val absent = (0 until 200).map(i => 50_000_000L + i * 7919L)
    val manifest = spark.read.parquet(man)
      .select("bloom").collect().map(_.getAs[Array[Byte]]("bloom"))
    val probes = manifest.length * absent.length
    val falseKeeps = manifest.map { b =>
      absent.count(graft.functions.BloomAgg.mightContainLong(b, _))
    }.sum
    // configured fpp 1%; allow generous slack for the small sample
    assert(falseKeeps.toDouble / probes < 0.05,
      s"$falseKeeps false keeps over $probes probes")
  }
}
