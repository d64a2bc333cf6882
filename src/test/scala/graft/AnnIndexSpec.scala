package graft

import graft.operators.AnnIndex
import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** The persisted-ANN-index contract (SURVEY §2B row 107): the index is
  * a graft TABLE built once per corpus, probes are FILE-pruned through
  * its manifest, and corpus changes fold in incrementally — churn-only
  * encode, frozen quantizer, no base re-encode. q46d is declared
  * bench-only (k-means family), so THIS spec is its correctness gate.
  */
class AnnIndexSpec extends TestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("persisted IVF index: build once, probe file-pruned, append folds in without retrain") {
    val root = java.nio.file.Files.createTempDirectory("graft_annix").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val corpus = GraftTable(spark, s"$root/corpus_data",
        s"$root/corpus_man", "vec_id")
      // base corpus: clusters stay covered (holdout = every 10th block's
      // tail), queries are vec_id < 10
      corpus.create(e.filter(col("vec_id") < 450), 4)
      val idx = AnnIndex.build(spark, corpus, 1, root)
      assert(AnnIndex.indexedCorpusVersion(idx) == 1)

      // ---- recall gate on the base corpus (same operating point as
      // the clustered IVF gates: nprobe=2 saturates recall there)
      val exactBase = TestBase.exactTopK(e.filter(col("vec_id") < 450), 10, 5)
      val gotBase = pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      val recallBase = exactBase.intersect(gotBase).size.toDouble /
        exactBase.size
      info(s"persisted-index recall (base corpus, nprobe=2): $recallBase")
      assert(recallBase >= 0.9, s"recall $recallBase")

      // ---- the probe is FILE-pruned: reading every probed cell costs
      // fewer files than the index holds, and exactly the per-cell
      // pruned union (the manifest boxes ARE the probe plan)
      val v = idx.committedVersions.max
      val total = idx.files(v).size
      assert(total >= 4, s"index must be a multi-file layout, got $total")
      val cents = AnnIndex.loadModel(spark, root)
      assert(cents.size == AnnIndex.K)
      val someCells = Seq(cents.head._1.toLong, cents.last._1.toLong)
      someCells.foreach { c =>
        val (kept, tot) = idx.prune(v, c, c)
        assert(kept.size < tot,
          s"a single-cell probe must skip index files (kept ${kept.size}/$tot)")
      }

      // ---- corpus grows; refresh encodes ONLY the churn with the
      // FROZEN model
      val modelBytesBefore = spark.read.parquet(s"$root/model")
        .collect().map(_.toString).sorted.toSeq
      val filesBefore = idx.files(idx.committedVersions.max).toSet
      corpus.commitAppend(e.filter(col("vec_id") >= 450), 1, 2)
      // BEFORE any refresh the appended rows are already searchable —
      // the un-indexed change feed is search's fresh segment
      val exactFull = TestBase.exactTopK(e, 10, 5)
      val holdoutHits = exactFull.filter(_._2 >= 450L)
      assert(holdoutHits.nonEmpty, "fixture must make holdout rows neighbors")
      val gotLagged = pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      assert(holdoutHits.exists(gotLagged.contains),
        "un-indexed appends must be searchable through the fresh segment")
      val n = AnnIndex.refresh(spark, corpus, 2, root)
      assert(n == 50L, s"refresh must encode exactly the churn, got $n")
      assert(AnnIndex.indexedCorpusVersion(idx) == 2)
      // quantizer frozen: model content byte-identical
      val modelBytesAfter = spark.read.parquet(s"$root/model")
        .collect().map(_.toString).sorted.toSeq
      assert(modelBytesAfter == modelBytesBefore,
        "refresh must never retrain the quantizer")
      // base corpus never re-encoded: every pre-refresh index file is
      // carried VERBATIM into the new version; only churn files are new
      val vNew = idx.committedVersions.max
      val filesAfter = idx.files(vNew).toSet
      assert(filesBefore.subsetOf(filesAfter),
        "refresh must carry the base index files untouched")
      val newFiles = (filesAfter -- filesBefore).toSeq
      assert(newFiles.nonEmpty)
      val newNids = idx.readAsOf(vNew, newFiles)
        .select("nid").collect().map(_.getLong(0)).toSet
      assert(newNids == (450L until 500L).toSet,
        s"the new index files must hold exactly the churn: $newNids")

      // ---- post-append vectors are searchable, recall gate unchanged
      val gotFull = pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      val recallFull = exactFull.intersect(gotFull).size.toDouble /
        exactFull.size
      info(s"persisted-index recall (after incremental refresh): $recallFull")
      assert(recallFull >= 0.9, s"post-refresh recall $recallFull")
      assert(holdoutHits.exists(gotFull.contains),
        "appended vectors must be searchable after the incremental commit")

      // ---- a delete needs NO index write: before any refresh the
      // fresh segment's anti-join drops it; the index is untouched
      val victim = gotFull.head._2
      assert(corpus.commitDelete(
        Seq(org.apache.spark.sql.sources.EqualTo("vec_id", victim)),
        corpus.committedVersions.max, 2) == 1L)
      val idxVersions = idx.committedVersions
      def searchNow() = pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      val gotAfterDelete = searchNow()
      assert(!gotAfterDelete.exists(_._2 == victim),
        "a deleted corpus row must drop out of search results")
      assert(idx.committedVersions == idxVersions,
        "the delete must not have written to the index")

      // ---- the delete FOLDED by a refresh becomes a tombstone row in
      // the old vector's cell: with the change feed fully consumed
      // (latest == indexed, no fresh segment) the victim must STILL be
      // excluded — by the index itself
      AnnIndex.refresh(spark, corpus, corpus.committedVersions.max, root)
      assert(AnnIndex.indexedCorpusVersion(idx) ==
        corpus.committedVersions.max)
      assert(!searchNow().exists(_._2 == victim),
        "a refresh-folded delete must tombstone its index entry")

      // ---- an UPDATE rescores with its CURRENT vector, both through
      // the fresh segment (pre-refresh) and through the index
      // (post-refresh, generation dedup): point an existing nid's
      // embedding at query 0's vector -> exact cosine 1.0 at rank 1
      val q0 = e.filter(col("vec_id") === 0L)
        .select("embedding").head.getSeq[Float](0)
      val target = gotFull.find(p => p._1 == 0L && p._2 != victim).get._2
      assert(corpus.commitUpdateCow(col("vec_id") === target,
        Map("embedding" -> typedlit(q0)),
        corpus.committedVersions.max) == 1L)
      def topOfQ0(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
        val r = df.filter(col("qid") === 0L && col("rn") === 1L).head
        (r.getLong(2), r.getDouble(3))
      }
      val preRefresh = topOfQ0(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      assert(preRefresh == (target, 1.0),
        s"un-indexed update must rescore through the fresh segment: $preRefresh")
      AnnIndex.refresh(spark, corpus, corpus.committedVersions.max, root)
      val postRefresh = topOfQ0(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      assert(postRefresh == (target, 1.0),
        s"folded update must win generation dedup with its new vector: $postRefresh")

      // refresh covering an already-covered version is a no-op
      assert(AnnIndex.refresh(spark, corpus,
        corpus.committedVersions.max, root) == 0L)

      // ---- the index is an ordinary graft table: OPTIMIZE
      // (commitCompaction) repacks its refresh-segment tail without
      // changing a single search result, and the corpus_v provenance
      // survives the layout-only commit (tags ride versions, not files)
      val beforeOpt = pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      val coveredBefore = AnnIndex.indexedCorpusVersion(idx)
      idx.commitCompaction(idx.committedVersions.max, 64L << 20)
      assert(AnnIndex.indexedCorpusVersion(idx) == coveredBefore,
        "OPTIMIZE must not disturb the corpus_v provenance")
      assert(pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2)) == beforeOpt,
        "OPTIMIZE must not change search results")

      // ---- VACUUM to the latest index version: the corpus_v tags of
      // the EXPIRED versions survive through the tag ledger, so the
      // covered-version bookkeeping (and thus refresh idempotence and
      // the fresh-segment boundary) is vacuum-proof
      val latest = idx.committedVersions.max
      idx.vacuum(latest, latest)
      assert(idx.committedVersions == Seq(latest),
        "vacuum must expire the old index versions")
      assert(AnnIndex.indexedCorpusVersion(idx) == coveredBefore,
        "corpus_v provenance must survive vacuum via the tag ledger")
      assert(pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2)) == beforeOpt,
        "search must be unchanged after index vacuum")
      assert(AnnIndex.refresh(spark, corpus,
        corpus.committedVersions.max, root) == 0L,
        "refresh must stay a no-op after vacuum (covered version known)")
    } finally { e.unpersist(); () }
  }

  test("maintenance contracts: lag observable, generation repack, " +
      "vacuumed-corpus refresh names the rebuild recovery") {
    val root = java.nio.file.Files.createTempDirectory("graft_annmx").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val corpus = GraftTable(spark, s"$root/corpus_data",
        s"$root/corpus_man", "vec_id")
      corpus.create(e.filter(col("vec_id") < 450), 4)          // corpus v1
      val idx = AnnIndex.build(spark, corpus, 1, root)

      // ---- freshly built: the observable reports zero debt
      val l0 = AnnIndex.lag(spark, corpus, root).head
      assert(l0.getLong(0) == 1L && l0.getLong(1) == 1L &&
        l0.getLong(2) == 0L && l0.getLong(3) == 0L && l0.getBoolean(6), l0)

      // ---- corpus churns WITHOUT a refresh: search stays exact
      // through the fresh segment while the observable reports the debt
      corpus.commitAppend(e.filter(col("vec_id") >= 450), 1, 2) // v2
      assert(corpus.commitDelete(
        Seq(org.apache.spark.sql.sources.EqualTo("vec_id", 449L)),
        2, 2) == 1L)                                            // v3
      val l1 = AnnIndex.lag(spark, corpus, root).head
      assert(l1.getLong(2) == 2L, s"versions_behind: $l1")
      assert(l1.getLong(4) >= 50L,
        s"fresh_rows_est must bound the un-indexed appends: $l1")
      assert(l1.getLong(5) >= 1L, s"removed_rows_est: $l1")
      assert(l1.getBoolean(6))
      val live = e.filter(col("vec_id") =!= 449L)
      val exact = TestBase.exactTopK(live, 10, 5)
      val lagged = pairs(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2))
      assert(exact.intersect(lagged).size.toDouble / exact.size >= 0.9,
        "search must stay exact-scored and recall-strong at full lag")
      assert(!lagged.exists(_._2 == 449L))

      // ---- refresh clears the debt
      AnnIndex.refresh(spark, corpus, 3, root)
      val l2 = AnnIndex.lag(spark, corpus, root).head
      assert(l2.getLong(2) == 0L && l2.getLong(3) == 0L, l2)

      // ---- fold an update too, so the index carries every LSM debt
      // shape: a superseded generation, an update tombstone and a
      // delete tombstone
      val q0 = e.filter(col("vec_id") === 0L)
        .select("embedding").head.getSeq[Float](0)
      assert(corpus.commitUpdateCow(col("vec_id") === 42L,
        Map("embedding" -> typedlit(q0)), 3) == 1L)             // v4
      AnnIndex.refresh(spark, corpus, 4, root)
      val vIdx = idx.committedVersions.max
      val total0 = idx.readAsOf(vIdx).count()
      val deadBefore = idx.readAsOf(vIdx).filter(col("dead")).count()
      assert(deadBefore >= 2L, s"expected folded tombstones: $deadBefore")
      def results() = AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2).collect()
        .map(_.toString).toSeq
      val beforeRepack = results()

      // below-threshold debt: no commit burned
      val vs0 = idx.committedVersions
      assert(AnnIndex.repack(spark, root, minDeadFraction = 0.9) == 0L)
      assert(idx.committedVersions == vs0)

      // ---- the repack: superseded generations + tombstones drop,
      // search results are IDENTICAL, the frozen model is untouched,
      // provenance and refresh idempotence survive
      val modelBefore = spark.read.parquet(s"$root/model")
        .collect().map(_.toString).sorted.toSeq
      val dropped = AnnIndex.repack(spark, root)
      assert(dropped >= 3L, s"dropped $dropped")
      val vNew = idx.committedVersions.max
      val after = idx.readAsOf(vNew)
      assert(after.count() == total0 - dropped)
      assert(after.filter(col("dead")).count() == 0L,
        "repack must drop every tombstone")
      assert(after.groupBy("nid")
        .agg(countDistinct("iv").as("g")).filter(col("g") > 1)
        .count() == 0L, "repack must leave ONE generation per nid")
      assert(results() == beforeRepack,
        "repack must not change a single search result")
      assert(spark.read.parquet(s"$root/model")
        .collect().map(_.toString).sorted.toSeq == modelBefore,
        "repack must never retrain the model")
      assert(AnnIndex.indexedCorpusVersion(idx) == 4)
      assert(AnnIndex.refresh(spark, corpus, 4, root) == 0L)

      // ---- vacuuming the corpus past the covered version makes
      // incremental refresh impossible: the error NAMES the rebuild
      // recovery, the observable reports covered_readable=false, and
      // build() re-anchors
      val extra = e.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 600L).as("vec_id"), col("embedding"))
      corpus.commitAppend(extra, 4, 1)                          // v5
      corpus.vacuum(5, 5)
      assert(corpus.committedVersions == Seq(5))
      val err = intercept[IllegalArgumentException](
        AnnIndex.refresh(spark, corpus, 5, root))
      assert(err.getMessage.contains("REBUILD") &&
        err.getMessage.contains("EXPIRED"), err.getMessage)
      val l3 = AnnIndex.lag(spark, corpus, root).head
      assert(!l3.getBoolean(6), s"covered_readable must be false: $l3")
      AnnIndex.build(spark, corpus, 5, root)
      assert(AnnIndex.indexedCorpusVersion(AnnIndex.table(spark, root)) == 5)
      assert(AnnIndex.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2).count() == 50L)
    } finally { e.unpersist(); () }
  }
}
