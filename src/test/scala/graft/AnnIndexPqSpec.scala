package graft

import graft.operators.{AnnIndex, AnnIndexPq}
import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** The PQ-coded persisted-index contract (SURVEY §2B row 108): the
  * index stores CODES ONLY (no raw vector column — the memory claim
  * is a schema fact, not a comment), the coarse cells AND codebooks
  * freeze at build, refresh encodes only the churn, probes file-prune
  * through the index manifest, and the exact rerank's corpus fetch is
  * file-pruned by [[GraftTable.pruneIn]]. q46e is declared bench-only
  * (k-means/PQ family), so THIS spec is its correctness gate. */
class AnnIndexPqSpec extends TestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("PQ index: codes-only storage, frozen models, churn-only refresh, pruned rerank") {
    val root = java.nio.file.Files.createTempDirectory("graft_pqix").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val corpus = GraftTable(spark, s"$root/corpus_data",
        s"$root/corpus_man", "vec_id")
      corpus.create(e.filter(col("vec_id") < 450), 4)
      val idx = AnnIndexPq.build(spark, corpus, 1, root)
      assert(AnnIndex.indexedCorpusVersion(idx) == 1)

      // ---- the memory claim IS the schema: no float-array column
      // anywhere in the index table; codes are M ints
      val v0 = idx.committedVersions.max
      val idxDf = idx.readAsOf(v0)
      assert(!idxDf.schema.exists(_.dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true)) &&
        !idxDf.schema.exists(_.dataType ==
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = false)),
        s"PQ index must not store raw vectors: ${idxDf.schema.simpleString}")
      val codeLens = idxDf.select(size(col("code")).as("n"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(codeLens == Set(AnnIndexPq.M),
        s"every row carries exactly M=${AnnIndexPq.M} codes, got $codeLens")

      // ---- recall on the base corpus (clustered fixture, nprobe=2):
      // ADC shortlist + exact rerank must recover the IVF operating
      // point
      val exactBase = TestBase.exactTopK(e.filter(col("vec_id") < 450), 10, 5)
      val gotBase = pairs(AnnIndexPq.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2, rerank = 60))
      val recallBase = exactBase.intersect(gotBase).size.toDouble /
        exactBase.size
      info(s"PQ persisted-index recall (base corpus, nprobe=2): $recallBase")
      assert(recallBase >= 0.85, s"recall $recallBase")

      // ---- probes file-prune through the index manifest
      val total = idx.files(v0).size
      assert(total >= 4, s"index must be a multi-file layout, got $total")
      val cents = AnnIndex.loadModel(spark, root)
      Seq(cents.head._1.toLong, cents.last._1.toLong).foreach { c =>
        val (kept, tot) = idx.prune(v0, c, c)
        assert(kept.size < tot,
          s"a single-cell probe must skip index files (kept ${kept.size}/$tot)")
      }

      // ---- the rerank's corpus fetch is file-pruned: a shortlist
      // drawn from one corner of the id space reads a strict subset of
      // the corpus files
      val corpusV = corpus.committedVersions.max
      val (keptNarrow, totCorpus) =
        corpus.pruneIn(corpusV, "vec_id", Seq(3L, 7L))
      assert(keptNarrow.size < totCorpus,
        s"pruneIn must skip corpus files for a narrow shortlist " +
          s"(kept ${keptNarrow.size}/$totCorpus)")
      // and never skips a file that holds a probed id
      val held = corpus.readAsOf(corpusV, keptNarrow)
        .filter(col("vec_id").isin(3L, 7L)).count()
      assert(held == 2L, s"pruneIn kept files must hold the probes: $held")

      // ---- corpus grows; refresh folds in ONLY the churn with BOTH
      // models frozen
      val modelBefore = spark.read.parquet(s"$root/model")
        .collect().map(_.toString).sorted.toSeq
      val cbBefore = spark.read.parquet(s"$root/codebook")
        .collect().map(_.toString).sorted.toSeq
      val filesBefore = idx.files(idx.committedVersions.max).toSet
      corpus.commitAppend(e.filter(col("vec_id") >= 450), 1, 2)
      // pre-refresh: appended rows searchable via the fresh segment
      val exactFull = TestBase.exactTopK(e, 10, 5)
      val holdoutHits = exactFull.filter(_._2 >= 450L)
      assert(holdoutHits.nonEmpty, "fixture must make holdout rows neighbors")
      val gotLagged = pairs(AnnIndexPq.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2, rerank = 60))
      assert(holdoutHits.exists(gotLagged.contains),
        "un-indexed appends must be searchable through the fresh segment")
      val n = AnnIndexPq.refresh(spark, corpus, 2, root)
      assert(n == 50L, s"refresh must encode exactly the churn, got $n")
      assert(spark.read.parquet(s"$root/model")
        .collect().map(_.toString).sorted.toSeq == modelBefore,
        "refresh must never retrain the coarse quantizer")
      assert(spark.read.parquet(s"$root/codebook")
        .collect().map(_.toString).sorted.toSeq == cbBefore,
        "refresh must never retrain the codebooks")
      val vNew = idx.committedVersions.max
      val filesAfter = idx.files(vNew).toSet
      assert(filesBefore.subsetOf(filesAfter),
        "refresh must carry the base index files untouched")
      val newNids = idx.readAsOf(vNew, (filesAfter -- filesBefore).toSeq)
        .select("nid").collect().map(_.getLong(0)).toSet
      assert(newNids == (450L until 500L).toSet,
        s"the new index files must hold exactly the churn: $newNids")

      // ---- post-refresh recall unchanged
      val gotFull = pairs(AnnIndexPq.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2, rerank = 60))
      val recallFull = exactFull.intersect(gotFull).size.toDouble /
        exactFull.size
      info(s"PQ persisted-index recall (after incremental refresh): $recallFull")
      assert(recallFull >= 0.85, s"post-refresh recall $recallFull")

      // ---- delete: excluded pre-refresh with ZERO index writes, and
      // post-fold by its tombstone
      val victim = gotFull.head._2
      assert(corpus.commitDelete(
        Seq(org.apache.spark.sql.sources.EqualTo("vec_id", victim)),
        corpus.committedVersions.max, 2) == 1L)
      val idxVersions = idx.committedVersions
      def searchNow() = pairs(AnnIndexPq.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2, rerank = 60))
      assert(!searchNow().exists(_._2 == victim),
        "a deleted corpus row must drop out of search results")
      assert(idx.committedVersions == idxVersions,
        "the delete must not have written to the index")
      AnnIndexPq.refresh(spark, corpus, corpus.committedVersions.max, root)
      assert(!searchNow().exists(_._2 == victim),
        "a refresh-folded delete must tombstone its index entry")

      // ---- update rescores with the CURRENT vector to exact cosine
      // 1.0, pre-refresh (fresh segment) and post-refresh (generation
      // dedup + rerank against the live corpus)
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
      val preRefresh = topOfQ0(AnnIndexPq.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2, rerank = 60))
      assert(preRefresh == (target, 1.0),
        s"un-indexed update must rescore through the fresh segment: $preRefresh")
      AnnIndexPq.refresh(spark, corpus, corpus.committedVersions.max, root)
      val postRefresh = topOfQ0(AnnIndexPq.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5, nprobe = 2, rerank = 60))
      assert(postRefresh == (target, 1.0),
        s"folded update must rescore against the live corpus: $postRefresh")

      // refresh covering an already-covered version is a no-op
      assert(AnnIndexPq.refresh(spark, corpus,
        corpus.committedVersions.max, root) == 0L)
    } finally { e.unpersist(); () }
  }
}
