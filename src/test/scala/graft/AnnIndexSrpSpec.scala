package graft

import graft.operators.{AnnIndex, AnnIndexSrp}
import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** The persisted SRP-LSH index contract (SURVEY §2B row 111): the
  * corpus bucket scan happens once at build, probed buckets file-prune
  * through ONE pruneIn pass over the bkey-clustered manifest, the
  * geometry freezes, refresh folds churn only (T rows per vector,
  * reported as vectors), and the old-bucket tombstone placement makes
  * generation resolution correct for every reachable stale row. q46f
  * is declared bench-only, so THIS spec is its correctness gate. */
class AnnIndexSrpSpec extends TestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SRP index: build once, pruned probes, frozen geometry, churn-only refresh") {
    val root = java.nio.file.Files.createTempDirectory("graft_srpix").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val corpus = GraftTable(spark, s"$root/corpus_data",
        s"$root/corpus_man", "vec_id")
      corpus.create(e.filter(col("vec_id") < 450), 4)
      val idx = AnnIndexSrp.build(spark, corpus, 1, root)
      assert(AnnIndex.indexedCorpusVersion(idx) == 1)
      assert(AnnIndexSrp.loadParams(spark, root) ==
        ((graft.functions.TextHash.SrpTables,
          graft.functions.TextHash.SrpTableBits,
          graft.functions.TextHash.SrpProbes, "vector")))

      // one row per (vector, table)
      val v0 = idx.committedVersions.max
      assert(idx.readAsOf(v0).count() ==
        450L * graft.functions.TextHash.SrpTables)

      // ---- recall on the clustered fixture at the production
      // geometry (SimilaritySpec measures 1.0 for the same settings on
      // the per-query pipeline; the persisted index must match)
      val exactBase = TestBase.exactTopK(e.filter(col("vec_id") < 450), 10, 5)
      val gotBase = pairs(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5))
      val recallBase = exactBase.intersect(gotBase).size.toDouble /
        exactBase.size
      info(s"SRP persisted-index recall (base corpus): $recallBase")
      assert(recallBase >= 0.95, s"recall $recallBase")

      // ---- probed buckets file-prune through ONE pruneIn pass
      val total = idx.files(v0).size
      assert(total >= 4, s"index must be a multi-file layout, got $total")
      val (keptOne, totOne) = idx.pruneIn(v0, idx.key, Seq(0L))
      assert(keptOne.size < totOne,
        s"a single-bucket probe must skip index files (kept ${keptOne.size}/$totOne)")

      // ---- corpus grows; refresh folds ONLY the churn, geometry frozen
      val paramsBefore = spark.read.parquet(s"$root/srp_params")
        .collect().map(_.toString).sorted.toSeq
      val filesBefore = idx.files(v0).toSet
      corpus.commitAppend(e.filter(col("vec_id") >= 450), 1, 2)
      val exactFull = TestBase.exactTopK(e, 10, 5)
      val holdoutHits = exactFull.filter(_._2 >= 450L)
      assert(holdoutHits.nonEmpty, "fixture must make holdout rows neighbors")
      // pre-refresh: fresh segment serves the appends
      val gotLagged = pairs(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5))
      assert(holdoutHits.exists(gotLagged.contains),
        "un-indexed appends must be searchable through the fresh segment")
      val n = AnnIndexSrp.refresh(spark, corpus, 2, root)
      assert(n == 50L,
        s"refresh must report churn VECTORS (not T x rows), got $n")
      assert(spark.read.parquet(s"$root/srp_params")
        .collect().map(_.toString).sorted.toSeq == paramsBefore,
        "refresh must never change the hash geometry")
      val vNew = idx.committedVersions.max
      val filesAfter = idx.files(vNew).toSet
      assert(filesBefore.subsetOf(filesAfter),
        "refresh must carry the base index files untouched")
      val newRows = idx.readAsOf(vNew, (filesAfter -- filesBefore).toSeq)
      assert(newRows.select("nid").distinct().collect()
        .map(_.getLong(0)).toSet == (450L until 500L).toSet,
        "the new index files must hold exactly the churn vectors")
      assert(newRows.count() == 50L * graft.functions.TextHash.SrpTables)

      // ---- post-refresh recall
      val gotFull = pairs(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5))
      val recallFull = exactFull.intersect(gotFull).size.toDouble /
        exactFull.size
      info(s"SRP persisted-index recall (after incremental refresh): $recallFull")
      assert(recallFull >= 0.95, s"post-refresh recall $recallFull")

      // ---- delete: pre-refresh via the fresh segment (zero index
      // writes), post-fold via old-bucket tombstones
      val victim = gotFull.head._2
      assert(corpus.commitDelete(
        Seq(org.apache.spark.sql.sources.EqualTo("vec_id", victim)),
        corpus.committedVersions.max, 2) == 1L)
      val idxVersions = idx.committedVersions
      def searchNow() = pairs(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5))
      assert(!searchNow().exists(_._2 == victim),
        "a deleted corpus row must drop out of search results")
      assert(idx.committedVersions == idxVersions,
        "the delete must not have written to the index")
      AnnIndexSrp.refresh(spark, corpus, corpus.committedVersions.max, root)
      assert(!searchNow().exists(_._2 == victim),
        "a refresh-folded delete must tombstone its index entries")

      // ---- update rescores with the CURRENT vector through both
      // paths; the folded case exercises the old-bucket tombstone +
      // new-bucket live-row pair
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
      val preRefresh = topOfQ0(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5))
      assert(preRefresh == (target, 1.0),
        s"un-indexed update must rescore through the fresh segment: $preRefresh")
      AnnIndexSrp.refresh(spark, corpus, corpus.committedVersions.max, root)
      val postRefresh = topOfQ0(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5))
      assert(postRefresh == (target, 1.0),
        s"folded update must win generation dedup with its new vector: $postRefresh")

      // refresh covering an already-covered version is a no-op
      assert(AnnIndexSrp.refresh(spark, corpus,
        corpus.committedVersions.max, root) == 0L)

      // an EMPTY probe set is a legal empty search, not a crash —
      // parity with the sibling indexes
      assert(AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 0)).count() == 0L)
    } finally { e.unpersist(); () }
  }

  test("SRP index with PQ storage: codes-only rows, shared ADC+rerank tail, live maintenance") {
    val root = java.nio.file.Files.createTempDirectory("graft_srppq").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val corpus = GraftTable(spark, s"$root/corpus_data",
        s"$root/corpus_man", "vec_id")
      corpus.create(e.filter(col("vec_id") < 450), 4)
      val idx = AnnIndexSrp.build(spark, corpus, 1, root, storage = "pq")
      assert(AnnIndexSrp.loadParams(spark, root)._4 == "pq")

      // codes-only: no float-array column anywhere; M int codes per row,
      // one row per (vector, table) — rows 108+111 composed, which also
      // cancels LSH's T-rows-per-vector storage multiplier in bytes
      val v0 = idx.committedVersions.max
      val idxDf = idx.readAsOf(v0)
      assert(!idxDf.schema.exists(f => f.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] &&
        f.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType == org.apache.spark.sql.types.FloatType),
        s"PQ-stored SRP index must carry no vectors: ${idxDf.schema.simpleString}")
      assert(idxDf.select(size(col("code"))).distinct().collect()
        .map(_.getInt(0)).toSet == Set(graft.operators.AnnIndexPq.M))
      assert(idxDf.count() ==
        450L * graft.functions.TextHash.SrpTables)

      // recall through the shared ADC + pruneIn-rerank tail
      val exactBase = TestBase.exactTopK(e.filter(col("vec_id") < 450), 10, 5)
      def got() = AnnIndexSrp.search(spark, corpus, root,
          e.filter(col("vec_id") < 10), k = 5, rerank = 60)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exactBase.intersect(got()).size.toDouble / exactBase.size
      info(s"SRP+PQ persisted-index recall (base corpus): $recall")
      assert(recall >= 0.9, s"recall $recall")

      // maintenance through the shared skeleton: append + refresh with
      // frozen codebooks, then a delete drops out post-fold
      val cbBefore = spark.read.parquet(s"$root/codebook")
        .collect().map(_.toString).sorted.toSeq
      corpus.commitAppend(e.filter(col("vec_id") >= 450), 1, 2)
      assert(AnnIndexSrp.refresh(spark, corpus, 2, root) == 50L)
      assert(spark.read.parquet(s"$root/codebook")
        .collect().map(_.toString).sorted.toSeq == cbBefore,
        "refresh must never retrain the codebooks")
      val exactFull = TestBase.exactTopK(e, 10, 5)
      val recallFull = exactFull.intersect(got()).size.toDouble /
        exactFull.size
      info(s"SRP+PQ persisted-index recall (post-refresh): $recallFull")
      assert(recallFull >= 0.9, s"post-refresh recall $recallFull")
      val victim = got().head._2
      assert(corpus.commitDelete(
        Seq(org.apache.spark.sql.sources.EqualTo("vec_id", victim)),
        corpus.committedVersions.max, 2) == 1L)
      AnnIndexSrp.refresh(spark, corpus, corpus.committedVersions.max, root)
      assert(!got().exists(_._2 == victim),
        "a folded delete must tombstone its index entries")
    } finally { e.unpersist(); () }
  }

  test("SRP lag + generation repack: debt observable through the " +
      "bkey-keyed handle; repack keeps the T-row shape and results") {
    val root = java.nio.file.Files.createTempDirectory("graft_srpmx").toString
    val e = TestBase.clusteredEmbeddings(spark).cache()
    try {
      val corpus = GraftTable(spark, s"$root/corpus_data",
        s"$root/corpus_man", "vec_id")
      corpus.create(e.filter(col("vec_id") < 450), 4)        // v1
      AnnIndexSrp.build(spark, corpus, 1, root)
      val (tables, _, _, _) = AnnIndexSrp.loadParams(spark, root)

      // un-refreshed churn: the SRP-handle lag reports the debt
      corpus.commitAppend(e.filter(col("vec_id") >= 450), 1, 2) // v2
      val l1 = AnnIndexSrp.lag(spark, corpus, root).head
      assert(l1.getLong(2) == 1L && l1.getLong(4) >= 50L, l1)
      AnnIndexSrp.refresh(spark, corpus, 2, root)
      // fold a delete -> T tombstones into the old buckets, T base
      // rows superseded
      assert(corpus.commitDelete(
        Seq(org.apache.spark.sql.sources.EqualTo("vec_id", 460L)),
        2, 2) == 1L)                                          // v3
      AnnIndexSrp.refresh(spark, corpus, 3, root)

      val idx = AnnIndexSrp.table(spark, root)
      val total0 = idx.readAsOf(idx.committedVersions.max).count()
      def got() = AnnIndexSrp.search(spark, corpus, root,
        e.filter(col("vec_id") < 10), k = 5).collect()
        .map(_.toString).toSeq
      val before = got()
      val dropped = AnnIndexSrp.repack(spark, root)
      // the deleted vector's T base rows AND its T tombstones drop
      assert(dropped >= 2L * tables, s"dropped $dropped (T=$tables)")
      val after = idx.readAsOf(idx.committedVersions.max)
      assert(after.count() == total0 - dropped)
      assert(after.filter(col("dead")).count() == 0L)
      // the T-rows-per-vector storage shape survives the repack
      val perNid = after.groupBy("nid").agg(count(lit(1)).as("n"))
        .select("n").distinct().collect().map(_.getLong(0)).toSet
      assert(perNid == Set(tables.toLong), s"per-nid rows: $perNid")
      assert(got() == before,
        "repack must not change a single SRP search result")
      assert(AnnIndexSrp.refresh(spark, corpus, 3, root) == 0L)
    } finally { e.unpersist(); () }
  }

  test("a codes-only build over an empty corpus refuses loudly and " +
      "leaves NO partially-initialized root") {
    val root = java.nio.file.Files.createTempDirectory("graft_srpe").toString
    val corpus = GraftTable(spark, s"$root/corpus_data",
      s"$root/corpus_man", "vec_id")
    corpus.create(TestBase.clusteredEmbeddings(spark).limit(0), 1)
    val err = intercept[IllegalArgumentException](
      AnnIndexSrp.build(spark, corpus, 1, root, storage = "pq"))
    assert(err.getMessage.contains("empty corpus"), err.getMessage)
    // srp_params lands AFTER the codebook, so a failed pq build leaves
    // no frozen geometry behind — the root is not mistakable for an
    // index root
    assert(!new java.io.File(s"$root/srp_params").exists(),
      "a failed pq build must not leave srp_params behind")
  }
}
