package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSketch, VectorExprs}

/** Config-only deployment of the engine's native function surface:
  *
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  * }}}
  *
  * injects the codegen'd vector expressions and the MinHash sketch
  * aggregate into every session built from that config — no code needed
  * on the user side, `SELECT cosine_similarity(a.e, b.e)` just works.
  * (The per-session registration path, `VectorExprs.register`, stays for
  * programmatic use; this is the cluster-wide story, the Spark-idiomatic
  * equivalent of the reference's "drop the jar + set fs.*.impl" flow.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${es.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in COUNT(DISTINCT) -> HLL rewrite; inert until
    // spark.graft.approxDistinct.enabled=true (see ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite())
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRewrite())
    // graft_snapshot manifest pruning: WHERE conjuncts on the table key /
    // declared stats columns become file-level skipping in the optimizer
    // (SnapshotPruneRule), then the leaf expands to a native parquet
    // relation over only the surviving files once pushdown has settled
    // (SnapshotExpandRule, pre-CBO)
    ext.injectOptimizerRule(_ => graft.table.SnapshotPruneRule)
    ext.injectPreCBORule(s => graft.table.SnapshotExpandRule(s))
    // name-addressed catalog tables (spark.sql.catalog.<name> =
    // graft.table.GraftCatalog): the analyzed v2 relation over a
    // GraftV2Table is replaced with the SAME prunable snapshot plan the
    // graft_snapshot TVF builds, so SELECT ... FROM <name> file-prunes
    // and broadcasts identically; write commands keep their v2 relation
    ext.injectResolutionRule(s => graft.table.GraftV2ExpandRule(s))
    // SQL UPDATE / MERGE INTO on named graft tables: the resolved
    // UpdateTable/MergeIntoTable over a GraftV2Table compiles onto the
    // table's own envelope-pruned MoR-aware rewrite commands (the
    // Delta Preprocess* shape) — post-hoc, before CheckAnalysis would
    // reject the nodes as unsupported
    ext.injectPostHocResolutionRule(s => graft.table.GraftDmlRewrite(s))
    // native as-of join physical operator (AsOfJoinPlan -> AsOfJoinExec);
    // AsOfJoin.asof also self-registers via spark.experimental
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    // pure-SQL as-of surface: LEFT JOIN ... ON asof_match(...) is
    // rewritten into AsOfJoinPlan right after resolution (see AsOfSql)
    ext.injectPostHocResolutionRule(_ => graft.plans.AsOfMarkerRewrite)
    ext.injectFunction((
      FunctionIdentifier("asof_match"),
      info("asof_match",
        "asof_match(lkey, rkey, ltime, rtime[, direction[, tolerance]]) - " +
          "as-of join marker; the entire ON condition of a LEFT JOIN. " +
          "direction: 'backward' (default) | 'forward' | 'nearest'; " +
          "tolerance: day-time INTERVAL literal"),
      (es: Seq[Expression]) => {
        if (es.length < 4 || es.length > 6)
          throw new IllegalArgumentException(
            s"asof_match requires 4-6 arguments, got ${es.length}")
        graft.plans.AsOfMatchMarker(es)
      }))
    // pure-SQL time travel over GraftTable snapshots:
    // SELECT * FROM graft_snapshot('<manifestDir>', 2) — resolution
    // plans the file list from the committed manifest version alone
    ext.injectTableFunction((
      FunctionIdentifier("graft_snapshot"),
      info("graft_snapshot",
        "graft_snapshot(manifestDir, version) - time-travel scan of a " +
          "GraftTable snapshot; plans from the committed manifest only"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.plan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      info("graft_changes",
        "graft_changes(manifestDir, vFrom, vTo) - row-level change feed " +
          "between two committed snapshots (insert|update|delete); reads " +
          "only the churned files"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.changesPlan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_history"),
      info("graft_history",
        "graft_history(manifestDir) - one row per committed snapshot: " +
          "(version, n_files, n_rows, bytes, data_change, commit_ts); " +
          "computed from manifests alone, no data read"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.historyPlan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_files"),
      info("graft_files",
        "graft_files(manifestDir[, version]) - one row per manifest " +
          "entry of the snapshot (default latest): file, stats boxes, " +
          "live n_rows, bytes, dv, masked_rows (deletion-vector debt); " +
          "reads manifests + DV files only, never a data file"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.filesPlan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_optimize"),
      info("graft_optimize",
        "graft_optimize(manifestDir, targetBytes) - bin-pack the latest " +
          "snapshot's small files as a dataChange=false commit; returns " +
          "(compacted_files, latest_version)"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.optimizePlan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_vacuum"),
      info("graft_vacuum",
        "graft_vacuum(manifestDir, keepFrom[, graceMs]) - drop versions " +
          "below keepFrom and reclaim unreferenced data files; one row " +
          "per deleted file"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.vacuumPlan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_restore"),
      info("graft_restore",
        "graft_restore(manifestDir, version) - commit a new snapshot " +
          "referencing version's exact file list (zero data copied); " +
          "returns (restored_to, new_version)"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.restorePlan(es)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_delete"),
      info("graft_delete",
        "graft_delete(manifestDir, lo, hi) - copy-on-write DELETE of " +
          "rows whose table key is in [lo, hi]; rewrites only the files " +
          "whose boxes intersect; returns (deleted_rows, latest_version)"),
      (es: Seq[Expression]) => graft.table.SnapshotSql.deletePlan(es)))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine of two float/double vectors"),
      (es: Seq[Expression]) => {
        arity("cosine_similarity", 2)(es)
        VectorExprs.CosineSimilarity(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - dot product of two float/double vectors"),
      (es: Seq[Expression]) => {
        arity("dot_product", 2)(es)
        VectorExprs.DotProduct(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sketch"),
      info("minhash_sketch",
        "minhash_sketch(shingle) - 64-permutation MinHash signature aggregate"),
      (es: Seq[Expression]) => {
        arity("minhash_sketch", 1)(es)
        MinHashSketch(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(text) - per-document 64-permutation MinHash over 3-gram shingles"),
      (es: Seq[Expression]) => {
        arity("minhash_signature", 1)(es)
        graft.functions.TextHashExprs.MinHashSignature(es.head, 3)
      }))
    ext.injectFunction((
      FunctionIdentifier("band_hashes"),
      info("band_hashes",
        "band_hashes(sig) - LSH band hashes of a MinHash signature"),
      (es: Seq[Expression]) => {
        arity("band_hashes", 1)(es)
        graft.functions.TextHashExprs.BandHashes(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of the word multiset"),
      (es: Seq[Expression]) => {
        arity("simhash64", 1)(es)
        graft.functions.TextHashExprs.SimHash64(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("srp_bucket"),
      info("srp_bucket",
        "srp_bucket(embedding) - sign-random-projection LSH bucket id"),
      (es: Seq[Expression]) => {
        arity("srp_bucket", 1)(es)
        graft.functions.TextHashExprs.SrpBucket(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("z_value"),
      info("z_value",
        "z_value(a, b) - 64-bit Morton code of two bigint columns " +
          "(Z-order layout key)"),
      (es: Seq[Expression]) => {
        arity("z_value", 2)(es)
        graft.functions.ZOrder.ZValue(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("freq_items_sketch"),
      info("freq_items_sketch",
        "freq_items_sketch(item) - frequent-items (Misra-Gries) aggregate; " +
          "array<struct<term,est,lb,ub>> sorted by est desc"),
      (es: Seq[Expression]) => {
        arity("freq_items_sketch", 1)(es)
        graft.functions.FreqItemsSketchAgg(es.head, 2048)
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_sketch_agg"),
      info("theta_sketch_agg",
        "theta_sketch_agg(item) - theta distinct-count sketch aggregate " +
          "(compact sketch bytes)"),
      (es: Seq[Expression]) => {
        arity("theta_sketch_agg", 1)(es)
        graft.functions.ThetaSketchAgg(es.head, 15)
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_estimate"),
      info("theta_estimate",
        "theta_estimate(sketch) - distinct estimate of a theta sketch"),
      (es: Seq[Expression]) => {
        arity("theta_estimate", 1)(es)
        graft.functions.ThetaExprs.ThetaEstimate(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_intersect_estimate"),
      info("theta_intersect_estimate",
        "theta_intersect_estimate(a, b) - |A n B| estimate of two theta sketches"),
      (es: Seq[Expression]) => {
        arity("theta_intersect_estimate", 2)(es)
        graft.functions.ThetaExprs.ThetaIntersectEstimate(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_union_estimate"),
      info("theta_union_estimate",
        "theta_union_estimate(a, b) - |A u B| estimate of two theta sketches"),
      (es: Seq[Expression]) => {
        arity("theta_union_estimate", 2)(es)
        graft.functions.ThetaExprs.ThetaUnionEstimate(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch_agg"),
      info("kll_sketch_agg",
        "kll_sketch_agg(value[, k]) - mergeable KLL quantile sketch " +
          "aggregate over a DOUBLE column (compact sketch bytes). " +
          "k is a literal int, default 200 (~1.33% worst-case rank error); " +
          "larger k = lower error, more memory"),
      (es: Seq[Expression]) => {
        if (es.isEmpty || es.length > 2)
          throw new IllegalArgumentException(
            s"kll_sketch_agg requires 1 or 2 arguments, got ${es.length}")
        val k = es.lift(1) match {
          case None => 200
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(
            i: Int, org.apache.spark.sql.types.IntegerType)) => i
          case Some(other) => throw new IllegalArgumentException(
            s"kll_sketch_agg k must be a literal INT, got '$other'")
        }
        // Datasketches KLL bounds; reject at analysis, not on executors
        if (k < 8 || k > 65535)
          throw new IllegalArgumentException(
            s"kll_sketch_agg k must be in [8, 65535], got $k")
        graft.functions.KllSketchAgg(es.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_rows"),
      info("top_k_rows",
        "top_k_rows(struct, k[, largest]) - bounded-heap top-k aggregate: " +
          "array of the k extreme structs under field-by-field ordering, " +
          "best first. k a literal int; largest a literal boolean " +
          "(default true). Map-side partial keeps <= k rows per group"),
      (es: Seq[Expression]) => {
        if (es.length < 2 || es.length > 3)
          throw new IllegalArgumentException(
            s"top_k_rows requires 2 or 3 arguments, got ${es.length}")
        val k = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            i: Int, org.apache.spark.sql.types.IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"top_k_rows k must be a literal INT, got '$other'")
        }
        val largest = es.lift(2) match {
          case None => true
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(
            b: Boolean, org.apache.spark.sql.types.BooleanType)) => b
          case Some(other) => throw new IllegalArgumentException(
            s"top_k_rows largest must be a literal BOOLEAN, got '$other'")
        }
        graft.functions.TopKRowsAgg(es.head, k, largest)
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(key[, expectedItems[, fpp]]) - bloom-filter aggregate " +
          "over an integral or string key column; returns the sketch's " +
          "portable bytes (file-skipping manifests, membership pruning). " +
          "Defaults: expectedItems 4096, fpp 0.01"),
      (es: Seq[Expression]) => {
        if (es.isEmpty || es.length > 3)
          throw new IllegalArgumentException(
            s"bloom_agg requires 1 to 3 arguments, got ${es.length}")
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
        val n = es.lift(1) match {
          case None => 4096L
          case Some(Literal(i: Int, IntegerType)) => i.toLong
          case Some(Literal(l: Long, LongType)) => l
          case Some(other) => throw new IllegalArgumentException(
            s"bloom_agg expectedItems must be a literal integer, got '$other'")
        }
        val fpp = es.lift(2) match {
          case None => 0.01
          case Some(Literal(d: Double, DoubleType)) => d
          // a bare SQL literal like 0.01 arrives as a Decimal
          case Some(Literal(d: org.apache.spark.sql.types.Decimal, _)) =>
            d.toDouble
          case Some(other) => throw new IllegalArgumentException(
            s"bloom_agg fpp must be a literal double, got '$other'")
        }
        graft.functions.BloomFilterBuildAgg(es.head, n, fpp)
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - count of common elements of two " +
          "SORTED, duplicate-free string arrays (allocation-free merge " +
          "scan; the similarity-join verify primitive). Unsorted input " +
          "undercounts — sort with array_sort(array_distinct(...))"),
      (es: Seq[Expression]) => {
        arity("sorted_intersect_count", 2)(es)
        graft.functions.ArrayExprs.SortedIntersectCount(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_quantile"),
      info("kll_quantile",
        "kll_quantile(sketch, rank) - value at normalized rank of a KLL sketch"),
      (es: Seq[Expression]) => {
        arity("kll_quantile", 2)(es)
        graft.functions.KllExprs.KllQuantile(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_rank"),
      info("kll_rank",
        "kll_rank(sketch, value) - normalized rank of a value in a KLL sketch"),
      (es: Seq[Expression]) => {
        arity("kll_rank", 2)(es)
        graft.functions.KllExprs.KllRank(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_anotb_estimate"),
      info("theta_anotb_estimate",
        "theta_anotb_estimate(a, b) - |A \\ B| estimate of two theta sketches"),
      (es: Seq[Expression]) => {
        arity("theta_anotb_estimate", 2)(es)
        graft.functions.ThetaExprs.ThetaAnotBEstimate(es.head, es(1))
      }))
  }
}
