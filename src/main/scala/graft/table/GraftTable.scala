package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE implementation of the lakehouse-table mechanics that the
  * operator surface exposes several policies over: q100 (file-skipping
  * manifest), q105 (in-place COW merge), q106 (stats-only planning),
  * q107 (MoR deletion vectors), q108 (time travel), q110
  * (snapshot-isolated merge + vacuum), q111 (incremental CDC) and the
  * streaming ManifestIngestSink all build from these primitives —
  * previously each re-implemented its own copy (VERDICT r7 #2 / r8 #6).
  *
  * Scale contract, shared by every operation here:
  *  - DATA work (scans, stats aggregation, survivor anti-joins,
  *    clustered rewrites) is distributed Spark over only the files a
  *    manifest names — never the whole table.
  *  - PLANNING work (manifest reads, box pruning, reference-set math,
  *    commit bookkeeping) is O(#files) and driver-resident by declared
  *    design, exactly like a Delta log replay.
  *  - COMMITS are atomic: a manifest version is written to a `_tmp_*`
  *    staging dir and RENAMED into `v=N` in one filesystem op, so
  *    `v=N` existing means `v=N` is complete — a crash can leave only
  *    unreferenced data files / staging dirs, both invisible to
  *    readers and reclaimed by [[vacuum]].
  *
  * A table is (data dir, manifest dir, cluster/skip key). The manifest
  * schema is `(file, lo, hi, n_rows)` — per-file key boxes + row
  * counts, enough for min/max skipping (readAsOf/prune), metadata-only
  * counts (statsOnlySplit), and vacuum reference sets.
  */
final case class GraftTable(spark: SparkSession, data: String, man: String,
    key: String) {

  import GraftTable.rmRecursive

  // ---- physical layout ---------------------------------------------

  /** Range-cluster `df` on the table key and write it: clustering is
    * what keeps per-file boxes tight (and therefore skipping sharp) —
    * the same reason q81 z-orders. */
  def clusteredWrite(df: DataFrame, nParts: Int, mode: String): Unit =
    GraftTable.clusteredWrite(df, key, nParts, mode, data)

  /** Data files currently in the layout (names only — commit
    * bookkeeping, not planning; no data is read). */
  def partFiles: Set[String] = GraftTable.partFiles(data)

  /** Per-file (file, lo, hi, n_rows) stats for `files`, built by ONE
    * distributed partial-agg scan of exactly those files. */
  def fileStats(files: Seq[String]): DataFrame =
    GraftTable.fileStats(spark, files, key)

  // ---- commit protocol ---------------------------------------------

  def manifestPath(v: Int): String = s"$man/v=$v"

  /** Existence IS the commit marker — see the atomic-rename contract in
    * the class doc. */
  def isCommitted(v: Int): Boolean =
    new java.io.File(manifestPath(v)).exists()

  def committedVersions: Seq[Int] = {
    val fs = new java.io.File(man).listFiles()
    (if (fs == null) Array.empty[java.io.File] else fs)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.drop(2).toInt).toSeq.sorted
  }

  /** Attempt to commit `entries` as manifest version `v`: write to a
    * staging dir, rename into place. Returns false (staging dropped) if
    * another writer committed `v` first — the rename is the ONE atomic
    * op that decides the race. An optional `tag` is recorded as an
    * underscore-hidden marker file INSIDE the version dir, atomically
    * with the commit itself — provenance a caller can query with
    * [[versionWithTag]] (the ingest sink keys replay detection on the
    * batch tag, never on version arithmetic, so maintenance commits
    * like OPTIMIZE can interleave without shifting any batch onto an
    * already-committed version number). */
  def tryCommitManifest(entries: DataFrame, v: Int,
      tag: Option[String] = None): Boolean = {
    val tmp = new java.io.File(
      s"$man/_tmp_v${v}_${java.util.UUID.randomUUID().toString.take(8)}")
    entries.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    tag.foreach { t =>
      require(new java.io.File(tmp, s"_tag_$t").createNewFile(),
        s"could not record commit tag $t")
    }
    val dst = new java.io.File(manifestPath(v))
    val won = tmp.renameTo(dst)
    if (!won) rmRecursive(tmp)
    won
  }

  /** Commit `entries` as version `v`, tolerating an equivalent-content
    * race: losing the rename to a concurrent REPLAY of the same batch
    * is fine (that snapshot is byte-equivalent by construction). Use
    * [[commitAppendOcc]] when concurrent writers may commit DIFFERENT
    * content. */
  def commitManifest(entries: DataFrame, v: Int,
      tag: Option[String] = None): Unit =
    if (!tryCommitManifest(entries, v, tag))
      require(new java.io.File(manifestPath(v)).exists(),
        s"manifest commit v=$v failed: rename refused and no committed version present")

  /** The committed version carrying `tag`, if any — O(#versions)
    * driver-side, like all manifest planning. */
  def versionWithTag(tag: String): Option[Int] =
    committedVersions.find(v =>
      new java.io.File(manifestPath(v), s"_tag_$tag").exists())

  /** Whether `tag` was EVER committed — live versions plus the `_tags`
    * ledger that [[vacuum]] preserves when it expires a tagged version.
    * Replay detection must use this, not [[versionWithTag]]: vacuuming
    * a batch's version must not make its replay look uncommitted. */
  def tagCommitted(tag: String): Boolean =
    versionWithTag(tag).isDefined ||
      new java.io.File(s"$man/_tags/_tag_$tag").exists()

  def manifest(v: Int): DataFrame = spark.read.parquet(manifestPath(v))

  // ---- snapshot operations -----------------------------------------

  /** (Re-)create the table: clustered initial layout + manifest v=1.
    * Destructive by contract (overwrite semantics): the data rewrite
    * invalidates every prior snapshot, so the old version history is
    * dropped — otherwise a stale committed v=1 would win the
    * atomic-commit race and reference the overwritten files. */
  def create(df: DataFrame, nParts: Int): GraftTable = {
    clusteredWrite(df, nParts, "overwrite")
    val manDir = new java.io.File(man)
    if (manDir.exists()) rmRecursive(manDir)
    manDir.mkdirs()
    commitManifest(fileStats(Seq(data)), 1)
    this
  }

  /** Create with an EMPTY v=1 (the streaming-ingest starting point). */
  def createEmpty(): GraftTable = {
    new java.io.File(data).mkdirs()
    if (!isCommitted(1)) commitManifest(emptyEntries, 1)
    this
  }

  private def emptyEntries: DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      GraftTable.manifestSchema)

  /** Write the batch's clustered files through a UNIQUE staging subdir
    * and move them into the layout, returning exactly the added files'
    * paths. A before/after directory diff would misattribute a
    * concurrent writer's files landing in the same window (double- or
    * cross-referenced manifest entries); the staging dir makes the
    * added set exact under any concurrency. Underscore-prefixed dirs
    * are hidden from Spark/Hadoop scans, so a transient stage is
    * invisible to readers; part-file names carry job UUIDs, so moves
    * cannot collide. */
  private def stagedAppend(batch: DataFrame, nParts: Int): Seq[String] = {
    val stage = new java.io.File(
      s"$data/_stage_${java.util.UUID.randomUUID().toString.take(8)}")
    GraftTable.clusteredWrite(batch, key, nParts, "overwrite", stage.toString)
    val staged = stage.listFiles().filter(_.getName.startsWith("part-"))
    val moved = staged.map { f =>
      val dst = new java.io.File(data, f.getName)
      require(f.renameTo(dst), s"could not move staged file $f into $data")
      dst.getName
    }.toSeq
    rmRecursive(stage)
    moved.map(n => s"$data/$n")
  }

  /** Append-commit: new clustered data files + a new manifest version =
    * previous complete entry list + ONLY the new files' stats (existing
    * entries are never rescanned — rebuilding a 100 TB table's manifest
    * per batch would cost a full scan). Version `prevV` stays immutable. */
  def commitAppend(batch: DataFrame, prevV: Int, nParts: Int = 2,
      tag: Option[String] = None): Unit = {
    val added = stagedAppend(batch, nParts)
    val stats = if (added.isEmpty) emptyEntries else fileStats(added)
    commitManifest(manifest(prevV).unionByName(stats), prevV + 1, tag)
  }

  /** Optimistic-concurrency append for MULTI-WRITER tables (the Delta
    * commit protocol): appends never conflict on data (each writer's
    * files are its own, exactly tracked by the staged write), so a
    * writer that loses the manifest rename race simply REBASES — reread
    * the new latest version, union its own stats again, try the next
    * version number. No batch can be silently dropped and no writer
    * blocks another; the one atomic rename per version is the entire
    * coordination. Returns the version carrying this commit — ours, or
    * a concurrent same-tag winner's; -1 only when the tag is known
    * solely from the vacuum ledger (its version already expired), so
    * callers using the value as a version number must treat -1 as
    * "committed, version unavailable". */
  def commitAppendOcc(batch: DataFrame, nParts: Int = 2,
      maxRetries: Int = 50, tag: Option[String] = None): Int = {
    val added = stagedAppend(batch, nParts)
    val stats = if (added.isEmpty) emptyEntries else fileStats(added)
    var attempts = 0
    while (attempts <= maxRetries) {
      // a concurrent replay carrying OUR tag may have won a lost race:
      // its snapshot holds the batch, ours is redundant — stop, leaving
      // our staged files as vacuum-reclaimable orphans
      tag.foreach { t =>
        if (tagCommitted(t)) return versionWithTag(t).getOrElse(-1)
      }
      val base = committedVersions.max
      if (tryCommitManifest(manifest(base).unionByName(stats), base + 1, tag))
        return base + 1
      attempts += 1 // lost the race — rebase onto the winner's version
    }
    throw new IllegalStateException(
      s"append commit lost $maxRetries consecutive races; giving up")
  }

  /** Snapshot-isolated COW merge-commit: the manifest names the files
    * whose boxes intersect the batch's key envelope; ONLY those are
    * rewritten (survivors anti-joined + batch, re-clustered). Nothing
    * is deleted at commit — version `prevV` still references the old
    * files; `prevV+1` does not. [[vacuum]] reclaims later. The anti
    * join carries no hint: the batch is corpus-derived, AQE decides.
    * Merges are single-writer by contract: unlike appends, two merges
    * can rewrite the SAME impacted files, so a lost commit race cannot
    * be rebased mechanically — a real conflict needs re-running the
    * merge against the winner's snapshot. */
  def commitMerge(batch: DataFrame, prevV: Int, nParts: Int = 2): Unit = {
    // one pass computes the key envelope AND the null-key census: a
    // NULL merge key can never be matched by the anti join, so such a
    // row would duplicate on every re-merge and sit outside its file's
    // box — reject any, not just the all-NULL case min/max would hide
    // min/max cast to long so getLong is safe for every integral key
    // width (Row.getLong on a boxed Integer throws)
    val env = batch.agg(min(key).cast("long"), max(key).cast("long"),
      count(lit(1)), count(col(key))).head
    val (total, nonNull) = (env.getLong(2), env.getLong(3))
    def commitOrFail(entries: DataFrame): Unit =
      if (!tryCommitManifest(entries, prevV + 1))
        // merges are single-writer by contract; a lost race means the
        // snapshot moved underneath this merge and its rewrite is stale
        // — the lenient fallback would silently drop the whole batch
        throw new java.util.ConcurrentModificationException(
          s"merge lost the commit race for v=${prevV + 1}: another writer " +
            "committed first; re-run the merge against the latest snapshot")
    if (total == 0) { // empty batch: commit a carry-forward version
      commitOrFail(manifest(prevV))
      return
    }
    require(nonNull == total,
      s"merge batch has ${total - nonNull} NULL '$key' key(s) — " +
        "the merge key must be non-null")
    val impacted = manifest(prevV).collect().filter { r =>
      r.getAs[Number]("hi").longValue >= env.getLong(0) &&
        r.getAs[Number]("lo").longValue <= env.getLong(1)
    }.map(_.getAs[String]("file")).toSeq
    val replacement =
      (if (impacted.isEmpty) batch.limit(0)
       else spark.read.parquet(impacted: _*)
         .join(batch.select(key).distinct(), Seq(key), "left_anti"))
        .unionByName(batch)
    val added = stagedAppend(replacement, nParts)
    commitOrFail(
      manifest(prevV).filter(!col("file").isin(impacted: _*))
        .unionByName(if (added.isEmpty) emptyEntries else fileStats(added)))
  }

  /** OPTIMIZE: bin-pack the snapshot's small files into ~targetBytes
    * files as a NEW snapshot version. Content-identical to `prevV` —
    * a pure layout change, so readers see the same rows — and
    * snapshot-isolated like every commit: old versions keep
    * time-traveling to the small files until [[vacuum]] reclaims them.
    * Planning (file sizes from the manifest's URIs, bin count) is
    * driver-side O(#files); the rewrite reads ONLY the small files —
    * already-compact files are carried over as untouched entries, so a
    * steady-state 100 TB table re-packs just its ingest tail. Returns
    * the number of files compacted away. */
  def commitCompaction(prevV: Int, targetBytes: Long,
      maxRetries: Int = 5): Int = {
    var base = math.max(prevV, committedVersions.max)
    var attempts = 0
    while (attempts <= maxRetries) {
      // (re)plan against the CURRENT latest: losing the commit race to
      // a concurrent batch means the file population changed, so the
      // pack set must be recomputed, not just the version number —
      // compaction may never be "accepted" by someone else's snapshot
      // winning the rename (that snapshot doesn't contain the pack)
      val entries = manifest(base).collect().map(_.getAs[String]("file"))
      val (small, _) = entries.partition { f =>
        new java.io.File(new java.net.URI(f).getPath).length() < targetBytes
      }
      if (small.length <= 1) return 0 // already compact: no commit, no
                                      // burned version, no no-op batch
                                      // for change-feed consumers
      else {
        val totalBytes = small.map(f =>
          new java.io.File(new java.net.URI(f).getPath).length()).sum
        val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
        val added = stagedAppend(spark.read.parquet(small.toSeq: _*), nOut)
        if (tryCommitManifest(
            manifest(base).filter(!col("file").isin(small.toSeq: _*))
              .unionByName(if (added.isEmpty) emptyEntries else fileStats(added)),
            base + 1))
          return small.length
        // lost: this attempt's packed output becomes vacuum-reclaimable
        // orphans; replan from the winner's version
      }
      attempts += 1
      base = committedVersions.max
    }
    throw new IllegalStateException(
      s"compaction lost $maxRetries consecutive commit races; giving up")
  }

  /** Resolve "TIMESTAMP AS OF": the LATEST committed version whose
    * commit time is <= `epochMs` (Delta's timestamp time travel). The
    * commit time is the version directory's mtime — set when the
    * staging dir (and its contents) were written, immediately before
    * the atomic rename publishes it. O(#versions) driver-side. */
  def versionAsOfTime(epochMs: Long): Int = {
    val vs = committedVersions
    require(vs.nonEmpty, s"no committed versions under $man")
    val eligible = vs.filter(v =>
      new java.io.File(manifestPath(v)).lastModified() <= epochMs)
    require(eligible.nonEmpty,
      s"no snapshot committed at or before $epochMs " +
        s"(earliest commit: ${new java.io.File(manifestPath(vs.min)).lastModified()})")
    eligible.max
  }

  /** Time travel: plan the file list from snapshot v's manifest alone. */
  def files(v: Int): Seq[String] =
    manifest(v).select("file").collect().map(_.getString(0)).toSeq

  def readAsOf(v: Int): DataFrame = {
    val fs = files(v)
    if (fs.nonEmpty) spark.read.parquet(fs: _*)
    else if (GraftTable.partFiles(data).nonEmpty)
      spark.read.parquet(data).limit(0) // typed empty, schema from layout
    else
      // an empty snapshot of a still-empty table carries no schema at
      // all — fail with intent instead of Spark's inference error
      throw new IllegalStateException(
        s"snapshot v=$v of $man references no files and the layout $data " +
          "is empty: an empty table has no schema to scan")
  }

  /** Min/max skipping against version v's manifest. */
  def prune(v: Int, qlo: Long, qhi: Long): (Seq[String], Int) =
    GraftTable.pruneManifest(spark, manifestPath(v), qlo, qhi)

  /** Metadata-only split against version v's manifest. */
  def statsOnlySplit(v: Int, qlo: Long, qhi: Long): (Long, Seq[String], Int) =
    GraftTable.statsOnlySplit(spark, manifestPath(v), qlo, qhi)

  /** VACUUM: drop manifest versions below `keepFrom`, then delete every
    * data file referenced by NO retained version (plus crashed `_tmp_*`
    * / `_stage_*` staging dirs). Returns the deleted data-file names.
    *
    * Concurrency: the retained horizon is re-read from the manifest dir
    * at scan time (max of `latest` and the current committed max), so a
    * version another writer commits between the caller's planning and
    * this scan still protects its files. An IN-FLIGHT commit (files
    * moved, manifest rename not yet done) is indistinguishable from a
    * crash orphan by reference-counting alone — that is what `graceMs`
    * is for: nothing younger than the grace is deleted. Multi-writer
    * deployments must vacuum with a grace exceeding their longest
    * commit (the Delta retention-period contract); the default 0 is
    * the single-writer admin op on a quiesced table. */
  def vacuum(keepFrom: Int, latest: Int, graceMs: Long = 0L): Seq[String] = {
    val upper = math.max(latest, committedVersions.max)
    // versions below an earlier vacuum's horizon no longer exist —
    // skip them instead of failing the whole reclamation on a read
    val referenced = (keepFrom to upper).filter(isCommitted).flatMap { v =>
      files(v).map(p =>
        new java.io.File(new java.net.URI(p).getPath).getName)
    }.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    def aged(f: java.io.File): Boolean = f.lastModified() <= cutoff
    val orphans = (partFiles -- referenced).toSeq.sorted
      .filter(n => aged(new java.io.File(s"$data/$n")))
    orphans.foreach { n =>
      require(new java.io.File(s"$data/$n").delete(), s"could not vacuum $n")
    }
    (1 until keepFrom).foreach { v =>
      val d = new java.io.File(manifestPath(v))
      if (d.exists()) {
        // preserve commit tags in the ledger before expiring the
        // version: a vacuumed batch's replay must still read as
        // committed (tagCommitted), or it would re-append its rows
        val marks = d.listFiles()
        if (marks != null && marks.exists(_.getName.startsWith("_tag_"))) {
          val ledger = new java.io.File(man, "_tags")
          ledger.mkdirs()
          marks.filter(_.getName.startsWith("_tag_")).foreach { t =>
            // markers are empty: (re)creating at the destination is the
            // whole preservation — and unlike a rename it cannot fail
            // silently before rmRecursive destroys the only record that
            // the batch committed
            val dst = new java.io.File(ledger, t.getName)
            require(dst.exists() || dst.createNewFile(),
              s"could not preserve commit tag ${t.getName} in the ledger")
          }
        }
        rmRecursive(d)
      }
    }
    val staging = new java.io.File(man).listFiles()
    (if (staging == null) Array.empty[java.io.File] else staging)
      .filter(f => f.isDirectory && f.getName.startsWith("_tmp_") && aged(f))
      .foreach(rmRecursive)
    // crashed data-side staging dirs (writer died before the move) are
    // invisible to readers (underscore-hidden) but still hold bytes
    val stages = new java.io.File(data).listFiles()
    (if (stages == null) Array.empty[java.io.File] else stages)
      .filter(f => f.isDirectory && f.getName.startsWith("_stage_") && aged(f))
      .foreach(rmRecursive)
    orphans
  }

  /** Incremental CDC `vFrom -> vTo`: diff only the CHURNED files — the
    * symmetric difference of the versions' file sets (COW invariant: a
    * changed row lives in a rewritten file, so rows in shared files
    * cannot differ). A full-outer join on the key classifies
    * insert/update/delete; rewritten-but-unchanged survivors fall out
    * as equal pairs. Output: (key, old_<c>.., new_<c>.., op). At 100 TB
    * a 0.1% churn commit reads ~0.2% of the table instead of 200%. */
  def cdc(vFrom: Int, vTo: Int): DataFrame = {
    val (from, to) = (files(vFrom).toSet, files(vTo).toSet)
    if ((from ++ to).isEmpty)
      throw new IllegalStateException(
        s"cdc v=$vFrom -> v=$vTo: both snapshots reference no files, so " +
          "there is no schema to type the (empty) change feed with")
    def readFiles(fs: Set[String]): DataFrame =
      if (fs.isEmpty) // typed empty relation, same shape as the layout
        spark.read.parquet((from ++ to).head).limit(0)
      else spark.read.parquet(fs.toSeq: _*)
    val valueCols = readFiles(from ++ to).columns.filter(_ != key).toSeq
    // presence flags, not value-NULL checks, classify the op — a NULL in
    // a value column must not masquerade as an insert/delete
    val old = readFiles(from -- to).select(
      col(key) +: lit(true).as("__old") +:
        valueCols.map(c => col(c).as(s"old_$c")): _*)
    val neu = readFiles(to -- from).select(
      col(key) +: lit(true).as("__new") +:
        valueCols.map(c => col(c).as(s"new_$c")): _*)
    // a key-only table has nothing to differ on: same-key pairs are
    // rewritten-but-unchanged survivors
    val unchanged = valueCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    old.join(neu, Seq(key), "full_outer")
      .withColumn("op",
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .when(unchanged, lit(null)) // rewritten-but-unchanged survivor
          .otherwise(lit("update")))
      .filter(col("op").isNotNull)
      .drop("__old", "__new")
  }
}

object GraftTable {
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  val manifestSchema: StructType = StructType(Seq(
    StructField("file", StringType), StructField("lo", LongType),
    StructField("hi", LongType), StructField("n_rows", LongType)))

  private[table] def rmRecursive(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rmRecursive)
    f.delete(); ()
  }

  /** Range-cluster `df` on `key` and write to `path` — the shared
    * physical-layout primitive (single-manifest q100/q105/q107 policies
    * use it directly; versioned tables via the instance method). */
  def clusteredWrite(df: DataFrame, key: String, nParts: Int, mode: String,
      path: String): Unit =
    df.repartitionByRange(nParts, col(key)).sortWithinPartitions(key)
      .write.mode(mode).parquet(path)

  /** Per-file (file, lo, hi, n_rows) stats over `files`, one
    * distributed partial-agg scan of exactly those files. The key must
    * be INTEGRAL: lo/hi are stored as long (the manifestSchema type),
    * and a lossy cast — a timestamp truncating to epoch seconds, a
    * double flooring — would make the boxes non-conservative, silently
    * skipping files that hold matching rows. Rejected loudly instead. */
  def fileStats(spark: SparkSession, files: Seq[String],
      key: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val df = spark.read.parquet(files: _*)
    val dt = df.schema(key).dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
      dt == LongType,
      s"manifest stats require an integral key column (lo/hi are stored " +
        s"as long; a lossy cast would make skipping non-conservative); " +
        s"got $dt for '$key'")
    df.groupBy(col("_metadata.file_path").as("file"))
      .agg(min(key).cast("long").as("lo"), max(key).cast("long").as("hi"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-file stats over SEVERAL columns:
    * (file, n_rows, lo_<c1>, hi_<c1>, lo_<c2>, hi_<c2>, ...). A
    * multi-column manifest prunes on ANY of the recorded columns —
    * pair it with a z-order layout (q81) so the per-file boxes are
    * tight in every recorded dimension, not just the sort key's. */
  def fileStatsMulti(spark: SparkSession, files: Seq[String],
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val df = spark.read.parquet(files: _*)
    keys.foreach { k => // same contract as fileStats, enforced at build
      val dt = df.schema(k).dataType
      require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
        s"multi-column manifest stats require integral columns; got $dt for '$k'")
    }
    val aggs = keys.flatMap(k =>
      Seq(min(k).cast("long").as(s"lo_$k"), max(k).cast("long").as(s"hi_$k")))
    df.groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Multi-column min/max skipping: keep the files whose box intersects
    * EVERY queried column's range (a file can be skipped if ANY
    * dimension rules it out). Same O(#files) driver-side planning as
    * the single-column prune. */
  def pruneManifestMulti(spark: SparkSession, manPath: String,
      preds: Seq[(String, Long, Long)]): (Seq[String], Int) = {
    val rows = spark.read.parquet(manPath).collect()
    val kept = rows.filter { r =>
      preds.forall { case (c, qlo, qhi) =>
        r.getAs[Number](s"hi_$c").longValue >= qlo &&
          r.getAs[Number](s"lo_$c").longValue <= qhi
      }
    }.map(_.getAs[String]("file")).toSeq
    (kept, rows.length)
  }

  /** Data files in a layout dir (names only, no data read). */
  def partFiles(dir: String): Set[String] = {
    val fs = new java.io.File(dir).listFiles()
    (if (fs == null) Array.empty[java.io.File] else fs)
      .filter(_.getName.startsWith("part-")).map(_.getName).toSet
  }

  /** Min/max skipping over an arbitrary manifest path: the file list
    * whose [lo, hi] box intersects [qlo, qhi], plus the total file
    * count. O(#files) rows on the driver — this IS the planning step,
    * not a data collect. */
  def pruneManifest(spark: SparkSession, manPath: String,
      qlo: Long, qhi: Long): (Seq[String], Int) = {
    val rows = spark.read.parquet(manPath).collect()
    val kept = rows.filter { r =>
      r.getAs[Number]("hi").longValue >= qlo &&
        r.getAs[Number]("lo").longValue <= qhi
    }.map(_.getAs[String]("file")).toSeq
    (kept, rows.length)
  }

  /** Metadata-only split: a file whose box lies fully inside [qlo, qhi]
    * is answered from its n_rows stat without being read; only boundary
    * files are scanned. Returns (rows answered from stats, boundary
    * files to scan, #covered files). */
  def statsOnlySplit(spark: SparkSession, manPath: String,
      qlo: Long, qhi: Long): (Long, Seq[String], Int) = {
    val rows = spark.read.parquet(manPath).collect()
    val (covered, boundary) = rows
      .filter { r => // intersecting files only
        r.getAs[Number]("hi").longValue >= qlo &&
          r.getAs[Number]("lo").longValue <= qhi
      }
      .partition { r => // fully inside: stats answer, no read
        r.getAs[Number]("lo").longValue >= qlo &&
          r.getAs[Number]("hi").longValue <= qhi
      }
    (covered.map(_.getAs[Number]("n_rows").longValue).sum,
      boundary.map(_.getAs[String]("file")).toSeq, covered.length)
  }

  // ---- merge-on-read deletion vectors ------------------------------
  // The complement of COW for scattered deletes: no data bytes are
  // written — (file, row-position) pairs append to a DV side table
  // (the Iceberg v2 position-delete shape; positions come from
  // parquet's `_metadata.row_index`, stable as long as the file is).

  val dvSchema: StructType = StructType(Seq(
    StructField("file", StringType), StructField("pos", LongType)))

  def dvInit(spark: SparkSession, dv: String): Unit =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), dvSchema)
      .write.mode("overwrite").parquet(dv)

  /** DELETE WHERE pred as position deletes — no data file is touched. */
  def dvDelete(spark: SparkSession, data: String, dv: String,
      pred: Column): Unit =
    spark.read.parquet(data)
      .filter(pred)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"))
      .write.mode("append").parquet(dv)

  /** MoR scan: live rows = data ANTI JOIN dv ON (file, pos) — but the
    * anti join runs over ONLY the files the DV table actually names;
    * DV-free files (at 100 TB, the overwhelming majority after a
    * targeted delete) stream straight from the scan with no join work
    * at all. The DV side is O(#deletes), unhinted — AQE broadcasts it
    * while it is small. */
  def dvRead(spark: SparkSession, data: String, dv: String): DataFrame = {
    val dvDf = spark.read.parquet(dv)
    // O(#files-with-deletes) driver list — planning, like manifest reads
    val dirty = dvDf.select("file").distinct().collect()
      .map(_.getString(0)).toSeq
    val all = spark.read.parquet(data)
    if (dirty.isEmpty) all
    else {
      val clean = all.filter(!col("_metadata.file_path").isin(dirty: _*))
      val scrubbed = spark.read.parquet(dirty: _*)
        .withColumn("file", col("_metadata.file_path"))
        .withColumn("pos", col("_metadata.row_index"))
        .join(dvDf, Seq("file", "pos"), "left_anti")
        .drop("file", "pos")
      clean.unionByName(scrubbed)
    }
  }

  /** Apply accumulated DVs: rewrite ONLY the files the DV table names
    * (survivors re-clustered on `key`), then clear the DVs — deletes
    * are batched into one rewrite instead of one rewrite per delete. */
  def dvCompact(spark: SparkSession, data: String, dv: String,
      key: String): Unit = {
    val dvDf = spark.read.parquet(dv)
    val impacted = dvDf.select("file").distinct().collect()
      .map(_.getString(0)).toSeq
    if (impacted.nonEmpty) {
      val before = partFiles(data)
      clusteredWrite(
        spark.read.parquet(impacted: _*)
          .withColumn("file", col("_metadata.file_path"))
          .withColumn("pos", col("_metadata.row_index"))
          .join(dvDf, Seq("file", "pos"), "left_anti")
          .drop("file", "pos"),
        key, 2, "append", data)
      require(partFiles(data) != before, "compaction wrote no survivors")
      impacted.foreach { p =>
        val f = new java.io.File(new java.net.URI(p).getPath)
        require(f.delete(), s"could not remove compacted file $f")
      }
      dvInit(spark, dv) // reset to the declared-empty DV table
    }
  }
}
