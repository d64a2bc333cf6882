package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode,
  LocalRelation, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType,
  ShortType, StructField, StructType}

/** Catalyst-integrated manifest pruning for `graft_snapshot` reads.
  *
  * [[SnapshotSql]] resolves a `graft_snapshot('<man>', v)` call to this
  * LEAF node instead of a plain parquet relation, so the snapshot's
  * manifest — its per-file key boxes, row counts and sizes — stays
  * visible to the optimizer:
  *
  *  - [[SnapshotPruneRule]] (operator-optimization batch) turns the
  *    pushed-down `WHERE` conjuncts on the table key / declared stats
  *    columns into manifest box pruning, exactly what a programmatic
  *    caller gets from [[GraftTable.pruneMulti]] — but automatic, for
  *    any SQL text. Pruning is pure driver-side interval math over the
  *    manifest rows the node already carries (collected ONCE at
  *    analysis — O(#files), like every manifest-planning step); no
  *    filesystem or Spark job runs inside the optimizer loop.
  *  - [[computeStats]] answers from the manifest (sum of the surviving
  *    files' `bytes` / `n_rows`), so join planning sees the PRUNED
  *    size: a narrow time-travel slice of a 100 TB table broadcasts
  *    without a hint, because the stats already reflect the files the
  *    scan will actually read.
  *  - [[SnapshotExpandRule]] (pre-CBO, i.e. after all pushdown has
  *    settled) replaces the leaf with a native parquet relation over
  *    only the surviving files — from there Spark's own
  *    FileSourceStrategy applies column pruning, parquet filter
  *    pushdown and whole-stage codegen; this layer adds file-level
  *    skipping ABOVE row-group-level skipping, never replacing it.
  *
  * Extraction is deliberately conservative: only conjuncts of the form
  * `col (= | < | <= | > | >=) integral-literal` (either side), `col IN
  * (literals...)`, and integral up-casts of `col` narrow a bound;
  * anything else — OR trees, expressions over the column, non-integral
  * casts — contributes nothing and the file is kept. The residual
  * Filter always stays on top, so pruning can only ever remove files
  * whose box proves they hold no qualifying rows (boxes with NULL
  * bounds prune nothing, same contract as [[GraftTable.boxIntersects]]).
  */
final case class GraftSnapshotRelation(
    man: String,
    version: Int,
    key: Option[String],
    statsCols: Seq[String],
    bloomCols: Seq[String],
    entries: Seq[Row],     // full manifest rows for this version
    kept: Seq[String],     // current (possibly pruned) file list
    output: Seq[Attribute])
  extends LeafNode with MultiInstanceRelation {

  override def newInstance(): GraftSnapshotRelation =
    copy(output = output.map(_.newInstance()))

  /** Columns box pruning may use: the table key plus declared stats
    * columns, limited to names the scan output actually carries. */
  def prunableCols: Set[String] = {
    val out = output.map(_.name).toSet
    (key.toSeq ++ statsCols).filter(out).toSet
  }

  /** Columns bloom pruning may use (point lookups on columns the layout
    * is NOT clustered by — per-file `bloom_<c>` sketches). */
  def bloomableCols: Set[String] = {
    val out = output.map(_.name).toSet
    bloomCols.filter(out).toSet
  }

  /** Manifest box columns for a prunable data column. */
  def boxColsOf(c: String): (String, String) =
    if (key.contains(c)) ("lo", "hi") else (s"lo_$c", s"hi_$c")

  private def keptEntries: Seq[Row] = {
    val k = kept.toSet
    entries.filter(r => k(r.getAs[String]("file")))
  }

  /** Snapshot stats FROM THE MANIFEST, reflecting the current pruning —
    * no file is listed or stat-ed to plan a join around this scan. */
  override def computeStats(): Statistics = {
    val ks = keptEntries
    val bytes = ks.map(_.getAs[Long]("bytes")).sum
    val rows = ks.map(_.getAs[Long]("n_rows")).sum
    Statistics(sizeInBytes = BigInt(bytes).max(1), rowCount = Some(BigInt(rows)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftSnapshotRelation $man v=$version " +
      s"files=${kept.size}/${entries.size} ${output.take(maxFields).mkString("[", ", ", "]")}"
}

object SnapshotPruning extends PredicateHelper {

  private def integral(dt: DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType

  /** The prunable column a comparison side denotes: a bare attribute or
    * a value-preserving integral up-cast of one (the analyzer inserts
    * `CAST(int_col AS BIGINT)` when comparing against a bigint literal;
    * the cast is injective, so literal bounds transfer to the column). */
  private def colOf(e: Expression, cols: Set[String]): Option[String] = e match {
    case a: AttributeReference if cols(a.name) && integral(a.dataType) =>
      Some(a.name)
    case c: Cast if integral(c.dataType) => c.child match {
      case a: AttributeReference if cols(a.name) && integral(a.dataType) =>
        Some(a.name)
      case _ => None
    }
    case _ => None
  }

  private def litOf(e: Expression): Option[Long] = e match {
    case Literal(v, dt) if integral(dt) && v != null => Some(v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    })
    case _ => None
  }

  /** Fold every recognizable conjunct into per-column [lo, hi] bounds
    * (strict bounds use saturating arithmetic — `x > MAX_LONG` yields
    * an empty interval, pruning every file, which is exact: the
    * residual Filter would reject every row anyway). Unrecognized
    * conjuncts contribute nothing (conservative). */
  def extractBounds(conjuncts: Seq[Expression], cols: Set[String])
      : Map[String, (Long, Long)] = {
    def one(e: Expression): Option[(String, Long, Long)] = e match {
      case EqualTo(l, r) =>
        colOf(l, cols).flatMap(c => litOf(r).map(v => (c, v, v)))
          .orElse(colOf(r, cols).flatMap(c => litOf(l).map(v => (c, v, v))))
      case EqualNullSafe(l, r) =>
        colOf(l, cols).flatMap(c => litOf(r).map(v => (c, v, v)))
          .orElse(colOf(r, cols).flatMap(c => litOf(l).map(v => (c, v, v))))
      case GreaterThanOrEqual(l, r) => // c >= v | v >= c
        colOf(l, cols).flatMap(c => litOf(r).map(v => (c, v, Long.MaxValue)))
          .orElse(colOf(r, cols).flatMap(c =>
            litOf(l).map(v => (c, Long.MinValue, v))))
      case LessThanOrEqual(l, r) => // c <= v | v <= c
        colOf(l, cols).flatMap(c => litOf(r).map(v => (c, Long.MinValue, v)))
          .orElse(colOf(r, cols).flatMap(c =>
            litOf(l).map(v => (c, v, Long.MaxValue))))
      case GreaterThan(l, r) => // c > v | v > c
        colOf(l, cols).flatMap(c => litOf(r).map(v =>
            (c, if (v == Long.MaxValue) Long.MaxValue else v + 1, Long.MaxValue)))
          .orElse(colOf(r, cols).flatMap(c => litOf(l).map(v =>
            (c, Long.MinValue, if (v == Long.MinValue) Long.MinValue else v - 1))))
      case LessThan(l, r) => // c < v | v < c
        colOf(l, cols).flatMap(c => litOf(r).map(v =>
            (c, Long.MinValue, if (v == Long.MinValue) Long.MinValue else v - 1)))
          .orElse(colOf(r, cols).flatMap(c => litOf(l).map(v =>
            (c, if (v == Long.MaxValue) Long.MaxValue else v + 1, Long.MaxValue))))
      case In(v, list) if list.nonEmpty =>
        colOf(v, cols).flatMap { c =>
          val vs = list.map(litOf)
          if (vs.forall(_.isDefined)) {
            val longs = vs.flatten
            Some((c, longs.min, longs.max))
          } else None
        }
      case _ => None
    }
    conjuncts.flatMap(one).foldLeft(Map.empty[String, (Long, Long)]) {
      case (acc, (c, lo, hi)) =>
        val (alo, ahi) = acc.getOrElse(c, (Long.MinValue, Long.MaxValue))
        acc.updated(c, (math.max(alo, lo), math.min(ahi, hi)))
    }
  }

  /** The bloomable column an equality side denotes: the integral shapes
    * [[colOf]] accepts, plus bare string attributes (blooms hash string
    * columns as UTF-8 bytes, so only an un-cast string column probes
    * losslessly). */
  private def bloomColOf(e: Expression, cols: Set[String]): Option[String] =
    e match {
      case a: AttributeReference if cols(a.name) &&
          a.dataType == org.apache.spark.sql.types.StringType => Some(a.name)
      case _ => colOf(e, cols)
    }

  /** A probe value in the representation the build side hashed: Long
    * for integral literals, String for string literals. */
  private def probeOf(e: Expression): Option[Any] = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => Some(s.toString)
    case _ => litOf(e)
  }

  /** Equality/IN conjuncts over bloomable columns, one entry per
    * conjunct: `(column, probe values)` — the file must pass EVERY
    * conjunct, and passes one when ANY of its values might be present
    * (IN-list semantics). Anything not an exact equality shape — ranges,
    * OR trees, expressions over the column, non-literal probes —
    * contributes nothing (bloom answers membership only). */
  def extractProbes(conjuncts: Seq[Expression], cols: Set[String])
      : Seq[(String, Seq[Any])] = {
    def eq(l: Expression, r: Expression): Option[(String, Seq[Any])] =
      bloomColOf(l, cols).flatMap(c => probeOf(r).map(v => (c, Seq(v))))
        .orElse(bloomColOf(r, cols).flatMap(c =>
          probeOf(l).map(v => (c, Seq(v)))))
    conjuncts.flatMap {
      case EqualTo(l, r) => eq(l, r)
      case EqualNullSafe(l, r) => eq(l, r)
      case In(v, list) if list.nonEmpty =>
        bloomColOf(v, cols).flatMap { c =>
          val ps = list.map(probeOf)
          if (ps.forall(_.isDefined)) Some((c, ps.flatten)) else None
        }
      case _ => None
    }
  }

  /** Manifest entries whose per-file boxes intersect every bound AND
    * whose bloom sketches pass every probe conjunct. An interval with
    * lo > hi (unsatisfiable conjunction) keeps nothing; a missing or
    * NULL sketch keeps the file (never skip on absent evidence). The
    * shared row-level core of the TVF leaf's pruning and the
    * data-source [[GraftManifestFileIndex]]. */
  def pruneEntries(entries: Seq[Row], key: Option[String],
      bounds: Map[String, (Long, Long)],
      probes: Seq[(String, Seq[Any])]): Seq[Row] = {
    val tests = bounds.toSeq.map { case (c, (qlo, qhi)) =>
      val (loC, hiC) =
        if (key.contains(c)) ("lo", "hi") else (s"lo_$c", s"hi_$c")
      (loC, hiC, qlo, qhi)
    }
    entries.filter { row =>
      tests.forall { case (loC, hiC, qlo, qhi) =>
        qlo <= qhi && GraftTable.boxIntersects(row, loC, hiC, qlo, qhi)
      } && probes.forall { case (c, vs) =>
        val bytes = row.getAs[Array[Byte]](s"bloom_$c")
        vs.exists(GraftTable.bloomMightContain(bytes, _))
      }
    }
  }

  /** Files of `r` surviving box + bloom pruning. */
  def pruneFiles(r: GraftSnapshotRelation,
      bounds: Map[String, (Long, Long)],
      probes: Seq[(String, Seq[Any])] = Nil): Seq[String] =
    pruneEntries(r.entries, r.key, bounds, probes)
      .map(_.getAs[String]("file"))
}

/** Filter-to-manifest pruning. Runs in the operator-optimization batch
  * (or the experimental "user provided" batch via
  * [[SnapshotSql.register]]), where predicate pushdown has parked the
  * query's conjuncts directly above the leaf. Idempotent — re-pruning
  * with the same bounds reproduces the same kept set, so the fixed
  * point converges. */
object SnapshotPruneRule extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: GraftSnapshotRelation)
        if r.prunableCols.nonEmpty || r.bloomableCols.nonEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = SnapshotPruning.extractBounds(conjuncts, r.prunableCols)
      val probes = SnapshotPruning.extractProbes(conjuncts, r.bloomableCols)
      if (bounds.isEmpty && probes.isEmpty) f
      else {
        val kept2 = SnapshotPruning.pruneFiles(r, bounds, probes)
        if (kept2 == r.kept) f else Filter(cond, r.copy(kept = kept2))
      }
  }
}

/** Final expansion: replace the (possibly pruned) snapshot leaf with a
  * native parquet relation over exactly the surviving files, aliased
  * back onto the leaf's expression ids so every reference above
  * resolves unchanged. Runs pre-CBO — after all pushdown/pruning has
  * settled — so Spark's FileSourceStrategy then owns the scan (column
  * pruning, parquet predicate pushdown, whole-stage codegen). A
  * fully-pruned snapshot becomes a typed empty LocalRelation: zero
  * tasks, zero files opened. */
final case class SnapshotExpandRule(spark: SparkSession)
  extends Rule[LogicalPlan] {

  def expandNow(r: GraftSnapshotRelation): LogicalPlan =
    if (r.kept.isEmpty) LocalRelation(r.output)
    else {
      val schema = StructType(r.output.map(a =>
        StructField(a.name, a.dataType, a.nullable, a.metadata)))
      // schema passed explicitly: no footer re-read at expansion time
      val fresh = spark.read.schema(schema).parquet(r.kept: _*)
        .queryExecution.analyzed
      require(fresh.output.length == r.output.length &&
        fresh.output.zip(r.output).forall { case (n, o) => n.name == o.name },
        s"snapshot expansion schema drift: ${fresh.output} vs ${r.output}")
      val aliases = fresh.output.zip(r.output).map { case (n, o) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
      org.apache.spark.sql.catalyst.plans.logical.Project(aliases, fresh)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: GraftSnapshotRelation => expandNow(r)
  }
}
