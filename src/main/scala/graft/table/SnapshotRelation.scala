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
  * Extraction is deliberately conservative — see [[SnapshotPruning]]:
  * comparisons/IN/LIKE-prefix over the table key, declared stats
  * columns (integral, timestamp, date or string) and bloom columns
  * prune, composed through arbitrary AND/OR trees; anything
  * unrecognized keeps files. The residual Filter always stays on top,
  * so pruning can only ever remove files whose box/sketch proves they
  * hold no qualifying rows (NULL boxes prune nothing, same contract as
  * [[GraftTable.boxIntersects]]).
  */
final case class GraftSnapshotRelation(
    man: String,
    version: Int,
    key: Option[String],
    statsCols: Seq[String],
    bloomCols: Seq[String],
    entries: Seq[Row],     // full manifest rows for this version
    kept: Seq[String],     // current (possibly pruned) file list
    output: Seq[Attribute],
    // logical->physical column mapping at `version` (RENAME COLUMN):
    // files store the frozen physical names; `output` speaks logical
    colmap: Map[String, String] = Map.empty)
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

/** Conservative compilation of pushed-down predicates into per-manifest-
  * entry keep tests. The shape is a recursive evaluator over the
  * expression tree (not a per-column bounds fold), so DISJUNCTIONS
  * prune: `k BETWEEN a AND b OR k BETWEEN c AND d` keeps a file iff it
  * intersects EITHER range — the common time-travel slice-union that a
  * conjunct-only fold had to keep everything for. Per node:
  *
  *  - And: recognized children AND together; an unrecognized child
  *    contributes nothing (its sibling still prunes).
  *  - Or: prunes only when BOTH disjuncts are recognized (an
  *    unrecognized disjunct could match anything, so the whole Or must
  *    keep everything — `None`).
  *  - Comparisons/IN over the table key / declared stats columns → box
  *    intersection tests; equality/IN over declared bloom columns ALSO
  *    probe the per-file sketch. IN tests per VALUE (sharper than the
  *    [min,max] envelope: `IN (1, 10^9)` skips a [500,600] file).
  *  - `StartsWith` (what LIKE 'p%' simplifies to) over a string column
  *    → the [p, p⁺) prefix box, the natural point lookup on a
  *    string-keyed corpus table.
  *  - Everything else (Not, expressions over the column, non-literal
  *    sides, type mismatches) → None: keep, never guess.
  *
  * Bounds are carried in the manifest's box representation — Long for
  * integral/timestamp/date columns (Catalyst's internal timestamp
  * micros / date days ARE the box encoding, so literals transfer
  * directly), String (UTF-8 order) for string columns. Strict bounds on
  * longs use exact ±1 saturating arithmetic; on strings they relax to
  * inclusive (conservative). Comparisons inside the optimizer use the
  * lenient [[GraftTable.boxCmpOpt]] — a box/bound type mismatch keeps
  * the file rather than failing the query. */
object SnapshotPruning extends PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, In, Or, StartsWith}
  import org.apache.spark.sql.types.{DateType, StringType, TimestampType}
  import org.apache.spark.unsafe.types.UTF8String

  type EntryTest = Row => Boolean

  private def integral(dt: DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType

  private def fractional(dt: DataType): Boolean =
    dt == org.apache.spark.sql.types.FloatType ||
      dt == org.apache.spark.sql.types.DoubleType

  private def supported(dt: DataType): Boolean =
    integral(dt) || dt == StringType || dt == TimestampType ||
      dt == DateType || fractional(dt)

  /** The column a comparison side denotes: a bare attribute of a
    * supported type, or a value-preserving up-cast of one (the
    * analyzer inserts `CAST(int_col AS BIGINT)` against bigint
    * literals and `CAST(float_col AS DOUBLE)` against double literals;
    * both casts are injective and order-preserving, so bounds
    * transfer). Decimal columns are deliberately ABSENT: their box
    * values are lossy doubles and a literal's double rounding could
    * narrow a bound, so the rule conservatively keeps decimal files
    * (the programmatic pruneMulti path takes pre-widened double
    * bounds instead). */
  private def colOf(e: Expression, cols: Set[String])
      : Option[(String, DataType)] = e match {
    case a: AttributeReference if cols(a.name) && supported(a.dataType) =>
      Some((a.name, a.dataType))
    case c: Cast if integral(c.dataType) => c.child match {
      case a: AttributeReference if cols(a.name) && integral(a.dataType) =>
        Some((a.name, a.dataType))
      case _ => None
    }
    case c: Cast if c.dataType == org.apache.spark.sql.types.DoubleType =>
      c.child match {
        case a: AttributeReference if cols(a.name) && fractional(a.dataType) =>
          Some((a.name, a.dataType))
        case _ => None
      }
    case _ => None
  }

  /** A literal in the column's box representation: Long for integral
    * (and for timestamp/date, whose Catalyst internal values are
    * already micros/days), String for string columns. None for NULL,
    * non-literals, or a type that doesn't match the column's. */
  private def litRepr(e: Expression, colDt: DataType): Option[Any] = e match {
    case Literal(null, _) => None
    case Literal(v, dt) =>
      if (integral(colDt) && integral(dt)) Some(v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
      })
      else if (colDt == StringType && dt == StringType) Some(v.toString)
      else if (colDt == TimestampType && dt == TimestampType)
        Some(v.asInstanceOf[Long]) // internal = micros, the box encoding
      else if (colDt == DateType && dt == DateType)
        Some(v.asInstanceOf[Int].toLong) // internal = days
      else if (fractional(colDt) && fractional(dt)) Some(v match {
        case f: Float => f.toDouble // lossless widening — the box space
        case d: Double => d
      })
      else None
    case _ => None
  }

  /** Strict-bound adjustment: exact ±1 on longs (saturating — an empty
    * interval then prunes everything, which is exact: the residual
    * Filter rejects every row anyway); inclusive relaxation on
    * strings (conservative). */
  private def strictLo(v: Any): Any = v match {
    case l: java.lang.Long =>
      if (l == Long.MaxValue) l else java.lang.Long.valueOf(l + 1L)
    case d: java.lang.Double => // c > v ⇔ c >= nextUp(v): exact on IEEE
      java.lang.Double.valueOf(Math.nextUp(d.doubleValue))
    case other => other
  }
  private def strictHi(v: Any): Any = v match {
    case l: java.lang.Long =>
      if (l == Long.MinValue) l else java.lang.Long.valueOf(l - 1L)
    case d: java.lang.Double =>
      java.lang.Double.valueOf(Math.nextDown(d.doubleValue))
    case other => other
  }

  /** Box-intersection test for one column against [lo, hi] (None =
    * unbounded side). NULL boxes and type mismatches keep the file. */
  private def boxTest(key: Option[String], c: String,
      lo: Option[Any], hi: Option[Any]): EntryTest = {
    val (loC, hiC) =
      if (key.contains(c)) ("lo", "hi") else (s"lo_$c", s"hi_$c")
    row => {
      val rLo = row.getAs[Any](loC); val rHi = row.getAs[Any](hiC)
      // unsatisfiable interval (lo > hi): keep nothing
      val satisfiable = (lo, hi) match {
        case (Some(a), Some(b)) => GraftTable.boxCmpOpt(a, b).forall(_ <= 0)
        case _ => true
      }
      satisfiable && (rLo == null || rHi == null || (
        lo.forall(q => GraftTable.boxCmpOpt(rHi, q).forall(_ >= 0)) &&
        hi.forall(q => GraftTable.boxCmpOpt(rLo, q).forall(_ <= 0))))
    }
  }

  /** NULL-census tests (the Iceberg nullCount idea): `nulls_<c>` holds
    * a file's WRITE-TIME null count for a declared stats column.
    * `c IS NULL` keeps a file iff its census says nulls exist (an
    * absent or NULL census keeps — old manifests stay readable,
    * conservatively). `c IS NOT NULL` skips only an ALL-null file —
    * the file whose NULL min/max box could never rule anything out —
    * and only when the entry carries no deletion vector: `n_rows`
    * mutates to the LIVE count under MoR masking while the census
    * stays write-time, so the all-null equality is only sound on an
    * unmasked entry. Catalyst pushes IsNotNull alongside every
    * comparison, so this closes exactly the all-null-file gap box
    * pruning has. */
  private def nullsOf(row: Row, c: String): Option[Long] = {
    val i = row.schema.fieldNames.indexOf(s"nulls_$c")
    if (i < 0 || row.isNullAt(i)) None else Some(row.getLong(i))
  }
  private def entryHasDv(row: Row): Boolean =
    GraftTable.entryDvOf(row).isDefined
  private def isNullKeep(c: String): EntryTest =
    row => nullsOf(row, c).forall(_ > 0L)
  private def isNotNullKeep(c: String): EntryTest =
    row => nullsOf(row, c) match {
      case Some(n) if !entryHasDv(row) => n < row.getAs[Long]("n_rows")
      case _ => true
    }

  /** Point test for an equality/IN value: box intersection AND (when
    * the column carries a per-file sketch) the bloom probe — a missing
    * or NULL sketch keeps the file (never skip on absent evidence). */
  private def pointTest(key: Option[String], prunable: Set[String],
      bloomable: Set[String], c: String, v: Any): Option[EntryTest] = {
    val box: Option[EntryTest] =
      if (prunable(c)) Some(boxTest(key, c, Some(v), Some(v))) else None
    val bloom: Option[EntryTest] =
      if (bloomable(c)) Some { row =>
        GraftTable.bloomMightContain(row.getAs[Array[Byte]](s"bloom_$c"), v)
      } else None
    (box, bloom) match {
      case (Some(a), Some(b)) => Some(row => a(row) && b(row))
      case (a, b) => a.orElse(b)
    }
  }

  /** Compile one predicate into a conservative keep test; None when
    * nothing in it is recognizable (the caller keeps everything). */
  def compile(e: Expression, key: Option[String], prunable: Set[String],
      bloomable: Set[String]): Option[EntryTest] = {
    def rec(e: Expression): Option[EntryTest] = e match {
      case And(l, r) => (rec(l), rec(r)) match {
        case (Some(a), Some(b)) => Some(row => a(row) && b(row))
        case (a, b) => a.orElse(b)
      }
      case Or(l, r) =>
        for { a <- rec(l); b <- rec(r) } yield
          (row => a(row) || b(row)): EntryTest
      case EqualTo(l, r) => eq(l, r).orElse(eq(r, l))
      case EqualNullSafe(l, r) => eq(l, r).orElse(eq(r, l))
      case GreaterThanOrEqual(l, r) => // c >= v | v >= c
        cmp(l, r, v => (Some(v), None)).orElse(cmp(r, l, v => (None, Some(v))))
      case LessThanOrEqual(l, r) => // c <= v | v <= c
        cmp(l, r, v => (None, Some(v))).orElse(cmp(r, l, v => (Some(v), None)))
      case GreaterThan(l, r) => // c > v | v > c
        cmp(l, r, v => (Some(strictLo(v)), None))
          .orElse(cmp(r, l, v => (None, Some(strictHi(v)))))
      case LessThan(l, r) => // c < v | v < c
        cmp(l, r, v => (None, Some(strictHi(v))))
          .orElse(cmp(r, l, v => (Some(strictLo(v)), None)))
      case In(v, list) if list.nonEmpty =>
        colOf(v, prunable ++ bloomable).flatMap { case (c, dt) =>
          val reprs = list.map(litRepr(_, dt))
          if (!reprs.forall(_.isDefined)) None
          else {
            val tests = reprs.flatten.flatMap(
              pointTest(key, prunable, bloomable, c, _))
            if (tests.isEmpty) None
            else Some(row => tests.exists(_(row)))
          }
        }
      case StartsWith(l, Literal(p: UTF8String, StringType)) =>
        colOf(l, prunable).collect { case (c, StringType) =>
          val prefix = p.toString
          boxTest(key, c, Some(prefix),
            Option(GraftTable.incrementCodePoints(prefix)))
        }
      case org.apache.spark.sql.catalyst.expressions.IsNull(a) =>
        colOf(a, prunable).map { case (c, _) => isNullKeep(c) }
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(a) =>
        colOf(a, prunable).map { case (c, _) => isNotNullKeep(c) }
      case _ => None
    }
    def eq(colSide: Expression, litSide: Expression): Option[EntryTest] =
      colOf(colSide, prunable ++ bloomable).flatMap { case (c, dt) =>
        litRepr(litSide, dt).flatMap(
          pointTest(key, prunable, bloomable, c, _))
      }
    def cmp(colSide: Expression, litSide: Expression,
        mk: Any => (Option[Any], Option[Any])): Option[EntryTest] =
      colOf(colSide, prunable).flatMap { case (c, dt) =>
        litRepr(litSide, dt).map { v =>
          val (lo, hi) = mk(v)
          boxTest(key, c, lo, hi)
        }
      }
    rec(e)
  }

  /** Compile a conjunction; None when no conjunct is recognizable. */
  def keepTest(conjuncts: Seq[Expression], key: Option[String],
      prunable: Set[String], bloomable: Set[String]): Option[EntryTest] = {
    val ts = conjuncts.flatMap(compile(_, key, prunable, bloomable))
    if (ts.isEmpty) None else Some(row => ts.forall(_(row)))
  }

  /** A v1-filter value in box representation: Long for integral /
    * timestamp / date values (epoch micros / days — the manifest box
    * encoding), String for strings, Double for float/double. None for
    * anything else (NULL, decimals, binaries) — the caller keeps. v1
    * filter values are EXTERNAL types (java.sql.Timestamp /
    * java.time.Instant, java.sql.Date / LocalDate), unlike Catalyst
    * literals, so the conversion goes through DateTimeUtils. */
  private def v1BoxRepr(v: Any): Option[Any] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    v match {
      case null => None
      case b: Byte => Some(b.toLong)
      case s: Short => Some(s.toLong)
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: String => Some(s)
      case ts: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(ts))
      case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
      case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toLong)
      case d: java.time.LocalDate =>
        Some(DateTimeUtils.localDateToDays(d).toLong)
      case f: Float => Some(f.toDouble)
      case d: Double => Some(d)
      case _ => None
    }
  }

  /** [[keepTest]] over v1 [[org.apache.spark.sql.sources.Filter]]s —
    * the pruning face of the SQL row-level DELETE ([[GraftTable
    * .commitDelete]]), compiling the SAME conservative algebra as the
    * Catalyst path: comparisons/IN prune on box intersection (equality
    * and IN also bloom-probe), LIKE-'p%' prunes on the prefix box,
    * AND composes partially, OR only when both sides are recognized,
    * anything else keeps. The column's data type is unknown here (v1
    * filters carry only names) — the value's external type implies it,
    * and a residual mismatch is conservatively kept by boxCmpOpt. */
  def keepTestV1(filters: Seq[org.apache.spark.sql.sources.Filter],
      key: Option[String], prunable: Set[String], bloomable: Set[String])
      : Option[EntryTest] = {
    import org.apache.spark.sql.{sources => s}
    def point(c: String, v: Any): Option[EntryTest] =
      if (!prunable(c) && !bloomable(c)) None
      else v1BoxRepr(v).flatMap(pointTest(key, prunable, bloomable, c, _))
    def range(c: String, v: Any, mk: Any => (Option[Any], Option[Any]))
        : Option[EntryTest] =
      if (!prunable(c)) None
      else v1BoxRepr(v).map { b =>
        val (lo, hi) = mk(b)
        boxTest(key, c, lo, hi)
      }
    def rec(f: s.Filter): Option[EntryTest] = f match {
      case s.And(l, r) => (rec(l), rec(r)) match {
        case (Some(a), Some(b)) => Some(row => a(row) && b(row))
        case (a, b) => a.orElse(b)
      }
      case s.Or(l, r) =>
        for { a <- rec(l); b <- rec(r) } yield
          (row => a(row) || b(row)): EntryTest
      case s.EqualTo(c, v) => point(c, v)
      case s.EqualNullSafe(c, v) if v != null => point(c, v)
      case s.GreaterThanOrEqual(c, v) => range(c, v, b => (Some(b), None))
      case s.LessThanOrEqual(c, v) => range(c, v, b => (None, Some(b)))
      case s.GreaterThan(c, v) => range(c, v, b => (Some(strictLo(b)), None))
      case s.LessThan(c, v) => range(c, v, b => (None, Some(strictHi(b))))
      case s.In(c, vs) if vs.nonEmpty =>
        val tests = vs.toSeq.map(point(c, _))
        if (!tests.forall(_.isDefined)) None
        else Some(row => tests.flatten.exists(_(row)))
      case s.StringStartsWith(c, p) if prunable(c) =>
        Some(boxTest(key, c, Some(p),
          Option(GraftTable.incrementCodePoints(p))))
      case s.IsNull(c) if prunable(c) => Some(isNullKeep(c))
      case s.IsNotNull(c) if prunable(c) => Some(isNotNullKeep(c))
      case _ => None // Not/unknowns: keep, never guess
    }
    val ts = filters.flatMap(rec)
    if (ts.isEmpty) None else Some(row => ts.forall(_(row)))
  }
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
      SnapshotPruning.keepTest(splitConjunctivePredicates(cond), r.key,
        r.prunableCols, r.bloomableCols) match {
        case None => f
        case Some(test) =>
          val kept2 = r.entries.filter(test).map(_.getAs[String]("file"))
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
      // the parquet scan reads the frozen PHYSICAL names (column
      // mapping); the position-aligned aliases below re-label each
      // physical attribute onto its LOGICAL output name and exprId, so
      // a RENAME COLUMN costs exactly this projection
      val schema = StructType(r.output.map(a =>
        StructField(r.colmap.getOrElse(a.name, a.name), a.dataType,
          a.nullable, a.metadata)))
      // schema passed explicitly: no footer re-read at expansion time
      val fresh = spark.read.schema(schema).parquet(r.kept: _*)
        .queryExecution.analyzed
      require(fresh.output.length == r.output.length &&
        fresh.output.zip(r.output).forall { case (n, o) =>
          n.name == r.colmap.getOrElse(o.name, o.name) },
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
