package graft.table

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces,
  SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation,
  TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NAME-ADDRESSED graft tables — a DataSource-V2 [[TableCatalog]], so
  * the first thing a SQL user types actually works:
  *
  * {{{
  *   spark.sql.catalog.graft     = graft.table.GraftCatalog
  *   spark.sql.catalog.graft.dir = /warehouse/_graft_catalog
  *
  *   CREATE TABLE graft.db.docs (doc_key STRING, n_chars BIGINT) USING graft
  *     OPTIONS (man '/warehouse/docs/man', data '/warehouse/docs/data',
  *              key 'doc_key')
  *   CREATE TABLE graft.db.docs2 USING graft OPTIONS (man '<existing man>')
  *   SELECT * FROM graft.db.docs WHERE doc_key BETWEEN 'a' AND 'b'
  *   SELECT * FROM graft.db.docs VERSION AS OF 2        -- time travel
  *   SELECT * FROM graft.db.docs TIMESTAMP AS OF '...'
  *   INSERT INTO graft.db.docs SELECT ...               -- OCC append commit
  *   INSERT OVERWRITE graft.db.docs SELECT ...          -- recreate
  * }}}
  *
  * The catalog is a thin NAME → manifest-path registry: one small
  * `<dir>/<namespace>/<table>.tbl` file per table records the manifest
  * dir (everything else — key, stats/bloom declarations, data dir, log
  * store — already lives in the table's own `_table_props`, the
  * manifest being self-describing by design). Dropping a catalog entry
  * deletes NOTHING but the mapping.
  *
  * READS keep the full prunable path: [[GraftV2ExpandRule]] (installed
  * by [[graft.GraftExtensions]] / [[SnapshotSql.register]]) replaces
  * the analyzed [[org.apache.spark.sql.execution.datasources.v2
  * .DataSourceV2Relation]] over a [[GraftV2Table]] with the SAME
  * [[GraftSnapshotRelation]] plan the `graft_snapshot` TVF produces —
  * manifest box/bloom pruning, manifest-backed stats (unhinted
  * broadcasts), zero-footer planning, and the MoR deletion-vector read
  * all included. Without the extensions installed, the table still
  * works through its [[V1Scan]] fallback (correct, but unpruned and
  * rows cross a Row boundary — install the extensions for
  * production reads).
  *
  * WRITES ride [[V1Write]]: INSERT INTO is a multi-writer OCC append
  * commit ([[GraftTable.commitAppendOcc]]); INSERT OVERWRITE
  * re-creates the table — identical semantics to
  * `df.write.format("graft")`.
  *
  * `VERSION AS OF` / `TIMESTAMP AS OF` resolve through the catalog's
  * time-travel `loadTable` overloads to a version-pinned table.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var initDir: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initDir = Option(options.get("dir")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.dir = " +
          "<registry directory> (one small name->manifest mapping file " +
          "per table lives there)"))
  }

  override def name(): String = catalogName

  /** The registry dir, resolved from the LIVE session conf on every
    * call: Spark's CatalogManager caches catalog plugins per name, so
    * a dir captured once at [[initialize]] would make a later
    * `spark.sql.catalog.<name>.dir` change SILENTLY ignored — every
    * read and write keeps hitting the old registry while the user
    * believes they re-pointed it (the r12 bench crash). Falls back to
    * the initialize-time value only when the conf entry is absent
    * (an isolated session whose conf clone dropped it). */
  private def dir: String =
    spark.conf.getOption(s"spark.sql.catalog.$catalogName.dir")
      .getOrElse(initDir)

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(dir).getFileSystem(
    spark.sessionState.newHadoopConf())

  private def nsPath(ns: Array[String]): Path = {
    require(ns.length == 1,
      s"graft catalog namespaces are single-level; got ${ns.mkString(".")}")
    new Path(dir, ns.head)
  }
  private def tblPath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), s"${ident.name()}.tbl")

  private def readSmall(p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      bos.toString("UTF-8")
    } finally in.close()
  }

  /** The manifest dir a registered name maps to — also the resolution
    * hook for name-addressed maintenance TVFs ([[SnapshotSql]] accepts
    * `'catalog.ns.table'` wherever a manifest path is taken). */
  def manifestOf(ident: Identifier): String = {
    val p = tblPath(ident)
    if (!fs.exists(p)) throw new NoSuchTableException(ident)
    readSmall(p).linesIterator
      .collectFirst { case l if l.startsWith("man=") => l.drop(4).trim }
      .getOrElse(throw new IllegalStateException(
        s"catalog entry $p records no manifest path"))
  }
  private def manOf(ident: Identifier): String = manifestOf(ident)

  // ---- TableCatalog ------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val p = nsPath(ns)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(ns)
    GraftTable.listStatusSafe(fs, p)
      .filter(_.getPath.getName.endsWith(".tbl"))
      .map(st => Identifier.of(ns, st.getPath.getName.stripSuffix(".tbl")))
  }

  override def tableExists(ident: Identifier): Boolean =
    try fs.exists(tblPath(ident)) catch { case _: IllegalArgumentException => false }

  override def loadTable(ident: Identifier): Table =
    GraftV2Table(ident.toString, manOf(ident), pinned = None)

  /** `VERSION AS OF <v>` on the named table. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val man = manOf(ident)
    val v = version.trim.toIntOption.getOrElse(
      throw new IllegalArgumentException(
        s"VERSION AS OF takes an integer snapshot version; got '$version'"))
    val t = GraftTable(spark, data = "", man = man, key = "")
    require(t.isCommitted(v),
      s"no committed snapshot v=$v of $ident " +
        s"(committed: ${t.committedVersions.mkString(", ")})")
    GraftV2Table(ident.toString, man, pinned = Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — micros since epoch, Spark's contract. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val man = manOf(ident)
    val t = GraftTable(spark, data = "", man = man, key = "")
    GraftV2Table(ident.toString, man,
      pinned = Some(t.versionAsOfTime(timestampMicros / 1000L)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft tables take no PARTITIONED BY — the physical layout is " +
        "range-clustered on the table key")
    import scala.jdk.CollectionConverters._
    val props = properties.asScala
    def opt(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
        .map(_.trim).filter(_.nonEmpty)
    val man = opt("man").getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE ... USING graft needs OPTIONS (man '<manifest dir>') " +
        "— plus data/key when the manifest does not already exist"))
    val exists = GraftTable.loadProps(spark, man).isDefined &&
      GraftTable(spark, data = "", man = man, key = "")
        .committedVersions.nonEmpty
    // a NEW table's required options are validated BEFORE anything is
    // registered or written, so a malformed CREATE leaves no trace
    val newTable = if (exists) None else {
      val key = opt("key").getOrElse(throw new IllegalArgumentException(
        s"no graft table exists at $man yet — creating one needs " +
          "OPTIONS (key '<cluster/skip column>', data '<data dir>')"))
      val data = opt("data").getOrElse(throw new IllegalArgumentException(
        s"no graft table exists at $man yet — creating one needs " +
          "OPTIONS (data '<data dir>')"))
      def list(k: String) = opt(k).toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
      Some(GraftTable(spark, data, man, key, list("stats"), list("bloom")))
    }
    // name-race arbitration rides fs.create(overwrite = false) — the
    // SAME storage capability the pointer log store gates: on a store
    // without atomic exclusive create two racing CREATEs could both
    // register. One allowSchemes declaration covers both surfaces.
    GraftTable.requireAtomicCreate(spark, fs,
      s"catalog '$catalogName' name registration (.tbl exclusive create)")
    fs.mkdirs(nsPath(ident.namespace()))
    val out = fs.create(tblPath(ident), false) // exclusive: name races lose
    try out.write(s"man=$man\n".getBytes("UTF-8")) finally out.close()
    // physical creation AFTER the name is won: a lost name race leaves
    // no orphaned data/manifest dirs, and a failed physical create
    // takes its registration back out before rethrowing
    newTable.foreach { t =>
      try t.createEmpty(if (schema.isEmpty) None else Some(schema))
      catch { case e: Throwable =>
        fs.delete(tblPath(ident), false); throw e }
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported — graft schema evolution is " +
        "append-time (a widening batch widens the recorded schema)")

  /** Drops the NAME MAPPING only — the table's data and manifest stay
    * untouched (re-register with CREATE TABLE ... OPTIONS (man ...)). */
  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(tblPath(ident), false)

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    fs.mkdirs(nsPath(to.namespace()))
    require(fs.rename(tblPath(from), tblPath(to)),
      s"could not rename catalog entry $from to $to")
  }

  // ---- SupportsNamespaces (single-level) ---------------------------

  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] =
    GraftTable.listStatusSafe(fs, new Path(dir))
      .filter(_.isDirectory).map(st => Array(st.getPath.getName))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Array.empty // single-level: no nested namespaces
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && fs.exists(nsPath(ns))

  override def loadNamespaceMetadata(ns: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(ns)); ()
  }

  override def alterNamespace(ns: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit =
    throw new UnsupportedOperationException("namespace metadata is empty")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    val tables = listTables(ns)
    require(cascade || tables.isEmpty,
      s"namespace ${ns.head} still holds ${tables.length} table " +
        "mapping(s); use CASCADE to drop them (data is never touched)")
    fs.delete(nsPath(ns), true)
  }
}

/** A catalog-loaded graft table, optionally pinned to a snapshot
  * version (`VERSION AS OF` / `TIMESTAMP AS OF`). The fast read path is
  * [[GraftV2ExpandRule]]; [[newScanBuilder]] is the extensions-free
  * fallback. Writes go through [[V1Write]] to the same OCC
  * append / create commits as `df.write.format("graft")`. */
final case class GraftV2Table(ident: String, man: String,
    pinned: Option[Int]) extends Table with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  private def probe: GraftTable =
    GraftTable(spark, data = "", man = man, key = "")

  /** The snapshot this table reads: pinned, else latest at load time. */
  lazy val snapshotVersion: Int = pinned.getOrElse {
    val vs = probe.committedVersions
    require(vs.nonEmpty, s"no committed snapshots under $man")
    vs.max
  }

  override def name(): String =
    ident + pinned.map(v => s"@v$v").getOrElse("")

  override def schema(): StructType =
    probe.versionSchema(snapshotVersion).getOrElse {
      val files = probe.files(snapshotVersion)
      require(files.nonEmpty,
        s"snapshot v=$snapshotVersion of $man references no files, no " +
          "recorded schema")
      spark.read.option("mergeSchema", "true").parquet(files: _*).schema
    }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  // ---- fallback read path (no extensions installed) ----------------

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftFallbackScanBuilder(this)

  // ---- write path ---------------------------------------------------

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      require(pinned.isEmpty,
        s"cannot write to the time-travel pinned snapshot ${name()}")
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ov: Boolean): Unit = {
              val s = data.sparkSession
              val p = GraftTable.loadProps(s, man).getOrElse(
                throw new IllegalStateException(
                  s"$man carries no _table_props — not a graft table"))
              val key = p.key.getOrElse(throw new IllegalStateException(
                s"$man's _table_props records no key"))
              val dataDir = p.data.getOrElse(
                throw new IllegalStateException(
                  s"$man's _table_props records no data dir"))
              val t = GraftTable(s, dataDir, man, key, p.statsCols,
                p.bloomCols, p.bloomItems, p.bloomFpp)
              if (overwrite || ov) t.create(data, 8)
              else { t.commitAppendOcc(data, 8); () }
            }
          }
      }
    }
}

/** Extensions-free fallback scan: correct but unpruned, and the rows
  * cross a DataFrame→Row boundary — [[GraftV2ExpandRule]] is the
  * production path. */
final class GraftFallbackScanBuilder(table: GraftV2Table)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema()
  private var filters: Array[Filter] = Array.empty

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all filters remain Spark's responsibility (pruning is a bonus)
  }
  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        ctx: SQLContext): T = {
      val spark = ctx.sparkSession
      // self-contained: expand the snapshot leaf here rather than
      // relying on the session's (possibly absent) extension rules
      val plan = SnapshotSql.snapshotPlan(spark, table.man, table.snapshotVersion)
        match {
          case r: GraftSnapshotRelation => SnapshotExpandRule(spark).expandNow(r)
          case p => p // the MoR read is already a full plan
        }
      val df = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
      // the relation must report EXACTLY the pruned schema the v2 scan
      // promised (a count(*) prunes to ZERO columns — project to an
      // empty row, not the full schema)
      val need = required
      val projected = df.select(need.fieldNames.toIndexedSeq
        .map(org.apache.spark.sql.functions.col): _*)
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = need
        override def buildScan(): org.apache.spark.rdd.RDD[
          org.apache.spark.sql.Row] = projected.rdd
      }.asInstanceOf[T]
    }
  }
}

/** The production read path for catalog tables: replace the analyzed
  * DataSourceV2Relation over a [[GraftV2Table]] with the SAME
  * [[GraftSnapshotRelation]] plan the `graft_snapshot` TVF builds —
  * manifest pruning, manifest-backed stats and the MoR read all apply,
  * and the attributes are aliased onto the v2 relation's expression
  * ids so every reference above resolves unchanged. Write commands
  * keep their v2 relation (the V1Write path needs it). */
final case class GraftV2ExpandRule(spark: SparkSession)
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project,
    V2WriteCommand}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  private def expand(r: DataSourceV2Relation, t: GraftV2Table)
      : LogicalPlan = {
    val plan = SnapshotSql.snapshotPlan(spark, t.man, t.snapshotVersion)
    require(plan.output.length == r.output.length &&
      plan.output.zip(r.output).forall { case (n, o) => n.name == o.name },
      s"catalog expansion schema drift: ${plan.output} vs ${r.output}")
    Project(plan.output.zip(r.output).map { case (n, o) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, plan)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    def rewrite(p: LogicalPlan): LogicalPlan = p match {
      case w: V2WriteCommand =>
        // the write TARGET stays a v2 relation; only the query rewrites
        val q2 = rewrite(w.query)
        if (q2 eq w.query) w else w.withNewQuery(q2)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftV2Table => expand(r, t)
        case _ => r
      }
      case other =>
        val kids = other.children.map(rewrite)
        if (kids.zip(other.children).forall { case (a, b) => a eq b }) other
        else other.withNewChildren(kids)
    }
    rewrite(plan)
  }
}
