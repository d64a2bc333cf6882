package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Registry of the driver-generated test tables (`/root/testdata/sf*`,
  * schemas verified against the parquet footers — see FIXTURES.md).
  *
  * Every load uses an explicit schema: inference is off for determinism
  * against the DuckDB oracle, and an explicit `ReadSchema` keeps column
  * pruning exact on wide scans. At 100 TB these reads go through the
  * caching Hadoop FileSystem layer (graft.fs) exactly like any other
  * `FileSystem`-backed path, so nothing here is local-mode-specific.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** The generator has emitted `events.ts` as both INT64 TIMESTAMP(NANOS)
    * and TIMESTAMP(MICROS) across regenerations, so the decode is chosen
    * per file from the parquet footer, never hardcoded:
    *   - MICROS (or any non-NANOS annotation): plain TimestampType read,
    *     exactly like `orders.o_orderdate`.
    *   - NANOS: Spark 4 refuses to read nanos as TimestampType, so read
    *     the raw long and truncate to micros (identical to DuckDB's
    *     ns->micros truncation).
    * The unit is sniffed from one footer and memoized per path — O(1)
    * driver-side work, independent of table size. */
  private[graft] val eventsRaw: StructType = StructType(
    events.fields.map(f =>
      if (f.name == "ts") StructField("ts", LongType) else f))

  /** One entry per queried path: (sniffed file, its mtime, its length,
    * result). A cache hit revalidates with ONE getFileStatus of the
    * remembered file — O(1) regardless of directory size — and an
    * in-place regeneration (different stamp) re-sniffs and REPLACES the
    * entry, so the cache stays bounded and can never replay a stale
    * unit (the exact silent-wrong-decode failure this exists to
    * prevent). */
  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long, Long, Boolean)]()

  /** True iff the parquet footer annotates `ts` as TIMESTAMP(NANOS).
    * Shared by the batch loader and the streaming file source
    * (GraftStreams.eventsStream) so both decode identically.
    *
    * An empty directory (a watch dir before any file lands) sniffs as
    * non-nanos — the plain TimestampType schema, matching what every
    * Spark-written file will carry. Sniffing looks one level into
    * non-hidden subdirectories (partitioned layouts). The unit is a
    * PER-DIRECTORY contract: one sniffed file speaks for the dir, and a
    * stream locks the decode at open — a directory mixing units is
    * unsupported (stage homogeneous dirs, as the specs do). */
  private[graft] def eventsTsIsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)

    val cached = tsNanosCache.get(path)
    if (cached != null) {
      val (f, mtime, len, result) = cached
      try {
        val st = fs.getFileStatus(new Path(f))
        if (st.getModificationTime == mtime && st.getLen == len) return result
      } catch { case _: java.io.FileNotFoundException => () } // re-sniff
    }

    // `depth` = remaining directory levels we may list; statuses come
    // from the parent's listStatus, so no per-entry getFileStatus round
    // trips (they are real RPCs on object stores)
    def findParquet(st: FileStatus, depth: Int): Option[FileStatus] =
      if (st.isFile) Some(st)
      else if (depth == 0) None
      else {
        val kids = fs.listStatus(st.getPath)
          .filterNot(_.getPath.getName.startsWith("_"))
        kids.find(k => k.isFile && k.getPath.getName.endsWith(".parquet"))
          .orElse(kids.filter(_.isDirectory).iterator
            .flatMap(d => findParquet(d, depth - 1)).nextOption())
      }

    findParquet(fs.getFileStatus(new Path(path)), depth = 2) match {
      case None => false // empty dir: plain TimestampType, like Spark writes
      case Some(st) =>
        val reader =
          ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        val nanos =
          try {
            val schema = reader.getFooter.getFileMetaData.getSchema
            schema.getType(schema.getFieldIndex("ts"))
              .asPrimitiveType().getLogicalTypeAnnotation match {
              case t: TimestampLogicalTypeAnnotation => t.getUnit == TimeUnit.NANOS
              case _ => false
            }
          } finally reader.close()
        tsNanosCache.put(path,
          (st.getPath.toString, st.getModificationTime, st.getLen, nanos))
        nanos
    }
  }

  /** Load one table from an sf directory with its explicit schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events" && eventsTsIsNanos(spark, path))
      spark.read.schema(eventsRaw).parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
        .select(events.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    else spark.read.schema(schemas(name)).parquet(path)
  }

  /** Register every table as a temp view (for the spark.sql query paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    schemas.keys.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
