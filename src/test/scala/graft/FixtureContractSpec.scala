package graft

import org.apache.spark.sql.functions._

/** Canary for the driver-generated fixtures: the test-data generator has
  * regenerated `/root/testdata` mid-build before (round 8 flipped
  * `events.ts` from parquet NANOS to MICROS), and every Spark-vs-Spark
  * spec is self-consistent under a wrong decode — so these assertions pin
  * the PHYSICAL contract the whole query surface assumes. If a
  * regeneration changes an encoding again, this suite fails loudly
  * instead of 14 oracle queries failing silently.
  */
class FixtureContractSpec extends TestBase {

  test("decoded events.ts lands in a sane era and spans more than one day") {
    val r = Tables.load(spark, sfDir, "events")
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .selectExpr(
        "year(lo) as ylo", "year(hi) as yhi",
        "cast(hi as double) - cast(lo as double) as span_sec")
      .head()
    val (ylo, yhi, span) = (r.getInt(0), r.getInt(1), r.getDouble(2))
    // A ÷1000-of-micros decode collapses to 1970; a ×1000 misread of nanos
    // explodes past year 2100. Either way this fails.
    assert(ylo >= 2000 && yhi <= 2100,
      s"events.ts decoded outside a plausible era: years [$ylo, $yhi] — " +
        "the parquet timestamp unit is being mis-decoded (see Tables.load)")
    assert(span > 86400.0,
      s"events.ts spans only $span s (<1 day) — timeline compressed, " +
        "timestamp unit mis-decoded")
  }

  test("the canary REJECTS a wrong-unit decode (simulated ÷1000 and ×1000)") {
    // simulate the round-8 bug (micros divided by 1000 → 1970 pileup)
    // and its inverse (nanos read as micros → far future) on the real
    // data, and check the era/span predicates the first test enforces
    // actually fail for both — the canary must be able to fire
    def eraAndSpan(df: org.apache.spark.sql.DataFrame): (Int, Int, Double) = {
      val r = df.agg(min("ts").as("lo"), max("ts").as("hi"))
        .selectExpr("year(lo)", "year(hi)",
          "cast(hi as double) - cast(lo as double)").head()
      (r.getInt(0), r.getInt(1), r.getDouble(2))
    }
    val real = Tables.load(spark, sfDir, "events")
    val div1000 = real.withColumn("ts",
      expr("timestamp_micros(unix_micros(ts) div 1000)"))
    val (dLo, _, dSpan) = eraAndSpan(div1000)
    assert(dLo < 2000 || dSpan <= 86400.0,
      "÷1000 decode not detectable — canary predicates too loose")
    val times1000 = real.withColumn("ts",
      expr("try_cast(unix_micros(ts) * 1000 as timestamp)")) // overflow-safe
    val anyBad = times1000.filter(col("ts").isNull ||
      year(col("ts")) > 2100).count()
    assert(anyBad > 0,
      "×1000 decode not detectable — canary predicates too loose")
  }

  test("events era overlaps or follows the orders era (as-of joins assume it)") {
    val eLo = Tables.load(spark, sfDir, "events").agg(min("ts")).head().getTimestamp(0)
    val oLo = Tables.load(spark, sfDir, "orders").agg(min("o_orderdate")).head().getTimestamp(0)
    // Backward as-of (q53) matches each event to the latest preceding order:
    // every event must come at or after the first order.
    assert(!eLo.before(oLo),
      s"first event $eLo precedes first order $oLo — as-of/backward joins " +
        "would go all-NULL; events timestamp decode is suspect")
  }

  test("every Tables schema reads its parquet with non-zero rows and exact columns") {
    Tables.schemas.foreach { case (name, schema) =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.schema.fieldNames.toSeq == schema.fieldNames.toSeq,
        s"$name column order drifted")
      assert(df.schema == schema, s"$name decoded schema drifted from Tables.$name")
      assert(df.limit(1).count() == 1, s"$name read zero rows")
    }
  }

  test("embeddings are fixed-dimension non-empty vectors (similarity ops assume it)") {
    val r = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("min(size(embedding)) AS lo", "max(size(embedding)) AS hi",
        "count_if(embedding IS NULL) AS nulls")
      .head()
    assert(r.getLong(2) == 0, "NULL embedding vectors appeared")
    assert(r.getInt(0) == r.getInt(1) && r.getInt(0) > 0,
      s"embedding dimension not constant: [${r.getInt(0)}, ${r.getInt(1)}] — " +
        "a regeneration changed the vector shape")
  }

  test("documents carry non-empty text (dedup/text ops assume it)") {
    val bad = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNull || length(col("text")) === 0).count()
    assert(bad == 0, s"$bad NULL/empty documents — text fixture drifted")
  }

  // ---- parquet footer pinning for documents/embeddings: the same
  // physical-contract canary events.ts gets, for the string/list
  // columns the text and similarity surfaces assume. A regeneration
  // that re-encodes text as raw BINARY, n_chars as INT32, or the
  // embedding as list<double> would make explicit-schema reads fail or
  // silently null — this fires first, with the column named. ----

  private def footerSchema(path: String): org.apache.parquet.schema.MessageType = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val file =
      if (st.isFile) p
      else fs.listStatus(p).filter(_.isFile)
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no parquet file under $path"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getFooter.getFileMetaData.getSchema finally reader.close()
  }

  private def firstLeaf(t: org.apache.parquet.schema.Type)
      : org.apache.parquet.schema.PrimitiveType =
    if (t.isPrimitive) t.asPrimitiveType()
    else firstLeaf(t.asGroupType().getType(0))

  /** Violations of the pinned documents physical contract (empty = ok). */
  private def docFooterViolations(path: String): Seq[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val s = footerSchema(path)
    def prim(c: String) = firstLeaf(s.getType(s.getFieldIndex(c)))
    val longs = Seq("doc_id", "n_chars").collect {
      case c if prim(c).getPrimitiveTypeName != INT64 =>
        s"$c is ${prim(c).getPrimitiveTypeName}, want INT64"
    }
    val strings = Seq("text", "lang", "source").collect {
      case c if prim(c).getPrimitiveTypeName != BINARY ||
        prim(c).getLogicalTypeAnnotation !=
          LogicalTypeAnnotation.stringType() =>
        s"$c is ${prim(c).getPrimitiveTypeName}" +
          s"/${prim(c).getLogicalTypeAnnotation}, want BINARY/STRING"
    }
    longs ++ strings
  }

  /** Violations of the pinned embeddings physical contract (empty = ok). */
  private def embFooterViolations(path: String): Seq[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val s = footerSchema(path)
    def prim(c: String) = firstLeaf(s.getType(s.getFieldIndex(c)))
    val emb = s.getType(s.getFieldIndex("embedding"))
    Seq(
      (prim("vec_id").getPrimitiveTypeName != INT64) ->
        s"vec_id is ${prim("vec_id").getPrimitiveTypeName}, want INT64",
      (prim("label").getPrimitiveTypeName != INT32) ->
        s"label is ${prim("label").getPrimitiveTypeName}, want INT32",
      (emb.isPrimitive || emb.getLogicalTypeAnnotation !=
        LogicalTypeAnnotation.listType()) ->
        "embedding is not a LIST group",
      (firstLeaf(emb).getPrimitiveTypeName != FLOAT) ->
        s"embedding element is ${firstLeaf(emb).getPrimitiveTypeName}, want FLOAT"
    ).collect { case (true, msg) => msg }
  }

  test("documents/embeddings parquet footers carry the pinned physical types") {
    val doc = docFooterViolations(s"$sfDir/documents.parquet")
    assert(doc.isEmpty,
      s"documents physical contract drifted:\n${doc.mkString("\n")} — " +
        "a regeneration re-encoded the table (see Tables.documents)")
    val emb = embFooterViolations(s"$sfDir/embeddings.parquet")
    assert(emb.isEmpty,
      s"embeddings physical contract drifted:\n${emb.mkString("\n")} — " +
        "a regeneration re-encoded the table (see Tables.embeddings)")
  }

  test("the footer canary REJECTS a simulated re-encode of either table") {
    // re-encode the real tables the ways a generator drift plausibly
    // would (raw-binary text, narrowed count, widened floats/label) and
    // prove the violation detectors actually fire on each change
    val tmp = java.nio.file.Files.createTempDirectory("graft_reenc").toString
    Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "cast(text as binary) as text", "lang",
        "source", "cast(n_chars as int) as n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/docs")
    val docViol = docFooterViolations(s"$tmp/docs")
    assert(docViol.exists(_.startsWith("text")),
      s"binary-encoded text not detected: $docViol")
    assert(docViol.exists(_.startsWith("n_chars")),
      s"INT32 n_chars not detected: $docViol")

    Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as embedding",
        "cast(label as bigint) as label")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/embs")
    val embViol = embFooterViolations(s"$tmp/embs")
    assert(embViol.exists(_.startsWith("embedding element")),
      s"double-widened embedding not detected: $embViol")
    assert(embViol.exists(_.startsWith("label")),
      s"widened label not detected: $embViol")
  }

  test("no decoded timestamp column is all-NULL (schema/footer type mismatch canary)") {
    Seq("events" -> "ts", "orders" -> "o_orderdate", "lineitem" -> "l_shipdate")
      .foreach { case (t, c) =>
        val nulls = Tables.load(spark, sfDir, t).filter(col(c).isNull).count()
        assert(nulls == 0, s"$t.$c has $nulls NULLs — explicit-schema read is " +
          "silently nulling a mistyped column")
      }
  }
}
