package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt extension list): treat
  * media as opaque `binary` columns with typed metadata, processed
  * batch-wise per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but every piece of Spark-side
  * plumbing is real: the binary column + metadata struct schema, the
  * partition-wise batch iterator (`mapPartitions`, the Scala analogue of
  * a Pandas-UDF batch loop), and the typed row shape a real decoder
  * (JNI/ONNX/ffmpeg) would slot into without touching the plan.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Input row: media payload + metadata, as a real pipeline would carry
    * (payload from object storage, metadata from the catalog). */
  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)

  /** Output of the per-batch "decode / feature-extract" step. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, digest: String,
      width: Long, height: Long)

  /** STUB — deterministic fake decode. A real implementation would
    * decode `media` (JPEG/PNG/WAV/...) and return true dimensions and
    * content features; the fake derives them from the payload alone so
    * results stay reproducible and oracle-checkable. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(m.media).map("%02x".format(_)).mkString
    MediaFeatures(m.doc_id, m.media.length.toLong, digest,
      m.media.length % 640L, m.media.length % 480L)
  }

  // ---- 47. Multimodal pipeline: binary column -> batch decode -> features ----
  val q47_multimodal: Q = (s, dir) => {
    import s.implicits._
    // The documents' text bytes stand in for a media payload (the only
    // binary-ish content in the fixtures); a real pipeline would read
    // the payload column directly from parquet.
    val media: Dataset[MediaRow] = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("media"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(decodeStub)) // batch-wise, no per-row JVM<->anything hops
      .toDF()
      .orderBy("doc_id")
  }

  // The fake decode is byte-deterministic, so DuckDB replicates it from
  // the text column (ASCII text => strlen == byte length, md5 identical).
  val q47_multimodal_sql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  strlen(text) % 640 AS width, strlen(text) % 480 AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  case class Frame(doc_id: Long, frame_idx: Long, digest: String)

  /** STUB — deterministic fake frame decode: a real implementation
    * would run ffmpeg/codec over the payload per batch; the fake hashes
    * fixed-width character windows so the oracle can replicate it. */
  def sampleFramesStub(docId: Long, text: String): Seq[Frame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until text.length by 200).zipWithIndex.map { case (off, idx) =>
      val frame = text.substring(off, math.min(off + 100, text.length))
      md.reset()
      Frame(docId, idx.toLong,
        md.digest(frame.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
  }

  // ---- 47b. Frame sampling: explicit BATCH-shaped partition processing
  // (the Scala analogue of a mapInPandas batch loop: rows are pulled in
  // fixed-size batches, each batch is "decoded" together — the shape a
  // vectorized/native decoder needs; here every 2nd 100-char window of
  // the payload is a "frame").
  val q47b_frame_sample: Q = (s, dir) => {
    import s.implicits._
    val BatchSize = 32
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          // per-batch setup happens once (codec init, buffer alloc, ...)
          batch.flatMap { case (id, text) => sampleFramesStub(id, text) }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  // Frames start every 200 chars (sampling every 2nd 100-char window).
  // The series bound must dominate the longest possible document
  // (DuckDB's lateral generate_series can't reference length(text));
  // 8191 frames covers ~1.6M chars — far beyond any fixture document.
  val q47b_frame_sample_sql: String =
    """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |  md5(substr(text, i * 200 + 1, 100)) AS digest
      |FROM documents, generate_series(0, 8191) AS g(i)
      |WHERE i * 200 < length(text)
      |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q47_multimodal" -> q47_multimodal,
    "q47b_frame_sample" -> q47b_frame_sample)
  val oracles: Map[String, String] = Map(
    "q47_multimodal" -> q47_multimodal_sql,
    "q47b_frame_sample" -> q47b_frame_sample_sql)
}
