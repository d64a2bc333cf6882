package graft.streaming

import org.apache.spark.sql.SparkSession

/** Usage example / smoke for the streaming surface: stages the events
  * fixture into a watch directory, runs the watermarked windowed
  * aggregation as a real Structured Streaming query (file source ->
  * memory sink), and prints the result next to the batch run of the
  * same transformation. Exit 1 if they differ.
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_stream_smoke")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))

    val q = GraftStreams.windowedCounts(
      GraftStreams.eventsStream(spark, dir.toString))
      .writeStream.format("memory").queryName("win").outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win").orderBy("win_start", "event_type")
    streamed.show(5, truncate = false)
    val batch = GraftStreams.windowedCounts(
      graft.Tables.load(spark, sfDir, "events"))
      .orderBy("win_start", "event_type")
    val same = streamed.collect().map(_.toSeq).toSeq ==
      batch.collect().map(_.toSeq).toSeq
    println(s"[stream-smoke] windows=${streamed.count()} matches_batch=$same")

    // streaming dedup: feed the fixture twice, expect one copy out
    val dupDir = java.nio.file.Files.createTempDirectory("graft_stream_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dupDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dupDir.resolve("b.parquet"))
    val dq = GraftStreams.dedupedEvents(
      GraftStreams.eventsStream(spark, dupDir.toString, maxFilesPerTrigger = 2))
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .start()
    try dq.processAllAvailable() finally dq.stop()
    val deduped = spark.table("dedup").count()
    val distinct = graft.Tables.load(spark, sfDir, "events").count()
    println(s"[stream-smoke] dedup in=${2 * distinct} out=$deduped ok=${deduped == distinct}")

    // stream-stream watermarked interval join vs its batch plan
    import org.apache.spark.sql.functions.col
    def sideStream(t: String) = GraftStreams.eventsStream(spark, dir.toString)
      .filter(col("event_type") === t)
    val jq = GraftStreams.purchasesAfterSignup(
      sideStream("signup"), sideStream("purchase"))
      .writeStream.format("memory").queryName("ssj").outputMode("append")
      .start()
    try jq.processAllAvailable() finally jq.stop()
    val ev = graft.Tables.load(spark, sfDir, "events")
    val batchJoin = GraftStreams.purchasesAfterSignup(
      ev.filter(col("event_type") === "signup"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val streamJoin = spark.table("ssj")
      .orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val joinOk = streamJoin == batchJoin && streamJoin.nonEmpty
    println(s"[stream-smoke] interval_join rows=${streamJoin.size} matches_batch=$joinOk")
    spark.stop()
    if (!same || deduped != distinct || !joinOk) sys.exit(1)
  }
}
