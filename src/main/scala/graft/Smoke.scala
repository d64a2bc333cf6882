package graft

import org.apache.spark.sql.SparkSession

/** Local mimic of the driver's t1 smoke: run SparkEntry.entry on sf0.001
  * and assert rows > 0. Exit code 0 iff the smoke passes. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
