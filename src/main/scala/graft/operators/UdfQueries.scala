package graft.operators

import graft.Tables
import graft.functions.Det.dround
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined function surface (SURVEY.md §2B row 33): a scalar Scala
  * UDF, a typed `Aggregator` UDAF, and a UDTF-equivalent (UDF returning
  * an array, exploded). Each has a DuckDB-replicable definition so the
  * oracle still applies.
  *
  * Scale note: Scala UDFs break whole-stage codegen, so the rest of the
  * engine uses native `functions._`; these queries exist to prove the
  * extension surface, not as the preferred style (see SNIPPETS.md
  * "Functions, not UDFs").
  */
object UdfQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Weighted average: sum(x*w)/sum(w). Buffer is a (sum, weight) pair. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ---- 33. Scalar UDF ----
  val q33_udf: Q = (s, dir) => {
    val netPrice = udf((price: Double, disc: Double) => price * (1 - disc))
    t(s, dir, "lineitem")
      .withColumn("net", netPrice(col("l_extendedprice"), col("l_discount")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), dround(sum("net"), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  val q33_udf_sql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 33b. Typed Aggregator (UDAF) ----
  val q33b_udaf: Q = (s, dir) => {
    val wavg = udaf(WeightedAvg)
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(dround(wavg(col("l_extendedprice"), col("l_quantity")), 2)
        .as("wavg_price"))
      .orderBy("l_returnflag")
  }

  val q33b_udaf_sql: String =
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 33c. UDTF-equivalent: UDF returning array, exploded ----
  val q33c_udtf: Q = (s, dir) => {
    val words = udf((name: String) => name.split(" "))
    t(s, dir, "part")
      .select(explode(words(col("p_name"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("w")
  }

  val q33c_udtf_sql: String =
    """SELECT w, count(*) AS cnt
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
      |GROUP BY w ORDER BY w""".stripMargin

  val queries: Map[String, Q] = Map(
    "q33_udf" -> q33_udf,
    "q33b_udaf" -> q33b_udaf,
    "q33c_udtf" -> q33c_udtf)

  val oracles: Map[String, String] = Map(
    "q33_udf" -> q33_udf_sql,
    "q33b_udaf" -> q33b_udaf_sql,
    "q33c_udtf" -> q33c_udtf_sql)
}
