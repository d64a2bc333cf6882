package graft

import graft.functions.TopKAgg.top_k_rows
import org.apache.spark.sql.functions._

/** TopKRowsAgg: the bounded-heap top-k aggregate. The oracle gate
  * (q101) proves the flagship query; this spec pins the aggregate's own
  * contract — agreement with the window idiom on both directions,
  * partition invariance of the merge, null handling, and the SQL
  * surface — on data sized to force multi-batch partials and spills of
  * ties across partitions. */
class TopKAggSpec extends TestBase {

  private lazy val df = {
    val sqlImplicits = spark.implicits
    import sqlImplicits._
    // 4 groups x 2500 rows with heavy value ties (value = i % 50), so
    // correctness REQUIRES the trailing unique key to order ties; 40
    // partitions so every partial heap merges across mappers
    (0 until 10000).map(i => (s"g${i % 4}", (i % 50).toLong, i.toLong))
      .toDF("g", "v", "id").repartition(40)
  }

  private def windowTop(k: Int, largest: Boolean) = {
    import org.apache.spark.sql.expressions.Window
    val ord = if (largest) Seq(col("v").desc, col("id").desc)
      else Seq(col("v").asc, col("id").asc)
    val w = Window.partitionBy("g").orderBy(ord: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("g", "rn", "v", "id").collect().map(_.toSeq).toSet
  }

  private def aggTop(k: Int, largest: Boolean) =
    df.groupBy("g")
      .agg(top_k_rows(struct(col("v"), col("id")), k, largest).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).as("rn").cast("int"),
        col("col.v").as("v"), col("col.id").as("id"))
      .collect().map(_.toSeq).toSet

  test("largest-k equals the descending window idiom through heavy ties") {
    assert(aggTop(7, largest = true) == windowTop(7, largest = true))
  }

  test("smallest-k equals the ascending window idiom") {
    assert(aggTop(5, largest = false) == windowTop(5, largest = false))
  }

  test("k larger than any group returns whole groups, ordered") {
    val out = df.filter(col("id") < 6) // tiny: 4 groups, <=2 rows each
      .groupBy("g").agg(top_k_rows(struct(col("v"), col("id")), 100).as("tk"))
      .select(col("g"), col("tk"))
      .collect()
    out.foreach { r =>
      val vs = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1)))
      assert(vs == vs.sortBy { case (v, id) => (-v, -id) },
        s"group ${r.getString(0)} not emitted best-first: $vs")
    }
  }

  test("result is invariant to the input partitioning") {
    val a = aggTop(7, largest = true)
    val b = df.repartition(3).groupBy("g")
      .agg(top_k_rows(struct(col("v"), col("id")), 7).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).as("rn").cast("int"),
        col("col.v").as("v"), col("col.id").as("id"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("null structs do not compete, all-null group yields an empty array") {
    val sqlImplicits = spark.implicits
    import sqlImplicits._
    val d = Seq(("a", Some(1L)), ("a", None), ("b", None))
      .toDF("g", "v")
      // struct is null when v is null (outer-join-miss shape)
      .withColumn("s", when(col("v").isNotNull, struct(col("v"))))
    val out = d.groupBy("g").agg(top_k_rows(col("s"), 2).as("tk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1).length).toMap
    assert(out == Map("a" -> 1, "b" -> 0))
  }

  test("non-struct input is an analysis-time error") {
    val e = intercept[Exception] {
      df.groupBy("g").agg(top_k_rows(col("v"), 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("struct"), e.getMessage)
  }
}
