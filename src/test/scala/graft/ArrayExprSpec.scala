package graft

import graft.functions.ArrayExprs.sorted_intersect_count
import org.apache.spark.sql.functions._

/** The native sorted-merge intersection count must agree with
  * `size(array_intersect)` on every sorted input (including the real
  * corpus' shingle arrays), in both interpreted eval and whole-stage
  * codegen, and honor its NULL contract. */
class ArrayExprSpec extends TestBase {

  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df
      .withColumn("merge_c", sorted_intersect_count(col("a"), col("b")))
      .withColumn("hash_c", size(array_intersect(col("a"), col("b"))))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("merge_c") == r.getAs[Int]("hash_c"),
        s"mismatch on a=${r.getAs[Seq[String]]("a")} b=${r.getAs[Seq[String]]("b")}")
    }
  }

  test("equals size(array_intersect) on corpus shingle arrays (codegen path)") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_sort(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))))
        .as("sh"))
    val pairs = docs.select(col("doc_id").as("ia"), col("sh").as("a"))
      .crossJoin(docs.select(col("doc_id").as("ib"), col("sh").as("b")))
      .filter(col("ia") < col("ib"))
    check(pairs)
  }

  test("edge shapes: empty, disjoint, identical, subset, skewed lengths") {
    val df = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("b"), Seq("a", "b", "c")),
      (Seq("a"), Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (Seq("aa", "ab", "b"), Seq("ab", "b", "ba"))).toDF("a", "b")
    check(df)
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*): ArrayData =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    val e = graft.functions.ArrayExprs.SortedIntersectCount(
      Literal.create(arr("a", "b", "d"), ArrayType(StringType)),
      Literal.create(arr("b", "c", "d", "e"), ArrayType(StringType)))
    assert(e.eval(null) == 2)
  }

  test("NULL array yields NULL; NULL elements (sorted last) never count") {
    val df = Seq(
      (1, Seq[String]("a", "b"), null.asInstanceOf[Seq[String]]),
      (2, Seq[String]("a", "b"), Seq[String]("a", "b"))).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      sorted_intersect_count(col("a"), col("b")).as("c")).orderBy("id").collect()
    assert(rows(0).isNullAt(1), "NULL array must give NULL count")
    assert(rows(1).getInt(1) == 2)
    // null ELEMENTS: array_sort puts them last; the merge must stop
    // before them and count only the non-null prefix
    val withNullElems = Seq(
      (Seq[String]("a", "b", null), Seq[String]("a", null, null)))
      .toDF("a0", "b0")
      .select(array_sort(col("a0")).as("a"), array_sort(col("b0")).as("b"))
    val r = withNullElems
      .select(sorted_intersect_count(col("a"), col("b")).as("c")).head
    assert(r.getInt(0) == 1, "only the shared non-null element may count")
  }
}
