package graft.table

import graft.TestBase
import org.apache.spark.sql.functions._

/** Envelope-sized COW rewrite widths ([[GraftTable.sizedParts]]): the
  * caller's nParts stays the FLOOR (identical small-scale layout), but
  * when the impacted files' manifest bytes exceed
  * `spark.graft.write.targetFileBytes` the survivor rewrite fans out to
  * ~target-sized outputs — at 100 TB a keyed UPDATE/DELETE/MERGE must
  * not funnel its envelope through two fixed write tasks. */
class SizedRewriteSpec extends TestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_sized").toString

  test("a small target file size fans a DELETE's survivor rewrite out; default keeps the floor") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
    tbl.create((1L to 20000L).map(i => (i, s"payload_$i")).toDF("id", "v"), 4)
    val pred = col("id") % 10 === 0 // unprunable: every file impacted

    // default target (128 MiB): tiny table -> the nParts floor holds
    val n1 = tbl.commitDelete(
      Seq.empty[org.apache.spark.sql.sources.Filter], pred, 1, 2, None)
    assert(n1 == 2000L, s"deleted $n1")
    val v2Fresh = tbl.files(2).toSet -- tbl.files(1).toSet
    assert(v2Fresh.size <= 2, s"default sizing must keep the floor: ${v2Fresh.size}")

    // 16 KiB target over the same whole-table envelope: fans out
    try {
      s.conf.set("spark.graft.write.targetFileBytes", "16384")
      val n2 = tbl.commitDelete(Seq.empty[org.apache.spark.sql.sources.Filter],
        col("id") % 10 === 1, 2, 2, None)
      assert(n2 == 2000L, s"deleted $n2")
      val v3Fresh = tbl.files(3).toSet -- tbl.files(2).toSet
      assert(v3Fresh.size > 2,
        s"16KiB target must fan the rewrite out, got ${v3Fresh.size}")
      assert(tbl.readAsOf(3).count() == 16000L)
    } finally s.conf.unset("spark.graft.write.targetFileBytes")
  }

  test("UPDATE under a small target fans out; with the default it keeps the 2-file floor") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val tbl = GraftTable(s, s"$root/data", s"$root/man", "id")
    tbl.create((1L to 20000L).map(i => (i, i % 97, s"pay_$i"))
      .toDF("id", "grp", "v"), 4)
    val cat = s"$root/catalog"
    s.conf.set("spark.sql.catalog.gsz", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsz.dir", cat)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsz.db")
    s.sql(s"CREATE TABLE gsz.db.t USING graft OPTIONS (man '$root/man')")

    // default target (128 MiB): tiny table -> the historical 2-file floor
    s.sql("UPDATE gsz.db.t SET grp = grp + 1000 WHERE grp = 5")
    val v2New = tbl.files(2).toSet -- tbl.files(1).toSet
    assert(v2New.size <= 2, s"default sizing must keep the floor: $v2New")

    // small target: the same shape of UPDATE fans its rewrite out
    try {
      s.conf.set("spark.graft.write.targetFileBytes", "16384")
      s.sql("UPDATE gsz.db.t SET grp = grp + 1000 WHERE grp = 6")
      val v3New = tbl.files(3).toSet -- tbl.files(2).toSet
      assert(v3New.size > 2,
        s"16KiB target over a ~full-table envelope must fan out, got ${v3New.size}")
      // content unharmed by the fan-out
      assert(s.sql("SELECT count(*) AS c FROM gsz.db.t WHERE grp = 1006")
        .head.getLong(0) ==
        (1L to 20000L).count(i => i % 97 == 6))
      assert(s.sql("SELECT count(*) AS c FROM gsz.db.t").head.getLong(0)
        == 20000L)
    } finally s.conf.unset("spark.graft.write.targetFileBytes")
  }
}
