package graft

import java.io.File
import java.nio.file.Files
import java.security.MessageDigest

import graft.operators.CurationQueries
import org.apache.spark.sql.functions._

/** q105's copy-on-write contract: a merge rewrites ONLY the
  * manifest-impacted files — everything else must be byte-identical
  * afterward — and leaves the manifest consistent with the directory so
  * skipping keeps working. */
class CowMergeSpec extends TestBase {

  private def md5s(dir: String): Map[String, String] = {
    val fs = new File(dir).listFiles()
    (if (fs == null) Array.empty[File] else fs)
      .filter(_.getName.startsWith("part-"))
      .map { f =>
        f.getName -> MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
  }

  test("merge rewrites only impacted files; the rest stay byte-identical") {
    val (out, man) = CurationQueries.cowLayout(spark, sfDir)
    val before = md5s(out)
    val total = before.size
    val updates = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey").between(1000, 1200))
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    val (impacted, _) = CurationQueries.manifestPrune(spark, man, 1000L, 1200L)
    assert(impacted.nonEmpty && impacted.size < total,
      s"impacted ${impacted.size} of $total — range does not prune")
    val impactedNames = impacted.map(p =>
      new File(new java.net.URI(p).getPath).getName).toSet

    CurationQueries.cowMerge(spark, (out, man), updates, "o_orderkey")
    val after = md5s(out)

    // every replaced file is gone; every untouched file is bit-for-bit
    impactedNames.foreach(n => assert(!after.contains(n), s"$n not replaced"))
    (before.keySet -- impactedNames).foreach { n =>
      assert(after.get(n).contains(before(n)), s"untouched file $n changed")
    }
    assert(after.size > total - impactedNames.size, "no replacement written")

    // the merged table state is the straight full-table restatement
    val got = spark.read.parquet(out)
      .filter(col("o_orderkey").between(1000, 1200))
      .agg(sum("o_totalprice")).head.getDouble(0)
    val want = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey").between(1000, 1200))
      .agg(sum(col("o_totalprice") * 2)).head.getDouble(0)
    assert(math.abs(got - want) < 1e-6, s"$got != $want")

    // manifest consistency: entries name exactly the directory's files,
    // and each box matches the file's true min/max
    val entries = spark.read.parquet(man).collect()
      .map(r => (new File(new java.net.URI(r.getAs[String]("file")).getPath).getName,
        r.getAs[Number]("lo").longValue, r.getAs[Number]("hi").longValue))
    assert(entries.map(_._1).toSet == after.keySet,
      "manifest entries diverge from the directory")
    entries.foreach { case (name, lo, hi) =>
      val mm = spark.read.parquet(s"$out/$name")
        .agg(min("o_orderkey"), max("o_orderkey")).head
      assert(mm.getLong(0) == lo && mm.getLong(1) == hi,
        s"stale box for $name: [$lo,$hi] vs [${mm.getLong(0)},${mm.getLong(1)}]")
    }

    // skipping still works on the post-merge manifest
    val (kept2, total2) = CurationQueries.manifestPrune(spark, man, 1000L, 1200L)
    assert(kept2.nonEmpty && kept2.size < total2)
  }
}
