package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** The native CosineSimilarity expression must agree with the
  * HOF-composed formula (zip_with + aggregate) bit-for-bit, handle
  * degenerate inputs, and be callable from SQL. */
class VectorExprSpec extends TestBase {

  test("native text-hash expressions are bit-equal to the Scala functions") {
    import graft.functions.{TextHash, TextHashExprs}
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val rows = docs.select(col("text"),
      TextHashExprs.minhash_signature(col("text"), 3).as("sig"),
      TextHashExprs.band_hashes(
        TextHashExprs.minhash_signature(col("text"), 3)).as("bands"),
      TextHashExprs.simhash64(col("text")).as("sh"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      assert(r.getSeq[Long](1) == TextHash.minhashSignature(text, 3).toSeq)
      assert(r.getSeq[Long](2) ==
        TextHash.bandHashes(TextHash.minhashSignature(text, 3)).toSeq)
      assert(r.getLong(3) == TextHash.simhash64(text))
    }
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
    val brows = emb.select(col("embedding"),
      TextHashExprs.srp_bucket(col("embedding")).as("b")).collect()
    brows.foreach { r =>
      assert(r.getInt(1) == TextHash.srpBucket(
        r.getSeq[Float](0).toArray))
    }
  }

  test("srp_buckets (multi-table) is bit-equal to the Scala family; table 0 at 6 bits = srp_bucket") {
    import graft.functions.{TextHash, TextHashExprs}
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
    val rows = emb.select(col("embedding"),
      TextHashExprs.srp_buckets(col("embedding")).as("bks"),
      TextHashExprs.srp_buckets(col("embedding"), 1, TextHash.LshBits)
        .as("one"),
      TextHashExprs.srp_bucket(col("embedding")).as("b")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      assert(r.getSeq[Int](1) == TextHash.srpBuckets(v,
        TextHash.SrpTables, TextHash.SrpTableBits).toSeq)
      // plane family is shared: one table of LshBits planes IS srpBucket
      assert(r.getSeq[Int](2) == Seq(r.getInt(3)),
        "srp_buckets(1, LshBits) must equal srp_bucket")
    }
    // null element -> NULL array (same contract as srp_bucket)
    import spark.implicits._
    val nulls = Seq((1, Seq[java.lang.Float](1.0f, null, 3.0f)))
      .toDF("id", "v")
      .select(TextHashExprs.srp_buckets(col("v")).as("bks")).collect()
    assert(nulls.head.isNullAt(0), "null element must yield NULL buckets")
  }

  test("srp_probe_buckets: probe 0 = srp_buckets per table, flips distinct, Scala-family parity") {
    import graft.functions.{TextHash, TextHashExprs}
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
    val (tables, bits, probes) =
      (TextHash.SrpTables, TextHash.SrpTableBits, TextHash.SrpProbes)
    val rows = emb.select(col("embedding"),
      TextHashExprs.srp_probe_buckets(col("embedding")).as("pbs"),
      TextHashExprs.srp_buckets(col("embedding")).as("bks")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val pbs = r.getSeq[Int](1)
      val bks = r.getSeq[Int](2)
      // bit-equal to the Scala family (codegen/interp parity rides the
      // same path as the other TextHash expressions)
      assert(pbs == TextHash.srpProbeBuckets(v, tables, bits, probes).toSeq)
      (0 until tables).foreach { t =>
        // probe 0 of table t IS table t's exact bucket
        assert(pbs(t * probes) == bks(t),
          s"table $t: probe 0 must equal the exact bucket")
        // all probes of a table are distinct single-bit flips in range
        val ps = (0 until probes).map(p => pbs(t * probes + p))
        assert(ps.distinct.size == probes, s"table $t: duplicate probes")
        ps.tail.foreach { alt =>
          val diff = alt ^ ps.head
          assert(Integer.bitCount(diff) == 1 && diff < (1 << bits),
            s"table $t: probe $alt is not a single-plane flip of ${ps.head}")
        }
      }
    }
    // the DOUBLE path (separate accumulate loop) must satisfy the same
    // structural contract: probe 0 = that type's exact bucket, flips
    // distinct single-plane in range
    val drows = emb.select(
      TextHashExprs.srp_probe_buckets(
        transform(col("embedding"), x => x.cast("double"))).as("pbs"),
      TextHashExprs.srp_buckets(
        transform(col("embedding"), x => x.cast("double"))).as("bks"))
      .collect()
    drows.foreach { r =>
      val pbs = r.getSeq[Int](0)
      val bks = r.getSeq[Int](1)
      (0 until tables).foreach { t =>
        assert(pbs(t * probes) == bks(t),
          s"double path, table $t: probe 0 must equal the exact bucket")
        val ps = (0 until probes).map(p => pbs(t * probes + p))
        assert(ps.distinct.size == probes)
        ps.tail.foreach { alt =>
          val diff = alt ^ ps.head
          assert(Integer.bitCount(diff) == 1 && diff < (1 << bits))
        }
      }
    }
    // null element -> NULL array (same contract as srp_buckets)
    import spark.implicits._
    val nulls = Seq((1, Seq[java.lang.Float](1.0f, null, 3.0f)))
      .toDF("id", "v")
      .select(TextHashExprs.srp_probe_buckets(col("v")).as("pbs")).collect()
    assert(nulls.head.isNullAt(0), "null element must yield NULL probes")
  }

  test("srp_bucket of a vector with a null element is NULL, not a garbage bucket") {
    import graft.functions.TextHashExprs
    import spark.implicits._
    val df = Seq(
      (1, Seq[java.lang.Float](1.0f, null, 3.0f)),
      (2, Seq[java.lang.Float](1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val rows = df.select(col("id"), TextHashExprs.srp_bucket(col("v")).as("b"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "null element must yield NULL bucket")
    assert(!rows(1).isNullAt(1))
  }

  private lazy val e = Tables.load(spark, sfDir, "embeddings").limit(50)

  test("matches zip_with/aggregate composition") {
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val both = a.crossJoin(b).limit(500)
      .withColumn("expr_sim",
        VectorExprs.cosine_similarity(col("ea"), col("eb")))
      .withColumn("hof_dot",
        aggregate(zip_with(col("ea"), col("eb"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("hof_na", aggregate(col("ea"), lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double")))
      .withColumn("hof_nb", aggregate(col("eb"), lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double")))
      .withColumn("hof_sim",
        col("hof_dot") / (sqrt(col("hof_na")) * sqrt(col("hof_nb"))))
    val bad = both.filter(col("expr_sim") =!= col("hof_sim")).count()
    assert(bad == 0)
  }

  test("self-similarity is 1.0 within fp tolerance") {
    val sims = e
      .withColumn("s", VectorExprs.cosine_similarity(col("embedding"), col("embedding")))
      .select("s").collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("ragged (mismatched-dim) vectors yield null, not a prefix score") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      VectorExprs.cosine_similarity(col("a"), col("b")).as("c"),
      VectorExprs.dot_product(col("a"), col("b")).as("d")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("zero vector yields null") {
    import spark.implicits._
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(VectorExprs.cosine_similarity(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("registered SQL function works") {
    VectorExprs.register(spark)
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT cosine_similarity(embedding, embedding) AS s
        |FROM embeddings LIMIT 5""".stripMargin).count()
    assert(n == 5)
  }

  test("dot product of unit-ish vectors stays bounded") {
    val r = e.withColumn("d",
      VectorExprs.dot_product(col("embedding"), col("embedding")))
      .agg(min("d"), max("d")).collect()(0)
    assert(r.getDouble(0) > 0.0 && r.getDouble(1) < 10.0)
  }
}
