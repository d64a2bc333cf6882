package graft.operators

import graft.Tables
import graft.functions.Det.{dround, md5Bucket}
import graft.functions.FreqItemsAgg.freq_items_sketch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / sampling operators for the training-data pipeline:
  * deterministic sampling, sketch-based heavy hitters, sample-based
  * quantiles, robust (MAD) outlier detection, and bigram language-model
  * statistics.
  *
  * The sampling family is built on ONE primitive — bottom-k by a
  * content-derived hash (a KMV/min-hash sample). Unlike `TABLESAMPLE` or
  * `rand()`-based sampling it is deterministic under any partitioning,
  * any executor count, and any retry (the sample is a pure function of
  * the data), so it is reproducible at 100 TB AND oracle-checkable: the
  * DuckDB oracle states the identical bottom-k selection. The plan shape
  * is a TakeOrderedAndProject — each task keeps its local k smallest
  * hashes, the driver merges k-sized heaps — no full sort, no global
  * shuffle of the fact table.
  */
object StatQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** md5 over the row's unique key — (l_orderkey, l_linenumber,
    * l_partkey, l_suppkey) for lineitem — the sampling hash. Hashing the
    * KEY (not the payload) keeps duplicate payload values independently
    * sampled; md5 because both engines render it identically. */
  private def sampleHash(cols: Column*): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))

  private def lineitemHash: Column =
    sampleHash(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_suppkey"))

  private val LineitemHashSql: String =
    """md5(CAST(l_orderkey AS VARCHAR) || '|' ||
      |      CAST(l_linenumber AS VARCHAR) || '|' ||
      |      CAST(l_partkey AS VARCHAR) || '|' ||
      |      CAST(l_suppkey AS VARCHAR))""".stripMargin

  private val SampleK = 500

  // ---- 82. Deterministic uniform sample: bottom-k by key hash ----
  val q82_sample_bottomk: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .withColumn("hk", lineitemHash)
      .select("hk", "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice")
      .orderBy("hk")
      .limit(SampleK)

  val q82_sample_bottomk_sql: String =
    s"""SELECT $LineitemHashSql AS hk,
      |  l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem ORDER BY hk LIMIT $SampleK""".stripMargin

  // ---- 83. Heavy hitters: top-10 terms per language via the native
  // frequent-items sketch aggregate (bounded-memory Misra-Gries; see
  // FreqItemsAgg for the scale + accuracy contract). The fixture
  // vocabulary (31 terms/lang) sits far under the 2048-counter map, so
  // every estimate is exact and the DuckDB count(*) oracle hash-matches;
  // SketchSpec separately drives an undersized map through the eviction
  // regime and asserts the Misra-Gries bounds. ----
  val q83_heavy_hitters: Q = (s, dir) => {
    val terms = t(s, dir, "documents")
      .select(col("lang"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("term"))
    terms.groupBy("lang")
      .agg(freq_items_sketch(col("term"), 2048).as("fi"))
      .select(col("lang"), explode(col("fi")).as("f"))
      .select(col("lang"), col("f.term").as("term"), col("f.est").as("cnt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select("lang", "rn", "term", "cnt")
      .orderBy("lang", "rn")
  }

  val q83_heavy_hitters_sql: String =
    """WITH terms AS (
      |  SELECT lang, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents
      |), tc AS (
      |  SELECT lang, term, count(*) AS cnt FROM terms
      |  WHERE len(term) > 0 GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang, term, cnt, row_number() OVER
      |    (PARTITION BY lang ORDER BY cnt DESC, term) AS rn
      |  FROM tc
      |)
      |SELECT lang, rn, term, cnt FROM ranked WHERE rn <= 10
      |ORDER BY lang, rn""".stripMargin

  // ---- 84. Sample-based quantiles: rank picks over the deterministic
  // bottom-k sample. The classic constant-memory quantile path at
  // corpus scale — the k-row sample is the only thing that leaves the
  // scan (KMV sampling error O(1/sqrt(k)); SketchSpec asserts the rank
  // error vs the exact percentiles). The rank window runs over exactly
  // SampleK rows by construction, so the single-partition sort is
  // constant work at any SF. ----
  val q84_sample_quantiles: Q = (s, dir) => {
    val sample = t(s, dir, "lineitem")
      .withColumn("hk", lineitemHash)
      .select("l_extendedprice", "hk")
      .orderBy("hk")
      .limit(SampleK)
    // DELIBERATE global window over exactly SampleK rows (the bottom-k
    // sample is the window's whole input): constant work at any SF.
    // PlanAuditSpec's unpartitioned-window audit allowlists this query
    // and asserts the window sits above the k-limiting operator.
    val w = Window.orderBy(col("l_extendedprice"), col("hk"))
    sample.withColumn("rn", row_number().over(w))
      .filter(col("rn").isin(SampleK / 4, SampleK / 2, 3 * SampleK / 4,
        19 * SampleK / 20))
      .withColumn("p",
        when(col("rn") === SampleK / 4, 0.25)
          .when(col("rn") === SampleK / 2, 0.5)
          .when(col("rn") === 3 * SampleK / 4, 0.75)
          .otherwise(0.95))
      .select(col("p"), col("l_extendedprice").as("q"))
      .orderBy("p")
  }

  val q84_sample_quantiles_sql: String =
    s"""WITH sample AS (
      |  SELECT l_extendedprice,
      |    $LineitemHashSql AS hk
      |  FROM lineitem ORDER BY hk LIMIT $SampleK
      |), ranked AS (
      |  SELECT l_extendedprice, row_number() OVER
      |    (ORDER BY l_extendedprice, hk) AS rn
      |  FROM sample
      |)
      |SELECT CAST(CASE rn WHEN ${SampleK / 4} THEN 0.25
      |                    WHEN ${SampleK / 2} THEN 0.5
      |                    WHEN ${3 * SampleK / 4} THEN 0.75
      |                    ELSE 0.95 END AS DOUBLE) AS p,
      |  l_extendedprice AS q
      |FROM ranked
      |WHERE rn IN (${SampleK / 4}, ${SampleK / 2}, ${3 * SampleK / 4},
      |  ${19 * SampleK / 20})
      |ORDER BY p""".stripMargin

  // ---- 85. Robust outliers: median/MAD per event type. Both the
  // median and the MAD are DISCRETE rank picks (actual data values, no
  // interpolation arithmetic), so Spark and DuckDB see bit-identical
  // inputs to the 3-MAD cut and the boundary can never flip between
  // engines or partitionings. Per-group stats are one tiny broadcast
  // row each (the q79 pattern); the events table is never collected.
  // Scale note: EXACT rank selection sorts each group within one
  // reducer — inherent to exact medians (same contract as q61's exact
  // percentiles). At corpus scale with few huge groups, swap the rank
  // pick for approx_percentile or the q84 KMV sample; the MAD algebra
  // downstream is unchanged. ----
  val q85_outlier_mad: Q = (s, dir) => {
    val ev = t(s, dir, "events").select("event_id", "event_type", "value")
    val cnt = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val wv = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    val med = ev.withColumn("rn", row_number().over(wv))
      .join(broadcast(cnt), "event_type")
      .filter(col("rn") === ceil(col("n") * 0.5))
      .select(col("event_type"), col("value").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("value") - col("med")))
    val wa = Window.partitionBy("event_type")
      .orderBy(col("ad"), col("event_id"))
    val mad = dev.withColumn("rn", row_number().over(wa))
      .join(broadcast(cnt), "event_type")
      .filter(col("rn") === ceil(col("n") * 0.5))
      .select(col("event_type"), col("ad").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("ad") > lit(3.0) * col("mad"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_out"), dround(max("ad"), 4).as("max_dev"))
      .orderBy("event_type")
  }

  val q85_outlier_mad_sql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, value FROM events
      |), cnt AS (
      |  SELECT event_type, count(*) AS n FROM ev GROUP BY 1
      |), medr AS (
      |  SELECT event_type, value, row_number() OVER
      |    (PARTITION BY event_type ORDER BY value, event_id) AS rn
      |  FROM ev
      |), med AS (
      |  SELECT m.event_type, m.value AS med FROM medr m JOIN cnt c
      |    ON m.event_type = c.event_type
      |  WHERE m.rn = CAST(ceil(c.n * 0.5) AS BIGINT)
      |), dev AS (
      |  SELECT e.event_id, e.event_type, abs(e.value - m.med) AS ad
      |  FROM ev e JOIN med m ON e.event_type = m.event_type
      |), madr AS (
      |  SELECT event_type, ad, row_number() OVER
      |    (PARTITION BY event_type ORDER BY ad, event_id) AS rn
      |  FROM dev
      |), mad AS (
      |  SELECT d.event_type, d.ad AS mad FROM madr d JOIN cnt c
      |    ON d.event_type = c.event_type
      |  WHERE d.rn = CAST(ceil(c.n * 0.5) AS BIGINT)
      |)
      |SELECT d.event_type, count(*) AS n_out,
      |  round(max(d.ad), 4) + 0 AS max_dev
      |FROM dev d JOIN mad m ON d.event_type = m.event_type
      |WHERE d.ad > 3.0 * m.mad
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** (lang, ws) word arrays for the bigram family: space-tokenized
    * lowercase documents with at least one bigram. Shared by q86, q87
    * and SketchSpec so tokenization can never silently diverge between
    * the queries and the spec's exact baseline. */
  private[graft] def langWordArrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 2)

  /** (lang, bg) bigram strings per document occurrence. */
  private[graft] def langBigrams(s: SparkSession, dir: String): DataFrame =
    langWordArrays(s, dir)
      .select(col("lang"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1)))).as("bg"))

  // ---- 86. Bigram language-model statistics: P(w2 | w1) over the
  // corpus. One shuffle on (w1, w2) for the bigram counts; the unigram
  // prefix totals are a second map-side-combined agg whose result is
  // vocabulary-sized. A web-scale vocabulary (typos, URLs, code) is
  // effectively unbounded — 1e8-1e9 terms at 100 TB — so the
  // probability join is hint-free: both sides are already w1-keyed
  // aggregates, one exchange each co-partitions them, and AQE still
  // broadcasts when the measured unigram table is actually small
  // (PlanAuditSpec enforces no ResolvedHint, same contract as q92's
  // LM join). ----
  val q86_bigram_lm: Q = (s, dir) => {
    val pairs = langWordArrays(s, dir)
      .select(explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val uni = pairs.groupBy("w1").agg(count(lit(1)).as("tot"))
    big.join(uni, "w1")
      .withColumn("p", dround(col("cnt").cast("double") / col("tot"), 4))
      .filter(col("cnt") >= 10)
      .select("w1", "w2", "cnt", "p")
      .orderBy("w1", "w2")
  }

  val q86_bigram_lm_sql: String =
    """WITH pairs AS (
      |  SELECT unnest([{'w1': ws[i], 'w2': ws[i+1]}
      |    FOR i IN range(1, len(ws))]) AS bg
      |  FROM (SELECT string_split(lower(text), ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2
      |), p2 AS (
      |  SELECT bg.w1 AS w1, bg.w2 AS w2 FROM pairs
      |), bic AS (
      |  SELECT w1, w2, count(*) AS cnt FROM p2 GROUP BY 1, 2
      |), unic AS (
      |  SELECT w1, count(*) AS tot FROM p2 GROUP BY 1
      |)
      |SELECT b.w1, b.w2, b.cnt,
      |  round(CAST(b.cnt AS DOUBLE) / u.tot, 4) + 0 AS p
      |FROM bic b JOIN unic u USING (w1)
      |WHERE b.cnt >= 10
      |ORDER BY w1, w2""".stripMargin

  // ---- 87. Theta-sketch distinct-count set algebra: how many distinct
  // bigrams does each language pair share? HLL can answer |A| and
  // |A u B| only; the theta sketch retains its KMV hash sample, so
  // intersection and difference estimates come from the SAME per-group
  // aggregation pass — no second scan, no pairwise re-aggregation. The
  // pairwise combine runs over #groups^2/2 sketch pairs (driver-scale),
  // never over the corpus. Exact while each pair union retains < 2^15
  // hashes (the fixture's bigram space, oracle-checked bit-for-bit);
  // documented ~1/sqrt(2^15) KMV error beyond (SketchSpec drives the
  // sampling regime with an undersized sketch). ----
  val q87_theta_setops: Q = (s, dir) => {
    import graft.functions.ThetaSketchFuncs._
    val sk = langBigrams(s, dir)
      .groupBy("lang").agg(theta_sketch_agg(col("bg"), 15).as("th"))
    val a = sk.select(col("lang").as("lang_a"), col("th").as("th_a"))
    val b = sk.select(col("lang").as("lang_b"), col("th").as("th_b"))
    a.join(broadcast(b), col("lang_a") < col("lang_b"))
      .select(col("lang_a"), col("lang_b"),
        theta_estimate(col("th_a")).as("n_a"),
        theta_estimate(col("th_b")).as("n_b"),
        theta_intersect_estimate(col("th_a"), col("th_b")).as("n_shared"),
        theta_anotb_estimate(col("th_a"), col("th_b")).as("n_only_a"),
        theta_union_estimate(col("th_a"), col("th_b")).as("n_union"))
      .orderBy("lang_a", "lang_b")
  }

  val q87_theta_setops_sql: String =
    """WITH bg AS (
      |  SELECT DISTINCT lang, bgr AS bg FROM (
      |    SELECT lang, unnest([ws[i] || ' ' || ws[i+1]
      |      FOR i IN range(1, len(ws))]) AS bgr
      |    FROM (SELECT lang, string_split(lower(text), ' ') AS ws
      |          FROM documents)
      |    WHERE len(ws) >= 2
      |  )
      |), c AS (
      |  SELECT lang, count(*) AS n FROM bg GROUP BY 1
      |), i AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS shared
      |  FROM bg a JOIN bg b ON a.bg = b.bg AND a.lang < b.lang
      |  GROUP BY 1, 2
      |)
      |SELECT ca.lang AS lang_a, cb.lang AS lang_b, ca.n AS n_a, cb.n AS n_b,
      |  coalesce(i.shared, 0) AS n_shared,
      |  ca.n - coalesce(i.shared, 0) AS n_only_a,
      |  ca.n + cb.n - coalesce(i.shared, 0) AS n_union
      |FROM c ca JOIN c cb ON ca.lang < cb.lang
      |LEFT JOIN i ON i.lang_a = ca.lang AND i.lang_b = cb.lang
      |ORDER BY lang_a, lang_b""".stripMargin

  // ---- 89. Snapshot diff (CDC between crawls): classify every doc_id
  // across two corpus snapshots as added / removed / changed /
  // unchanged by comparing content hashes. The shape is ONE full-outer
  // sort-merge join co-partitioned on the key — both snapshots shuffle
  // exactly once, the hash compare is per-row, and the verdict rollup
  // is a map-side-combined count. This is how a 100 TB crawl delta is
  // computed without re-reading unchanged content downstream. The two
  // snapshots are deterministic slices of the fixture: A = doc_id%3!=0,
  // B = doc_id%5!=0 with every doc_id%7==0 doc "re-crawled" (content
  // suffixed), so all four verdicts occur. ----
  val q89_snapshot_diff: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val a = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("ha"))
    val b = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), md5(
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("hb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged").as("verdict"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("verdict")
  }

  val q89_snapshot_diff_sql: String =
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS ha FROM documents WHERE doc_id % 3 <> 0
      |), b AS (
      |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
      |                          ELSE text END) AS hb
      |  FROM documents WHERE doc_id % 5 <> 0
      |), d AS (
      |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |    CASE WHEN a.ha IS NULL THEN 'added'
      |         WHEN b.hb IS NULL THEN 'removed'
      |         WHEN a.ha <> b.hb THEN 'changed'
      |         ELSE 'unchanged' END AS verdict
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |)
      |SELECT verdict, count(*) AS n, min(doc_id) AS min_id,
      |  max(doc_id) AS max_id
      |FROM d GROUP BY 1 ORDER BY verdict""".stripMargin

  // ---- 92. Perplexity filtering: score every document by its average
  // negative log-likelihood under the corpus bigram LM (the CCNet-style
  // quality filter — a document whose bigrams are improbable under the
  // corpus distribution is boilerplate, spam, or the wrong language).
  // Shapes: the LM is q86's two map-side-combined aggs; scoring joins
  // doc bigrams to the LM on (w1, w2) — an equi-join that shuffles the
  // bigram stream once (no broadcast hint: at corpus scale the LM is
  // itself large; AQE broadcasts it when it is small). The top-k
  // outlier pick is a TakeOrderedAndProject, never a global sort.
  // Float determinism: per-bigram -ln(p) is scaled x1e6 and rounded to
  // BIGINT before summing (the q76/q90 trick), so the per-doc sum is
  // integer arithmetic and partitioning cannot move it.
  //
  // Pass structure: the corpus is exploded twice — once for the LM's
  // bigram counts (a map-side-combined agg whose output is vocab²-
  // sized) and once for scoring (the only fact-sized shuffle, on
  // (w1, w2)). The unigram prefix totals DERIVE from the bigram counts
  // (cnt(w1) = sum_w2 cnt(w1,w2)) — a third corpus pass would buy
  // nothing. The tempting "aggregate per-doc bigrams first and reuse
  // one exchange" variant was measured SLOWER at sf0.1 (synthetic and
  // real text alike have few repeated bigrams per doc, so the
  // pre-aggregation pays a fact-sized wide shuffle and Spark's
  // exchange reuse only partially unifies the branches); corpus scans
  // pipeline at I/O speed and are the cheap part of this plan at any
  // scale.
  val q92_perplexity: Q = (s, dir) => {
    val pairs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("lang"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val uni = big.groupBy("w1").agg(sum("cnt").as("tot"))
    val lm = big.join(uni, "w1")
      .withColumn("nll_u6",
        round(-log(col("cnt").cast("double") / col("tot")) * 1e6, 0)
          .cast("long"))
      .select("w1", "w2", "nll_u6")
    pairs.join(lm, Seq("w1", "w2"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bg"), sum("nll_u6").as("sum_nll"))
      .select(col("doc_id"), col("lang"), col("n_bg"),
        round(col("sum_nll").cast("double") / col("n_bg"), 0)
          .cast("long").as("avg_nll_u6"))
      .orderBy(col("avg_nll_u6").desc, col("doc_id"))
      .limit(20)
  }

  val q92_perplexity_sql: String =
    """WITH ws AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
      |  FROM documents
      |), pairs AS (
      |  SELECT doc_id, lang, unnest([{'w1': ws[i], 'w2': ws[i+1]}
      |    FOR i IN range(1, len(ws))]) AS bg
      |  FROM ws WHERE len(ws) >= 2
      |), p2 AS (
      |  SELECT doc_id, lang, bg.w1 AS w1, bg.w2 AS w2 FROM pairs
      |), bic AS (
      |  SELECT w1, w2, count(*) AS cnt FROM p2 GROUP BY 1, 2
      |), unic AS (
      |  SELECT w1, count(*) AS tot FROM p2 GROUP BY 1
      |), lm AS (
      |  SELECT b.w1, b.w2, CAST(round(
      |      -ln(CAST(b.cnt AS DOUBLE) / u.tot) * 1e6, 0) AS BIGINT)
      |    AS nll_u6
      |  FROM bic b JOIN unic u USING (w1)
      |), scored AS (
      |  SELECT p.doc_id, p.lang, count(*) AS n_bg,
      |    sum(m.nll_u6) AS sum_nll
      |  FROM p2 p JOIN lm m ON p.w1 = m.w1 AND p.w2 = m.w2
      |  GROUP BY 1, 2
      |)
      |SELECT doc_id, lang, CAST(n_bg AS BIGINT) AS n_bg,
      |  CAST(round(CAST(sum_nll AS DOUBLE) / n_bg, 0) AS BIGINT)
      |    AS avg_nll_u6
      |FROM scored
      |ORDER BY avg_nll_u6 DESC, doc_id LIMIT 20""".stripMargin

  // ---- 96. Weighted sampling without replacement (Efraimidis-Spirakis
  // A-ES): sample 100 documents with inclusion probability proportional
  // to weight (n_chars — longer documents carry more training tokens).
  // Each row's rank key is u^(1/w) — maximized equivalently as
  // ln(u)/w — with the uniform u derived from an md5 bucket of the doc
  // key, NOT rand(): the sample is a pure function of the data
  // (reproducible under any partitioning/retry, oracle-checkable), and
  // the top-k pick plans as TakeOrderedAndProject (k-heap per task, no
  // global sort) exactly like q82. This is the quality-weighted
  // sampling step of a data-mixing pipeline, where "weight" is a
  // quality or domain score. ----
  val q96_weighted_sample: Q = (s, dir) => {
    val SampleN = 100
    t(s, dir, "documents")
      .withColumn("u",
        (md5Bucket(col("doc_id"), 8) + 1L).cast("double") /
          lit(4294967296.0))
      // greatest(w, 1): a zero-length doc would make the key -Inf (or
      // NaN when u = 1, since ln(1)/0 = 0/0), and NaN sorts LARGEST in
      // both Spark and DuckDB — a zero-weight row must not win a slot
      .withColumn("skey",
        dround(log(col("u")) /
          greatest(col("n_chars").cast("double"), lit(1.0)), 9))
      .select("doc_id", "source", "n_chars", "skey")
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(SampleN)
  }

  val q96_weighted_sample_sql: String =
    """WITH keyed AS (
      |  SELECT doc_id, source, n_chars,
      |    round(ln(CAST(CAST(concat('0x',
      |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1
      |      AS DOUBLE) / 4294967296.0)
      |      / CAST(greatest(n_chars, 1) AS DOUBLE), 9) + 0 AS skey
      |  FROM documents
      |)
      |SELECT doc_id, source, n_chars, skey FROM keyed
      |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin

  // ---- 93. Mergeable streaming quantiles: per-event-type KLL sketch
  // over `value`. The 100 TB quantile path — q61 sorts each group
  // exactly, q84 samples; KLL gives a PROVEN worst-case rank error
  // (~1.33% of N at k=200) in O(k log(N/k)) memory with sketch-merge
  // partial aggregation, so the shuffle carries one ~2 KB sketch per
  // group per mapper regardless of row count. Rows-only by declared
  // design (KLL compaction is randomized, like Spark's own
  // approx_percentile); KllSketchSpec asserts the rank-error bound vs
  // the exact distribution, under multiple partitionings. ----
  val q93_kll_quantiles: Q = (s, dir) => {
    import graft.functions.KllFuncs._
    val sk = t(s, dir, "events")
      .groupBy("event_type")
      .agg(kll_sketch_agg(col("value"), 200).as("sk"),
        count(lit(1)).as("n"))
    sk.select(col("event_type"), col("n"),
      dround(kll_quantile(col("sk"), lit(0.25)), 4).as("p25"),
      dround(kll_quantile(col("sk"), lit(0.5)), 4).as("p50"),
      dround(kll_quantile(col("sk"), lit(0.75)), 4).as("p75"),
      dround(kll_quantile(col("sk"), lit(0.95)), 4).as("p95"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "q92_perplexity" -> q92_perplexity,
    "q93_kll_quantiles" -> q93_kll_quantiles,
    "q96_weighted_sample" -> q96_weighted_sample,
    "q89_snapshot_diff" -> q89_snapshot_diff,
    "q82_sample_bottomk" -> q82_sample_bottomk,
    "q83_heavy_hitters" -> q83_heavy_hitters,
    "q84_sample_quantiles" -> q84_sample_quantiles,
    "q85_outlier_mad" -> q85_outlier_mad,
    "q86_bigram_lm" -> q86_bigram_lm,
    "q87_theta_setops" -> q87_theta_setops)

  val oracles: Map[String, String] = Map(
    "q92_perplexity" -> q92_perplexity_sql,
    "q96_weighted_sample" -> q96_weighted_sample_sql,
    "q89_snapshot_diff" -> q89_snapshot_diff_sql,
    "q82_sample_bottomk" -> q82_sample_bottomk_sql,
    "q83_heavy_hitters" -> q83_heavy_hitters_sql,
    "q84_sample_quantiles" -> q84_sample_quantiles_sql,
    "q85_outlier_mad" -> q85_outlier_mad_sql,
    "q86_bigram_lm" -> q86_bigram_lm_sql,
    "q87_theta_setops" -> q87_theta_setops_sql)
}
