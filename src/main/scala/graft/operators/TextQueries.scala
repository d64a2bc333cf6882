package graft.operators

import graft.Tables
import graft.functions.Det.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table (builder-prompt
  * extension list): language ID, quality scoring, token counting,
  * document fingerprinting. Everything here is native `functions._`
  * (codegen'd) — per-document work is a single projection, so the whole
  * stage pipelines inside one pass over the corpus at any scale.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic and DuckDB-replicable. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "et", "de", "un", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  private def hits(lang: String) =
    size(array_intersect(col("toks"),
      array(stopwords(lang).map(lit): _*))).cast("long")

  private def sqlHits(lang: String): String = {
    val lst = stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_intersect(toks, $lst))"
  }

  // ---- 48. Language ID: stopword-hit argmax with deterministic tiebreak ----
  val q48_langid: Q = (s, dir) => {
    val langs = Seq("en", "de", "es", "fr", "zh")
    val scored = t(s, dir, "documents")
      .withColumn("toks",
        array_distinct(split(lower(col("text")), "\\s+")))
      .select(col("doc_id") +: col("lang").as("actual_lang") +:
        langs.map(l => hits(l).as(s"h_$l")): _*)
    val best = langs.map(l => col(s"h_$l")).reduce((a, b) =>
      when(a >= b, a).otherwise(b))
    val pred = langs.foldRight(lit("unk")) { (l, acc) =>
      when(col(s"h_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives en > de > es > fr > zh priority on score ties.
    scored.withColumn("pred_lang", pred)
      .groupBy("pred_lang", "actual_lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("pred_lang", "actual_lang")
  }

  val q48_langid_sql: String = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    val hitCols = langs.map(l => s"${sqlHits(l)} AS h_$l").mkString(",\n    ")
    val best = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l =>
      s"WHEN h_$l = $best AND $best > 0 THEN '$l'").mkString("\n      ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS actual_lang,
       |    $hitCols
       |  FROM (SELECT doc_id, lang,
       |          list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
       |        FROM documents)
       |)
       |SELECT CASE
       |      $cases
       |      ELSE 'unk' END AS pred_lang,
       |  actual_lang, count(*) AS cnt
       |FROM scored GROUP BY 1, 2 ORDER BY pred_lang, actual_lang""".stripMargin
  }

  // ---- 49. Quality scoring: length / stopword / punctuation ratios ----
  val q49_quality: Q = (s, dir) => {
    val en = array(stopwords("en").map(lit): _*)
    val scored = t(s, dir, "documents")
      .withColumn("ws", split(lower(col("text")), "\\s+"))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("stop_ratio",
        size(filter(col("ws"), w => array_contains(en, w))).cast("double")
          / col("n_tokens"))
      .withColumn("punct_cnt",
        (length(col("text"))
          - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long"))
      .withColumn("avg_tok_len",
        length(regexp_replace(col("text"), "\\s+", "")).cast("double")
          / col("n_tokens"))
      .withColumn("quality_bucket",
        when(col("stop_ratio") >= 0.08, "high")
          .when(col("stop_ratio") >= 0.03, "mid")
          .otherwise("low"))
    scored.groupBy("quality_bucket")
      .agg(count(lit(1)).as("cnt"),
        dround(avg("n_tokens"), 2).as("avg_tokens"),
        dround(avg("stop_ratio"), 4).as("avg_stop_ratio"),
        dround(avg("avg_tok_len"), 2).as("avg_tok_len"),
        sum("punct_cnt").as("punct_total"))
      .orderBy("quality_bucket")
  }

  val q49_quality_sql: String = {
    val lst = stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    len(ws) AS n_tokens,
       |    CAST(len(list_filter(ws, w -> list_contains($lst, w))) AS DOUBLE)
       |      / len(ws) AS stop_ratio,
       |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
       |      AS punct_cnt,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |      / len(ws) AS avg_tok_len
       |  FROM (SELECT doc_id, text,
       |          string_split_regex(lower(text), '\\s+') AS ws
       |        FROM documents)
       |)
       |SELECT CASE WHEN stop_ratio >= 0.08 THEN 'high'
       |            WHEN stop_ratio >= 0.03 THEN 'mid'
       |            ELSE 'low' END AS quality_bucket,
       |  count(*) AS cnt,
       |  round(avg(n_tokens), 2) AS avg_tokens,
       |  round(avg(stop_ratio), 4) AS avg_stop_ratio,
       |  round(avg(avg_tok_len), 2) AS avg_tok_len,
       |  CAST(sum(punct_cnt) AS BIGINT) AS punct_total
       |FROM scored GROUP BY 1 ORDER BY quality_bucket""".stripMargin
  }

  // ---- 50. Token counting: whitespace + BPE-ish regex tokenizers ----
  val q50_token_count: Q = (s, dir) =>
    t(s, dir, "documents")
      .withColumn("ws_tokens", size(split(col("text"), "\\s+")).cast("long"))
      .withColumn("re_tokens",
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("re_tokens").as("total_re_tokens"),
        dround(avg("ws_tokens"), 2).as("avg_ws_tokens"))
      .orderBy("lang")

  val q50_token_count_sql: String =
    """SELECT lang, count(*) AS docs,
      |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_ws_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
      |    AS BIGINT) AS total_re_tokens,
      |  round(avg(len(string_split_regex(text, '\s+'))), 2) AS avg_ws_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- 51. Document fingerprint: canonical word-set hash ----
  // Near-dup docs (same vocabulary, different order) collide on the
  // fingerprint — a cheap first-pass dedup key at any scale.
  val q51_fingerprint: Q = (s, dir) =>
    t(s, dir, "documents")
      .withColumn("fp", md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), "\\s+"))))))
      .groupBy("fp")
      .agg(count(lit(1)).as("copies"), min("doc_id").as("keeper"))
      .filter(col("copies") > 1)
      .orderBy("fp")

  val q51_fingerprint_sql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(
      |    string_split_regex(lower(text), '\s+'))), ' ')) AS fp,
      |  count(*) AS copies, min(doc_id) AS keeper
      |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fp""".stripMargin

  // ---- 70. End-to-end training-data pipeline (composition showcase):
  // language filter -> token-count quality gate -> exact dedup
  // (keep-first per content hash) -> embedding-coverage join ->
  // per-source acceptance stats. One window + one broadcastable join on
  // top of single-pass projections — the whole curation flow is three
  // shuffles at any corpus size.
  val q70_pipeline: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .withColumn("toks",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .filter(col("lang") === "en" && col("toks") >= 5)
    val kept = docs
      .withColumn("h", md5(lower(trim(col("text")))))
      .withColumn("rn",
        row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), lit(1L).as("has_emb"))
    kept.join(emb, kept("doc_id") === emb("vec_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        dround(avg("toks"), 2).as("avg_tokens"),
        sum(coalesce(col("has_emb"), lit(0L))).as("with_embedding"))
      .orderBy("source")
  }

  val q70_pipeline_sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, text,
      |    len(string_split_regex(trim(text), '\s+')) AS toks
      |  FROM documents WHERE lang = 'en'
      |), k AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
      |  FROM d WHERE toks >= 5
      |)
      |SELECT source, count(*) AS docs, round(avg(toks), 2) AS avg_tokens,
      |  CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS with_embedding
      |FROM k LEFT JOIN embeddings e ON k.doc_id = e.vec_id
      |WHERE rn = 1
      |GROUP BY source ORDER BY source""".stripMargin

  // ---- 90. Token-distribution entropy + KL divergence per language:
  // the distribution-shift diagnostics a corpus pipeline runs per slice
  // (is this shard's unigram distribution drifting from the corpus?).
  // Shapes: token counts are ONE map-side-combined shuffle. The
  // per-lang totals (`lt`, one row per language) and the grand total
  // (`ct`, one row) are bounded — those broadcasts are safe at any
  // scale. The per-term corpus counts (`cc`) are vocabulary-sized and
  // thus unbounded on a web corpus, so that join is hint-free: `lc`
  // and `cc` are both term-keyed aggregates, an unhinted equi-join
  // co-partitions them in one exchange each, and AQE still broadcasts
  // when the measured size is small (PlanAuditSpec enforces no
  // corpus-side ResolvedHint). Float determinism: each per-term contribution is
  // scaled x1e6 and rounded to a BIGINT **before** the sum (the q76
  // trick), so the aggregate is integer arithmetic — summation order
  // (= partitioning) cannot move the result, and DuckDB matches
  // bit-for-bit. ----
  val q90_entropy_kl: Q = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("lang"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val lc = toks.groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
    val lt = lc.groupBy("lang").agg(sum("cnt").as("tot"))
    val cc = toks.groupBy("term").agg(count(lit(1)).as("ccnt"))
    val ct = cc.agg(sum("ccnt").as("ctot"))
    val p = col("cnt").cast("double") / col("tot")
    val q = col("ccnt").cast("double") / col("ctot")
    lc.join(broadcast(lt), "lang")
      .join(cc, "term")
      .crossJoin(broadcast(ct))
      .select(col("lang"),
        round(-p * log(p) * 1e6, 0).cast("long").as("h_term"),
        round(p * log(p / q) * 1e6, 0).cast("long").as("kl_term"))
      .groupBy("lang")
      .agg(sum("h_term").as("entropy_u6"), sum("kl_term").as("kl_u6"))
      .orderBy("lang")
  }

  val q90_entropy_kl_sql: String =
    """WITH toks AS (
      |  SELECT lang, t.term FROM (
      |    SELECT lang, unnest(string_split(lower(text), ' ')) AS term
      |    FROM documents
      |  ) t WHERE len(term) > 0
      |), lc AS (
      |  SELECT lang, term, count(*) AS cnt FROM toks GROUP BY 1, 2
      |), lt AS (
      |  SELECT lang, sum(cnt) AS tot FROM lc GROUP BY 1
      |), cc AS (
      |  SELECT term, count(*) AS ccnt FROM toks GROUP BY 1
      |), ct AS (
      |  SELECT sum(ccnt) AS ctot FROM cc
      |), terms AS (
      |  SELECT lc.lang,
      |    CAST(round(-(CAST(cnt AS DOUBLE) / tot) *
      |      ln(CAST(cnt AS DOUBLE) / tot) * 1e6, 0) AS BIGINT) AS h_term,
      |    CAST(round((CAST(cnt AS DOUBLE) / tot) *
      |      ln((CAST(cnt AS DOUBLE) / tot) /
      |         (CAST(ccnt AS DOUBLE) / ctot)) * 1e6, 0) AS BIGINT) AS kl_term
      |  FROM lc JOIN lt USING (lang) JOIN cc USING (term) CROSS JOIN ct
      |)
      |SELECT lang, CAST(sum(h_term) AS BIGINT) AS entropy_u6,
      |  CAST(sum(kl_term) AS BIGINT) AS kl_u6
      |FROM terms GROUP BY lang ORDER BY lang""".stripMargin

  // ---- 91. PII detection + redaction: mask emails, phone numbers and
  // IPv4 addresses before a corpus ships to training. One codegen'd
  // projection per document (three regexp_replace passes + three
  // regexp_extract_all counts) — scan-speed at any SF, no shuffle until
  // the tiny per-segment rollup. The fixture corpus contains no PII, so
  // the input is a deterministic contact-card string derived from the
  // customer table (same technique as q89's synthesized snapshots); the
  // REDACTION operator itself is exactly what would run over a real
  // crawl. `n_residual` re-scans the redacted text with the same
  // patterns — it must come back 0, making "redaction actually
  // removed the PII" an oracle-checked invariant rather than a claim.
  // Regexes are restricted to the syntax Java and RE2 share (character
  // classes, bounded repetition; no backrefs/lookarounds), so Spark and
  // DuckDB see identical semantics.
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhonePat = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val IpPat = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  val q91_pii_redact: Q = (s, dir) => {
    val contact = concat(
      lit("Reach "), col("c_name"), lit(" at "),
      lower(regexp_replace(col("c_name"), "#", "")),
      lit("-"), col("c_custkey").cast("string"),
      lit("@mail"), col("c_nationkey").cast("string"),
      lit(".example.com or +1-"),
      lpad(((col("c_custkey") * 7) % 1000).cast("string"), 3, "0"),
      lit("-555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (col("c_custkey") % 256).cast("string"),
      lit("."), (col("c_nationkey") % 256).cast("string"),
      lit("."), ((col("c_custkey") * 3) % 256).cast("string"))
    val red = t(s, dir, "customer")
      .withColumn("txt", contact)
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col("txt"),
          EmailPat, "[EMAIL]"), PhonePat, "[PHONE]"), IpPat, "[IP]"))
      .withColumn("n_email",
        size(regexp_extract_all(col("txt"), lit(EmailPat), lit(0)))
          .cast("long"))
      .withColumn("n_phone",
        size(regexp_extract_all(col("txt"), lit(PhonePat), lit(0)))
          .cast("long"))
      .withColumn("n_ip",
        size(regexp_extract_all(col("txt"), lit(IpPat), lit(0)))
          .cast("long"))
      .withColumn("residual",
        when(col("redacted").rlike(EmailPat) ||
          col("redacted").rlike(PhonePat) ||
          col("redacted").rlike(IpPat), 1L).otherwise(0L))
    red.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"), sum("n_email").as("n_email"),
        sum("n_phone").as("n_phone"), sum("n_ip").as("n_ip"),
        sum("residual").as("n_residual"))
      .orderBy("c_mktsegment")
  }

  val q91_pii_redact_sql: String =
    """WITH src AS (
      |  SELECT c_mktsegment,
      |    'Reach ' || c_name || ' at ' ||
      |    lower(regexp_replace(c_name, '#', '', 'g')) || '-' ||
      |    CAST(c_custkey AS VARCHAR) ||
      |    '@mail' || CAST(c_nationkey AS VARCHAR) ||
      |    '.example.com or +1-' ||
      |    lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') ||
      |    '-555-' ||
      |    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
      |    ' from 10.' || CAST(c_custkey % 256 AS VARCHAR) ||
      |    '.' || CAST(c_nationkey % 256 AS VARCHAR) ||
      |    '.' || CAST((c_custkey * 3) % 256 AS VARCHAR) AS txt
      |  FROM customer
      |), red AS (
      |  SELECT c_mktsegment, txt,
      |    regexp_replace(regexp_replace(regexp_replace(txt,
      |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |      '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      |      '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g') AS redacted
      |  FROM src
      |)
      |SELECT c_mktsegment, count(*) AS n_rows,
      |  CAST(sum(len(regexp_extract_all(txt,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT) AS n_email,
      |  CAST(sum(len(regexp_extract_all(txt,
      |    '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT) AS n_phone,
      |  CAST(sum(len(regexp_extract_all(txt,
      |    '([0-9]{1,3}\.){3}[0-9]{1,3}'))) AS BIGINT) AS n_ip,
      |  CAST(sum(CASE WHEN
      |      regexp_matches(redacted, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')
      |      OR regexp_matches(redacted, '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')
      |      OR regexp_matches(redacted, '([0-9]{1,3}\.){3}[0-9]{1,3}')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_residual
      |FROM red GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // ---- 117. BM25 keyword ranking (Robertson/Sparck Jones) — the
  // scoring layer q109's inverted-index keyword search lacks: given a
  // query term set, rank documents by sum over matched terms of
  // idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), k1=1.2,
  // b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
  //
  // Scale shapes: the token explode is FILTERED to the query's terms
  // before anything shuffles (a |q|-term IN-list the scan evaluates),
  // so tf is a map-side-combined groupBy over matched postings only;
  // df is |q| rows; doc length dl is a zero-shuffle projection
  // (size(split)), joined back broadcast; corpus stats (N, avgdl) are
  // ONE aggregated row crossJoin-broadcast (the q79 pattern); the
  // final top-20 is TakeOrderedAndProject, never a global sort. The
  // corpus table shuffles exactly once, on (doc_id, term) of matched
  // postings. ----
  val q117_bm25: Q = (s, dir) => {
    val (k1, b) = (1.2, 0.75)
    val qTerms = Seq("dup", "spark") // one rare (high idf), one common
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .withColumn("dl", size(col("ws")))
    val stats = docs.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(dround(sum("w"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val q117_bm25_sql: String =
    """WITH toks AS (
      |  SELECT doc_id, len(string_split(lower(text), ' ')) AS dl,
      |    unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents
      |),
      |stats AS (
      |  SELECT count(*) AS n, avg(len(string_split(lower(text), ' '))) AS avgdl
      |  FROM documents
      |),
      |tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf FROM toks
      |  WHERE term IN ('dup', 'spark') GROUP BY 1, 2, 3
      |),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      |SELECT doc_id,
      |  round(sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
      |    tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))), 4)
      |    + 0 AS score
      |FROM tf JOIN df USING (term) CROSS JOIN stats
      |GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "q117_bm25" -> q117_bm25,
    "q91_pii_redact" -> q91_pii_redact,
    "q90_entropy_kl" -> q90_entropy_kl,
    "q48_langid" -> q48_langid,
    "q49_quality" -> q49_quality,
    "q50_token_count" -> q50_token_count,
    "q51_fingerprint" -> q51_fingerprint,
    "q70_pipeline" -> q70_pipeline)

  val oracles: Map[String, String] = Map(
    "q117_bm25" -> q117_bm25_sql,
    "q91_pii_redact" -> q91_pii_redact_sql,
    "q90_entropy_kl" -> q90_entropy_kl_sql,
    "q48_langid" -> q48_langid_sql,
    "q49_quality" -> q49_quality_sql,
    "q50_token_count" -> q50_token_count_sql,
    "q51_fingerprint" -> q51_fingerprint_sql,
    "q70_pipeline" -> q70_pipeline_sql)
}
