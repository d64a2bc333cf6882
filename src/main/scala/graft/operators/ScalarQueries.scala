package graft.operators

import graft.Tables
import graft.functions.Det.dround
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function, subquery, streaming-equivalent and UDF surface
  * (SURVEY.md §2B rows 21-29 and 33).
  *
  * Cross-engine alignment notes (Spark vs the DuckDB oracle):
  *  - Spark `regexp_replace` is global; DuckDB needs the 'g' flag.
  *  - Spark `length`/`month`/`datediff`/... return Int — cast to long
  *    to match DuckDB's BIGINT.
  *  - DuckDB `date_trunc('month', ts)` yields DATE — both sides cast.
  *  - Spark `log` is natural log — DuckDB side uses `ln` (its `log` is
  *    base-10).
  *  - `element_at(split(...), n)` is NULL past the end in Spark but ''
  *    from DuckDB's split_part — coalesce to '' on the Spark side.
  * All functions here are built-in `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd) — no UDFs except the §2B#33 UDF/UDAF rows,
  * which exist precisely to exercise the UDF surface.
  */
object ScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- 21. String functions ----
  val q21_string: Q = (s, dir) =>
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("ub"),
        lower(col("p_type")).as("lt"),
        substring(col("p_name"), 1, 8).as("s8"),
        length(col("p_name")).cast("long").as("len"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
        coalesce(element_at(split(col("p_name"), " "), 2), lit(""))
          .as("word2"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("re1"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("rr"),
        col("p_name").like("%wid%").as("is_widget"))
      .orderBy("p_partkey")

  val q21_string_sql: String =
    """SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
      |  substring(p_name, 1, 8) AS s8, length(p_name) AS len,
      |  trim(concat(' ', p_name, ' ')) AS tr,
      |  split_part(p_name, ' ', 2) AS word2,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS re1,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS rr,
      |  p_name LIKE '%wid%' AS is_widget
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- 22. Date/time functions ----
  val q22_date: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 300)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          .cast("long").as("days_since"),
        to_date(col("o_orderdate")).as("od"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  val q22_date_sql: String =
    """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mon,
      |  day(o_orderdate) AS dom,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  CAST(o_orderdate AS DATE) AS od,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin

  val q22b_date_agg: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("cnt"),
        dround(sum("o_totalprice"), 2).as("total"))
      .orderBy("yr")

  val q22b_date_agg_sql: String =
    """SELECT year(o_orderdate) AS yr, count(*) AS cnt,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // ---- 23. Math functions ----
  val q23_math: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"),
        dround(sqrt(col("l_extendedprice")), 4).as("sq"),
        abs(col("l_discount") - 0.05).as("ab"),
        dround(pow(col("l_quantity"), 2), 2).as("pw"),
        dround(log(col("l_quantity") + 1), 4).as("lg"),
        floor(col("l_extendedprice")).cast("long").as("fl"),
        ceil(col("l_extendedprice")).cast("long").as("ce"),
        (col("l_orderkey") % 7).as("md"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  val q23_math_sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  round(sqrt(l_extendedprice), 4) AS sq,
      |  abs(l_discount - 0.05) AS ab,
      |  round(pow(l_quantity, 2), 2) AS pw,
      |  round(ln(l_quantity + 1), 4) AS lg,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      |  l_orderkey % 7 AS md
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  // ---- 24. Conditional: CASE WHEN / coalesce / nullif / greatest / least ----
  val q24_conditional: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 250000, "mid")
          .otherwise("high").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("X")).as("st"),
        least(col("o_totalprice"), lit(200000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floored"))
      .groupBy("bucket", "st")
      .agg(count(lit(1)).as("cnt"),
        dround(sum("capped"), 2).as("sum_capped"),
        dround(sum("floored"), 2).as("sum_floored"))
      .orderBy("bucket", "st")

  val q24_conditional_sql: String =
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
      |            WHEN o_totalprice < 250000 THEN 'mid'
      |            ELSE 'high' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'F'), 'X') AS st,
      |  count(*) AS cnt,
      |  round(sum(least(o_totalprice, 200000)), 2) AS sum_capped,
      |  round(sum(greatest(o_totalprice, 50000)), 2) AS sum_floored
      |FROM orders GROUP BY 1, 2 ORDER BY bucket, st""".stripMargin

  // ---- 24b. Missing-data handling (DataFrameNaFunctions): nulls are
  // introduced deterministically (negative balances, one segment), then
  // na.fill / na.replace / na.drop clean them — the mirror of the CASE
  // expressions the oracle runs. All three stay inside one codegen'd
  // projection; no NA API call adds a shuffle. ----
  val q24b_na_handling: Q = (s, dir) =>
    t(s, dir, "customer")
      .withColumn("bal",
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      .na.fill(Map("bal" -> 0.0))
      .na.replace("seg", Map("HOUSEHOLD" -> "HH"))
      .na.drop(Seq("seg"))
      .groupBy("seg")
      .agg(count(lit(1)).as("cnt"), dround(sum("bal"), 2).as("bal_sum"))
      .orderBy("seg")

  val q24b_na_handling_sql: String =
    """SELECT CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 'HH'
      |            ELSE c_mktsegment END AS seg,
      |  count(*) AS cnt,
      |  round(sum(CASE WHEN c_acctbal < 0 THEN 0 ELSE c_acctbal END), 2)
      |    AS bal_sum
      |FROM customer WHERE c_mktsegment <> 'BUILDING'
      |GROUP BY 1 ORDER BY seg""".stripMargin

  // ---- 25c. Pairwise token-set overlap (array_intersect/union/except):
  // adjacent documents joined on doc_id+1, set sizes as exact integers —
  // the algebra behind every set-similarity metric, with no floating
  // point anywhere. The adjacency join shuffles on the id only. ----
  val q25c_token_overlap: Q = (s, dir) => {
    val d = t(s, dir, "documents").select(col("doc_id"),
      array_distinct(split(trim(col("text")), "\\s+")).as("ts"))
    val b = d.select((col("doc_id") - 1).as("doc_id"), col("ts").as("ts2"))
    d.join(b, "doc_id")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        size(array_intersect(col("ts"), col("ts2"))).cast("long").as("inter"),
        size(array_union(col("ts"), col("ts2"))).cast("long").as("uni"),
        size(array_except(col("ts"), col("ts2"))).cast("long").as("only_a"))
      .orderBy("doc_id")
  }

  val q25c_token_overlap_sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_distinct(string_split_regex(trim(text), '\s+')) AS ts
      |  FROM documents
      |)
      |SELECT a.doc_id,
      |  CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS inter,
      |  CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS BIGINT) AS uni,
      |  CAST(len(list_filter(a.ts, x -> NOT list_contains(b.ts, x)))
      |    AS BIGINT) AS only_a
      |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
      |WHERE a.doc_id % 10 = 0
      |ORDER BY a.doc_id""".stripMargin

  // ---- 24c. FILTER-clause conditional aggregation: per-group metrics
  // over different predicates in ONE pass (no self-joins, no separate
  // scans per condition) — the idiomatic way to compute a metrics panel
  // at scale. ----
  val q24c_filtered_agg: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("cnt"),
        count_if(col("l_quantity") > 25).as("big_qty"),
        count_if(col("l_discount") === 0.0).as("no_disc"),
        dround(sum(when(col("l_linestatus") === "F", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("f_price"))
      .orderBy("l_returnflag")

  val q24c_filtered_agg_sql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  count(*) FILTER (WHERE l_quantity > 25) AS big_qty,
      |  count(*) FILTER (WHERE l_discount = 0.0) AS no_disc,
      |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice
      |            ELSE 0.0 END), 2) AS f_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 21b. Edit-distance matching (levenshtein): fuzzy joins and
  // canonicalization both reduce to it. Distances are integers —
  // bit-identical across engines — and the candidate space is a small
  // dimension crossed with itself, not the fact table. ----
  val q21b_edit_distance: Q = (s, dir) => {
    val names = t(s, dir, "nation").select(col("n_name").as("a"))
    val names2 = t(s, dir, "nation").select(col("n_name").as("b"))
    names.crossJoin(names2)
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= 6)
      .orderBy("a", "b")
  }

  val q21b_edit_distance_sql: String =
    """SELECT a, b, levenshtein(a, b) AS dist FROM (
      |  SELECT n1.n_name AS a, n2.n_name AS b
      |  FROM nation n1, nation n2 WHERE n1.n_name < n2.n_name
      |) WHERE levenshtein(a, b) <= 6
      |ORDER BY a, b""".stripMargin

  // ---- 25. Array functions (embeddings.embedding: array<float>) ----
  val q25_array: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        dround(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 4)
          .as("l2_norm"),
        // Nested outputs are serialized to strings so the driver's pandas
        // comparator can hash them; scaled-long (round(x*1e4)) avoids
        // double-to-string formatting differences between engines.
        concat_ws(",", transform(slice(col("embedding"), 1, 3),
          x => round(x.cast("double") * 10000).cast("long").cast("string")))
          .as("head3"),
        concat_ws(",", sort_array(transform(slice(col("embedding"), 1, 3),
          x => round(x.cast("double") * 10000).cast("long")))
          .cast("array<string>")).as("head3_sorted"),
        array_contains(transform(col("embedding"),
          x => dround(x.cast("double"), 2)), 0.0).as("has_zero"))
      .orderBy("vec_id")

  val q25_array_sql: String =
    """SELECT vec_id, len(embedding) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_val,
      |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x * x))), 4) AS l2_norm,
      |  array_to_string(list_transform(embedding[1:3],
      |    x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)), ',') AS head3,
      |  array_to_string(list_sort(list_transform(embedding[1:3],
      |    x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))), ',') AS head3_sorted,
      |  list_contains(list_transform(embedding,
      |    x -> round(CAST(x AS DOUBLE), 2) + 0), 0.0) AS has_zero
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- 25b. explode / posexplode ----
  val q25b_posexplode: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("vec_id"), col("p").cast("long").as("pos"),
        col("v").cast("double").as("val"))
      .orderBy("vec_id", "pos")

  // DuckDB's lateral generate_series can't reference a column; every
  // embedding in the fixture data is 64-dim at all scale factors.
  val q25b_posexplode_sql: String =
    """SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
      |  CAST(embedding[i] AS DOUBLE) AS val
      |FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20) e,
      |  generate_series(1, 64) AS g(i)
      |ORDER BY vec_id, pos""".stripMargin

  // ---- 26. Struct / map access (events.props JSON -> struct -> map) ----
  val q26_struct_map: Q = (s, dir) => {
    val parsed = t(s, dir, "events")
      .withColumn("js", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .withColumn("k_val", col("js.k"))
    // map_keys/map_values outputs serialized to strings (scalar columns)
    // for the driver's pandas comparator; NULL values spelled out so both
    // engines agree (concat_ws would silently drop them).
    parsed.select(
      col("event_id"),
      col("k_val"),
      concat_ws(",", map_keys(map(lit("k"), col("k_val")))).as("mk"),
      concat_ws(",", transform(map_values(map(lit("k"), col("k_val"))),
        v => coalesce(v.cast("string"), lit("null")))).as("mv"))
      .orderBy("event_id")
  }

  val q26_struct_map_sql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  array_to_string(map_keys(MAP(['k'],
      |    [CAST(json_extract_string(props, '$.k') AS BIGINT)])), ',') AS mk,
      |  array_to_string(list_transform(map_values(MAP(['k'],
      |    [CAST(json_extract_string(props, '$.k') AS BIGINT)])),
      |    v -> coalesce(CAST(v AS VARCHAR), 'null')), ',') AS mv
      |FROM events ORDER BY event_id""".stripMargin

  // ---- 27. JSON extraction + aggregation ----
  val q27_json: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        dround(avg("k"), 2).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  val q27_json_sql: String =
    """SELECT event_type, count(*) AS cnt,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- 27b. VariantType (Spark 4 semi-structured path): parse_json
  // ONCE per row into a binary variant, then typed variant_get
  // extraction — vs q27's get_json_object, which re-parses the string
  // per path. With many extracted paths over 100 TB of JSON the single
  // parse is the difference between one decode and N. ----
  val q27b_variant: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "long"))
      .withColumn("k_bucket", (floor(col("k") / 10) * 10).cast("long"))
      .groupBy("event_type", "k_bucket")
      .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"))
      // k_bucket is NULL for rows whose props lack '$.k'; Spark sorts
      // NULLS FIRST by default, DuckDB NULLS LAST — pin it
      .orderBy(col("event_type"), col("k_bucket").asc_nulls_last)

  val q27b_variant_sql: String =
    """SELECT event_type,
      |  CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10)
      |    * 10 AS BIGINT) AS k_bucket,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k
      |FROM events GROUP BY 1, 2 ORDER BY event_type, k_bucket""".stripMargin

  // ---- 28. Subqueries (SQL path — Catalyst decorrelates) ----
  val q28_subquery_scalar: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q28_subquery_scalar_sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  val q28b_subquery_in: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority LIKE '1-%')
        |ORDER BY c_custkey""".stripMargin)
  }

  val q28b_subquery_in_sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderpriority LIKE '1-%')
      |ORDER BY c_custkey""".stripMargin

  val q28c_subquery_correlated: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin)
  }

  val q28c_subquery_correlated_sql: String =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---- 29. Streaming-equivalent windowed aggregation over events ----
  // Same groupBy(window(...)) shape Structured Streaming executes with a
  // watermark; oracle-checked in batch form (SURVEY §2B row 29). The
  // streaming execution itself is exercised in StreamingSpec.
  val q29_stream_tumbling: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dround(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val q29_stream_tumbling_sql: String =
    """SELECT date_trunc('hour', ts) AS win_start, event_type,
      |  count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val q29b_stream_sliding: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"))
      .orderBy("win_start", "event_type")

  val q29b_stream_sliding_sql: String =
    """SELECT w AS win_start, event_type, count(*) AS cnt
      |FROM (SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
      |                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS w,
      |             event_type
      |      FROM events)
      |GROUP BY w, event_type ORDER BY win_start, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q21_string" -> q21_string,
    "q22_date" -> q22_date,
    "q22b_date_agg" -> q22b_date_agg,
    "q23_math" -> q23_math,
    "q24_conditional" -> q24_conditional,
    "q24b_na_handling" -> q24b_na_handling,
    "q24c_filtered_agg" -> q24c_filtered_agg,
    "q25c_token_overlap" -> q25c_token_overlap,
    "q21b_edit_distance" -> q21b_edit_distance,
    "q25_array" -> q25_array,
    "q25b_posexplode" -> q25b_posexplode,
    "q26_struct_map" -> q26_struct_map,
    "q27_json" -> q27_json,
    "q27b_variant" -> q27b_variant,
    "q28_subquery_scalar" -> q28_subquery_scalar,
    "q28b_subquery_in" -> q28b_subquery_in,
    "q28c_subquery_correlated" -> q28c_subquery_correlated,
    "q29_stream_tumbling" -> q29_stream_tumbling,
    "q29b_stream_sliding" -> q29b_stream_sliding)

  val oracles: Map[String, String] = Map(
    "q21_string" -> q21_string_sql,
    "q22_date" -> q22_date_sql,
    "q22b_date_agg" -> q22b_date_agg_sql,
    "q23_math" -> q23_math_sql,
    "q24_conditional" -> q24_conditional_sql,
    "q24b_na_handling" -> q24b_na_handling_sql,
    "q24c_filtered_agg" -> q24c_filtered_agg_sql,
    "q25c_token_overlap" -> q25c_token_overlap_sql,
    "q21b_edit_distance" -> q21b_edit_distance_sql,
    "q25_array" -> q25_array_sql,
    "q25b_posexplode" -> q25b_posexplode_sql,
    "q26_struct_map" -> q26_struct_map_sql,
    "q27_json" -> q27_json_sql,
    "q27b_variant" -> q27b_variant_sql,
    "q28_subquery_scalar" -> q28_subquery_scalar_sql,
    "q28b_subquery_in" -> q28b_subquery_in_sql,
    "q28c_subquery_correlated" -> q28c_subquery_correlated_sql,
    "q29_stream_tumbling" -> q29_stream_tumbling_sql,
    "q29b_stream_sliding" -> q29b_stream_sliding_sql)
}
