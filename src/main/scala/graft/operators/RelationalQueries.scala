package graft.operators

import graft.Tables
import graft.functions.Det.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator surface (SURVEY.md §2B rows 1-20).
  *
  * Determinism discipline (oracle = DuckDB on the same parquet):
  *  - every query ends in a total-order ORDER BY (non-nullable key tiebreakers);
  *  - floating aggregates pass through ROUND(x, 2);
  *  - computed integer columns are cast to LongType to match DuckDB's BIGINT;
  *  - column names are aliased identically on both sides.
  *
  * Scale notes (the real target is ~100 TB on a 1000-executor cluster):
  *  - all aggregations are partial-agg friendly (sum/count/min/max) so
  *    map-side combine reduces shuffle volume;
  *  - dimension joins (region/nation/part/supplier) are explicitly
  *    broadcast — no shuffle of the fact table;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key only
  *    after projection, and AQE handles skew/coalescing at runtime.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Scratch dir for source/sink round-trip queries (content is
    * deterministic, derived solely from the driver's test data).
    * private[graft]: PlanAuditSpec audits sink outputs on disk. */
  private[graft] def scratch(tag: String, dir: String): String = {
    val clean = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_scratch/$clean/$tag"
  }

  // ---- 1. Parquet scan (projection + pushdown reach the scan) ----
  val q01_scan_parquet: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .filter(col("l_orderkey") < 100)
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // ordering over every output column makes the result total-ordered
      // (remaining ties are between identical rows).
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  val q01_scan_parquet_sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin

  // ---- 2. CSV / JSON scans (round-trip the parquet through text formats) ----
  val q02_scan_csv: Q = (s, dir) => {
    val p = scratch("region_csv", dir)
    t(s, dir, "region").write.mode("overwrite").option("header", "true").csv(p)
    s.read.schema(Tables.region).option("header", "true").csv(p)
      .orderBy("r_regionkey")
  }

  val q02_scan_csv_sql: String =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  val q02b_scan_json: Q = (s, dir) => {
    val p = scratch("nation_json", dir)
    t(s, dir, "nation").write.mode("overwrite").json(p)
    s.read.schema(Tables.nation).json(p).orderBy("n_nationkey")
  }

  val q02b_scan_json_sql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  // ---- 2c. Line-based text source (write tab-separated lines, read
  //          back with spark.read.text, parse, aggregate) ----
  val q02c_scan_text: Q = (s, dir) => {
    val p = scratch("docs_text", dir)
    t(s, dir, "documents")
      .select(concat_ws("\t", col("doc_id"), col("lang")).as("value"))
      .write.mode("overwrite").text(p)
    s.read.text(p)
      .select(split(col("value"), "\t").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"), sum("doc_id").as("sum_id"))
      .orderBy("lang")
  }

  val q02c_scan_text_sql: String =
    """SELECT lang, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS sum_id
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- 3. Parquet sink (write through the engine FS, re-read, aggregate) ----
  val q03_sink_parquet: Q = (s, dir) => {
    val p = scratch("lineitem_sink", dir)
    t(s, dir, "lineitem").filter(col("l_quantity") > 25)
      .write.mode("overwrite").parquet(p)
    s.read.schema(Tables.lineitem).parquet(p)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), dround(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  val q03_sink_parquet_sql: String =
    """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem WHERE l_quantity > 25
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 3b. ORC sink + scan (columnar alternative; same round-trip
  //          discipline as q03 — written by Spark, re-read, aggregated,
  //          checked against DuckDB on the original parquet) ----
  val q03b_sink_orc: Q = (s, dir) => {
    val p = scratch("orders_orc", dir)
    t(s, dir, "orders").filter(col("o_totalprice") > 150000)
      .write.mode("overwrite").orc(p)
    s.read.schema(Tables.orders).orc(p)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        dround(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val q03b_sink_orc_sql: String =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_totalprice > 150000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- 3c/3d. CSV + JSON sinks (text-format round-trips; Java's
  // shortest-round-trip double formatting makes the re-read bit-exact,
  // so the post-round-trip aggregate still hash-matches the oracle run
  // on the original parquet) ----
  val q03c_sink_csv: Q = (s, dir) => {
    val p = scratch("customer_csv", dir)
    t(s, dir, "customer").filter(col("c_acctbal") > 0)
      .write.mode("overwrite").option("header", "true").csv(p)
    s.read.schema(Tables.customer).option("header", "true").csv(p)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), dround(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_mktsegment")
  }

  val q03c_sink_csv_sql: String =
    """SELECT c_mktsegment, count(*) AS cnt,
      |  round(sum(c_acctbal), 2) AS bal
      |FROM customer WHERE c_acctbal > 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // XML via Spark 4's NATIVE xml datasource (spark-xml was merged into
  // core): same splittable-source scan pipeline as csv/json — rowTag
  // framing, schema projected at read. Supplier is the one base table
  // without a sink query; the roundtrip proves both directions.
  val q03g_sink_xml: Q = (s, dir) => {
    val p = scratch("supplier_xml", dir)
    t(s, dir, "supplier").filter(col("s_acctbal") > 0)
      .write.mode("overwrite").option("rowTag", "supplier").xml(p)
    s.read.schema(Tables.supplier).option("rowTag", "supplier").xml(p)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("cnt"), dround(sum("s_acctbal"), 2).as("bal"))
      .orderBy("s_nationkey")
  }

  val q03g_sink_xml_sql: String =
    """SELECT s_nationkey, count(*) AS cnt,
      |  round(sum(s_acctbal), 2) AS bal
      |FROM supplier WHERE s_acctbal > 0
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val q03d_sink_json: Q = (s, dir) => {
    val p = scratch("part_json", dir)
    t(s, dir, "part").filter(col("p_size") > 20)
      .write.mode("overwrite").json(p)
    s.read.schema(Tables.part).json(p)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        dround(sum("p_retailprice"), 2).as("retail"))
      .orderBy("p_brand")
  }

  val q03d_sink_json_sql: String =
    """SELECT p_brand, count(*) AS cnt,
      |  round(sum(p_retailprice), 2) AS retail
      |FROM part WHERE p_size > 20
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---- 3e. Hive-partitioned sink + partition-pruned scan. At 100 TB,
  // partitioning on a low-cardinality predicate column is THE difference
  // between scanning the table and scanning one directory: the re-read's
  // event_type filter never touches non-matching files (PartitionFilters
  // in the plan, asserted by PlanAuditSpec). ----
  val q03e_sink_partitioned: Q = (s, dir) => {
    val p = scratch("events_part", dir)
    t(s, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(p)
    s.read.schema(Tables.events).parquet(p)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), dround(sum("value"), 2).as("total"))
      .orderBy("day")
  }

  val q03e_sink_partitioned_sql: String =
    """SELECT CAST(ts AS DATE) AS day, count(*) AS cnt,
      |  round(sum(value), 2) + 0 AS total
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY day""".stripMargin

  // ---- 3f. Small-file compaction: the maintenance op every long-lived
  // 100 TB table needs. A fragmented write (64 shards here) is rewritten
  // with coalesce(4) — a NARROW dependency that merges partitions
  // without a shuffle (repartition(4) would shuffle every byte) — and
  // the compacted table must read back byte-identical in content. The
  // oracle aggregates the original table; file counts are asserted
  // locally since DuckDB can't see them.
  val q03f_compact: Q = (s, dir) => {
    val frag = scratch("events_frag", dir)
    val comp = scratch("events_comp", dir)
    t(s, dir, "events").repartition(64)
      .write.mode("overwrite").parquet(frag)
    s.read.schema(Tables.events).parquet(frag)
      .coalesce(4)
      .write.mode("overwrite").parquet(comp)
    s.read.schema(Tables.events).parquet(comp)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), dround(sum("value"), 2).as("total"),
        countDistinct("user_id").cast("long").as("users"))
      .orderBy("event_type")
  }

  val q03f_compact_sql: String =
    """SELECT event_type, count(*) AS cnt,
      |  round(sum(value), 2) + 0 AS total,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- 4. Projection: select / rename / computed columns ----
  val q04_project: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"),
        dround(col("l_extendedprice") * (lit(1) - col("l_discount")), 2)
          .as("net_price"),
        dround(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 2).as("charged"))
      .filter(col("l_orderkey") < 200)
      .orderBy("l_orderkey", "l_linenumber", "qty", "net_price", "charged")

  val q04_project_sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
      |  round(l_extendedprice * (1 - l_discount), 2) AS net_price,
      |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber, qty, net_price, charged""".stripMargin

  // ---- 5. Filter: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL ----
  val q05_filter: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R")
        && col("l_quantity").between(10, 30)
        && (col("l_linestatus").like("F%") || col("l_discount") > 0.08)
        && !(col("l_tax") > 0.07)
        && col("l_shipdate").isNotNull)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_tax")

  val q05_filter_sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_tax
      |FROM lineitem
      |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 30
      |  AND (l_linestatus LIKE 'F%' OR l_discount > 0.08)
      |  AND NOT (l_tax > 0.07) AND l_shipdate IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_tax""".stripMargin

  // ---- 6. Inner equi join (fact-fact: shuffle on the key, AQE-managed) ----
  val q06_join_inner: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderstatus")

  val q06_join_inner_sql: String =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- 7. Outer joins ----
  val q07_join_left: Q = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        dround(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total"))
      .orderBy("c_custkey")

  val q07_join_left_sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  round(coalesce(sum(o_totalprice), 0), 2) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  val q07b_join_full: Q = (s, dir) => {
    val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nk")
  }

  val q07b_join_full_sql: String =
    """SELECT coalesce(a.nk, b.nk) AS nk,
      |  coalesce(a.n_cust, 0) AS n_cust, coalesce(b.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) a
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) b
      |ON a.nk = b.nk ORDER BY nk""".stripMargin

  val q07c_join_right: Q = (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "right_outer")
      .groupBy("c_mktsegment")
      .agg(count(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("c_mktsegment")

  val q07c_join_right_sql: String =
    """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- 8. Semi / anti joins ----
  val q08_join_semi: Q = (s, dir) => {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q08_join_semi_sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  val q08b_join_anti: Q = (s, dir) => {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q08b_join_anti_sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // ---- 9. Broadcast-hinted dimension join (no fact shuffle at 100 TB) ----
  val q09_join_broadcast: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"), "inner")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"), dround(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand")

  val q09_join_broadcast_sql: String =
    """SELECT p_brand, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---- 10. Theta / range predicates + cross join ----
  val q10_join_range: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey")
          && col("l_quantity") > col("p_size"), "inner")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("p_brand")

  val q10_join_range_sql: String =
    """SELECT p_brand, count(*) AS cnt
      |FROM lineitem JOIN part
      |  ON l_partkey = p_partkey AND l_quantity > p_size
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val q10b_join_cross: Q = (s, dir) =>
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("combos"))
      .orderBy("r_name")

  val q10b_join_cross_sql: String =
    """SELECT r_name, count(*) AS combos
      |FROM region CROSS JOIN nation
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---- 11. Grouped aggregation (flagship, TPC-H-Q1-style) ----
  val q11_agg_pricing: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dround(sum("l_quantity"), 2).as("sum_qty"),
        dround(sum("l_extendedprice"), 2).as("sum_base_price"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        dround(avg("l_quantity"), 2).as("avg_qty"),
        dround(avg("l_extendedprice"), 2).as("avg_price"),
        dround(avg("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q11_agg_pricing_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 2) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q11b_agg_distinct: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        dround(min("l_extendedprice"), 2).as("min_price"),
        dround(max("l_extendedprice"), 2).as("max_price"))
      .orderBy("l_returnflag")

  val q11b_agg_distinct_sql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 11c. Skew-safe two-phase distinct aggregation ----
  // count(DISTINCT x) over a skewed key first dedups on (group, x) —
  // spreading one hot group across all partitions — then counts per
  // group. Same answer as COUNT(DISTINCT), but no single reducer ever
  // sees a whole hot group's raw rows; the manual form of the
  // salting/partial-dedup technique for 100 TB skew.
  val q11c_distinct_twophase: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_partkey")
      .distinct() // phase 1: shuffle on (flag, partkey) — skew-spread
      .groupBy("l_returnflag") // phase 2: tiny per-group counts
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("l_returnflag")

  val q11c_distinct_twophase_sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 12. Rollup / cube / grouping sets ----
  // Grouping columns are NOT NULL in the data, so coalescing the
  // super-aggregate NULLs to 'ALL' is unambiguous and sidesteps the
  // Spark-vs-DuckDB NULL-ordering difference.
  val q12_rollup: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(dround(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy("rf", "ls")

  val q12_rollup_sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ---- 12f. grouping()/grouping_id(): disambiguate a rollup's subtotal
  // rows from genuine NULL group values — the correct way to label
  // super-aggregate rows (the coalesce-to-'ALL' in q12 would mislabel a
  // real NULL key) ----
  val q12f_grouping_id: Q = (s, dir) =>
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        grouping("o_orderstatus").cast("long").as("g_status"),
        grouping("o_orderpriority").cast("long").as("g_prio"),
        grouping_id().as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("-")).as("st"),
        coalesce(col("o_orderpriority"), lit("-")).as("prio"),
        col("g_status"), col("g_prio"), col("gid"), col("cnt"))
      .orderBy("gid", "st", "prio")

  val q12f_grouping_id_sql: String =
    """SELECT coalesce(o_orderstatus, '-') AS st,
      |  coalesce(o_orderpriority, '-') AS prio,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
      |    AS BIGINT) AS gid,
      |  count(*) AS cnt
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY gid, st, prio""".stripMargin

  val q12b_cube: Q = (s, dir) =>
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dround(sum("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
        col("cnt"), col("total"))
      .orderBy("st", "pr")

  val q12b_cube_sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS st,
      |  coalesce(o_orderpriority, 'ALL') AS pr,
      |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY st, pr""".stripMargin

  val q12c_grouping_sets: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  val q12c_grouping_sets_sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  // ---- 12d. Pivot (wide aggregation; oracle via conditional aggs) ----
  val q12d_pivot: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dround(sum("o_totalprice"), 2))
      .withColumnsRenamed(Map("F" -> "f_total", "O" -> "o_total", "P" -> "p_total"))
      .na.fill(0.0, Seq("f_total", "o_total", "p_total"))
      .orderBy("o_orderpriority")

  val q12d_pivot_sql: String =
    """SELECT o_orderpriority,
      |  coalesce(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0) AS f_total,
      |  coalesce(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0) AS o_total,
      |  coalesce(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0) AS p_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- 11d. Ordered string aggregation (LISTAGG WITHIN GROUP):
  // deterministic because the within-group order is total ----
  val q11d_listagg: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr(
        "listagg(DISTINCT l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus)")
        .as("statuses"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  val q11d_listagg_sql: String =
    """SELECT l_returnflag,
      |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
      |    AS statuses,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 11e. Group-wise argmax via max-of-struct: struct comparison is
  // lexicographic, so max(struct(price, key)) picks the highest price
  // with a DETERMINISTIC tiebreak on the (unique) key — unlike max_by /
  // arg_max, whose tie choice is engine- and partition-order-dependent.
  // One partial-agg-friendly aggregation; no window, no self-join. ----
  val q11e_argmax: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"),
        count(lit(1)).as("cnt"))
      .select(col("o_orderpriority"),
        dround(col("m.o_totalprice"), 2).as("top_price"),
        col("m.o_orderkey").as("top_key"),
        col("cnt"))
      .orderBy("o_orderpriority")

  val q11e_argmax_sql: String =
    """SELECT o_orderpriority,
      |  round(max({'p': o_totalprice, 'k': o_orderkey}).p, 2) AS top_price,
      |  max({'p': o_totalprice, 'k': o_orderkey}).k AS top_key,
      |  count(*) AS cnt
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- 12e. UNPIVOT (melt): the inverse of q12d's pivot — wide measure
  // columns back to (key, measure, value) rows ----
  val q12e_unpivot: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(dround(sum("l_quantity"), 2).as("qty"),
        dround(sum("l_extendedprice"), 2).as("price"),
        dround(sum("l_discount"), 2).as("disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")),
        "measure", "val")
      .orderBy("l_returnflag", "measure")

  val q12e_unpivot_sql: String =
    """WITH wide AS (
      |  SELECT l_returnflag, round(sum(l_quantity), 2) AS qty,
      |    round(sum(l_extendedprice), 2) AS price,
      |    round(sum(l_discount), 2) AS disc
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, 'qty' AS measure, qty AS val FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'price', price FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'disc', disc FROM wide
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---- 13. Approx distinct (HLL) — bench-only, excluded from oracle ----
  // Datasketches HLL (hll_sketch_agg, lgConfigK=14 => 16k buckets, ~10 KB
  // constant-size mergeable sketch) instead of HLL++: a measured sweep at
  // sf0.1 put lg=14 at 0.51% max error in 0.36 s vs HLL++ rsd=0.01 at
  // 0.73% in 1.58 s — 4x faster at better accuracy for the same <= 2%
  // SketchSpec bound. (HLL++ rsd=0.02 measured 3.3% error there, so the
  // "quarter-cost same-bound" knob does not exist for HLL++; the
  // algorithm swap is the actual cheap path.)
  val q13_approx_distinct: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("approx_parts"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 14))").as("approx_orders"))
      .orderBy("l_returnflag")

  // ---- 14. Window ranking ----
  // ntile is NOT computed in the window: a non-rank-like function in the
  // window spec defeats WindowGroupLimit, forcing a full per-partition sort
  // of the fact table into (cardinality of l_returnflag) reducers. Instead
  // the window carries only rank-like functions (top-5 rows are kept
  // map-side before the exchange) and the ntile bucket is derived
  // arithmetically from broadcast group counts — SQL ntile semantics:
  // n = base*4 + rem, the first `rem` buckets hold base+1 rows.
  val q14_window_rank: Q = (s, dir) => {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val li = t(s, dir, "lineitem")
    val counts = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val baseFloor = floor(col("n") / 4)
    val rem = col("n") - baseFloor * 4
    val qt = when(col("rn") <= rem * (baseFloor + 1),
        floor((col("rn") - 1) / (baseFloor + 1)) + 1)
      .otherwise(rem +
        floor((col("rn") - rem * (baseFloor + 1) - 1) / baseFloor) + 1)
    li
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("drk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .join(broadcast(counts), "l_returnflag")
      .select(col("l_returnflag"), col("rn").cast("long").as("rn"),
        col("rk"), col("drk"), qt.cast("long").as("qt"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_returnflag", "rn")
  }

  val q14_window_rank_sql: String =
    """SELECT l_returnflag, rn, rk, drk, qt, l_orderkey, l_linenumber, l_extendedprice
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER w AS rn, rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk, ntile(4) OVER w AS qt
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_returnflag
      |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
      |) WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin

  // ---- 14b. Distribution windows: percent_rank / cume_dist ----
  // Small keyed slice (one customer's orders per partition) — these
  // functions need the whole partition by definition, so the partition
  // key (o_custkey) carries the scale, not the window.
  val q14b_window_dist: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 20)
      .withColumn("pr", dround(percent_rank().over(w), 6))
      .withColumn("cd", dround(cume_dist().over(w), 6))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("pr"), col("cd"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q14b_window_dist_sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  round(percent_rank() OVER w, 6) + 0 AS pr,
      |  round(cume_dist() OVER w, 6) + 0 AS cd
      |FROM orders WHERE o_custkey < 20
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- 15. Window analytics: lag / lead / first / last ----
  val q15_window_lag: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 30)
      .withColumn("prev_price",
        dround(coalesce(lag("o_totalprice", 1).over(w), lit(-1.0)), 2))
      .withColumn("next_price",
        dround(coalesce(lead("o_totalprice", 1).over(w), lit(-1.0)), 2))
      .withColumn("first_price", dround(first("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("last_price", dround(last("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 2))
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "prev_price", "next_price", "first_price", "last_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q15_window_lag_sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  round(coalesce(lag(o_totalprice, 1) OVER w, -1), 2) AS prev_price,
      |  round(coalesce(lead(o_totalprice, 1) OVER w, -1), 2) AS next_price,
      |  round(first_value(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_price,
      |  round(last_value(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price
      |FROM orders WHERE o_custkey < 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- 15b. nth_value + IGNORE NULLS navigation: the 2nd order per
  // customer, and the most recent non-null big-order price carried
  // forward (lead/lag cover offsets; nth_value and IGNORE NULLS are the
  // remaining navigation semantics) ----
  val q15b_nth_value: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 30)
      .withColumn("big",
        when(col("o_totalprice") > 200000, col("o_totalprice")))
      .withColumn("second_price",
        dround(coalesce(nth_value(col("o_totalprice"), 2).over(wFull),
          lit(-1.0)), 2))
      .withColumn("last_big",
        dround(coalesce(
          last(col("big"), ignoreNulls = true).over(wFull), lit(-1.0)), 2))
      .select("o_custkey", "o_orderkey", "second_price", "last_big")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q15b_nth_value_sql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(coalesce(nth_value(o_totalprice, 2) OVER w, -1), 2)
      |    AS second_price,
      |  round(coalesce(last_value(
      |    CASE WHEN o_totalprice > 200000 THEN o_totalprice END
      |    IGNORE NULLS) OVER w, -1), 2) AS last_big
      |FROM orders WHERE o_custkey < 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- 16. Framed window aggregates: running sum / avg ----
  val q16_window_running: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 30)
      .withColumn("running_total", dround(sum("o_totalprice").over(w), 2))
      .withColumn("running_avg", dround(avg("o_totalprice").over(w), 2))
      .withColumn("running_cnt", count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "running_total", "running_avg",
        "running_cnt")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q16_window_running_sql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER w, 2) AS running_total,
      |  round(avg(o_totalprice) OVER w, 2) AS running_avg,
      |  count(*) OVER w AS running_cnt
      |FROM orders WHERE o_custkey < 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- 16b. RANGE frame: peers-inclusive running aggregate ----
  // RANGE BETWEEN groups peer rows (same order key) into one frame —
  // the semantics ROWS frames can't express.
  val q16b_window_rangeframe: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_custkey"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .withColumn("range_total", dround(sum("o_totalprice").over(w), 2))
      .withColumn("range_cnt", count(lit(1)).over(w))
      .select("o_orderkey", "o_orderstatus", "o_custkey", "range_total",
        "range_cnt")
      .orderBy("o_orderkey")
  }

  val q16b_window_rangeframe_sql: String =
    """SELECT o_orderkey, o_orderstatus, o_custkey,
      |  round(sum(o_totalprice) OVER w, 2) AS range_total,
      |  count(*) OVER w AS range_cnt
      |FROM orders WHERE o_orderkey < 500
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_custkey
      |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // ---- 17. Global sort + top-k (TakeOrderedAndProject at scale) ----
  val q17_topk: Q = (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(25)

  val q17_topk_sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // ---- 18. UNION ALL / UNION DISTINCT ----
  val q18_union_all: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
    val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.union(p).groupBy("nk").agg(count(lit(1)).as("cnt")).orderBy("nk")
  }

  val q18_union_all_sql: String =
    """SELECT nk, count(*) AS cnt FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  UNION ALL SELECT s_nationkey AS nk FROM supplier
      |) GROUP BY nk ORDER BY nk""".stripMargin

  val q18b_union_distinct: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
    val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.union(p).distinct().orderBy("nk")
  }

  val q18b_union_distinct_sql: String =
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin

  // ---- 19. INTERSECT / EXCEPT ----
  val q19_intersect: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
    val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.intersect(p).orderBy("nk")
  }

  val q19_intersect_sql: String =
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin

  // Customers that never placed a >300k order (non-empty at every sf).
  val q19b_except: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_custkey").as("ck"))
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("ck"))
    c.except(o).orderBy("ck")
  }

  val q19b_except_sql: String =
    """SELECT c_custkey AS ck FROM customer
      |EXCEPT SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 300000
      |ORDER BY ck""".stripMargin

  // ---- 19c/19d. Multiset INTERSECT ALL / EXCEPT ALL (bag semantics:
  // multiplicities min / subtract, vs the set forms in q19/q19b) ----
  val q19c_intersect_all: Q = (s, dir) => {
    val a = t(s, dir, "lineitem").filter(col("l_quantity") > 25)
      .select("l_returnflag", "l_linestatus")
    val b = t(s, dir, "lineitem").filter(col("l_extendedprice") > 20000)
      .select("l_returnflag", "l_linestatus")
    a.intersectAll(b)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q19c_intersect_all_sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM (
      |  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 25
      |  INTERSECT ALL
      |  SELECT l_returnflag, l_linestatus FROM lineitem
      |  WHERE l_extendedprice > 20000
      |) GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q19d_except_all: Q = (s, dir) => {
    val a = t(s, dir, "lineitem").filter(col("l_quantity") > 25)
      .select("l_returnflag", "l_linestatus")
    // 60000 keeps the b-side SMALLER than a per group, so a non-empty
    // multiset remainder actually exercises the bag subtraction
    val b = t(s, dir, "lineitem").filter(col("l_extendedprice") > 60000)
      .select("l_returnflag", "l_linestatus")
    a.exceptAll(b)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q19d_except_all_sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM (
      |  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 25
      |  EXCEPT ALL
      |  SELECT l_returnflag, l_linestatus FROM lineitem
      |  WHERE l_extendedprice > 60000
      |) GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- 20. Exact dedup: distinct + deterministic dropDuplicates ----
  val q20_dedup_rows: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  val q20_dedup_rows_sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // Deterministic keep-first dedup (dropDuplicates has nondeterministic
  // keep semantics). The survivor is the lexicographic min of
  // (l_linenumber, l_partkey, l_suppkey) per key, computed as min over a
  // STRUCT (struct comparison is field-ordered), not as a row_number
  // window: the agg form partial-aggregates map-side, so the exchange
  // carries ONE candidate row per key instead of every duplicate, and no
  // per-partition sort ever runs — the shape that survives a corpus
  // where one key holds a million copies.
  val q20b_dedup_keyed: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(min(struct(col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))).as("f"))
      .select(col("l_orderkey"), col("f.l_linenumber").as("l_linenumber"),
        col("f.l_partkey").as("l_partkey"),
        col("f.l_quantity").as("l_quantity"))
      .orderBy("l_orderkey")

  val q20b_dedup_keyed_sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY l_orderkey
      |     ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      |  FROM lineitem
      |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  // ---- 60. Salted skew join (scale technique, oracle-identical) ----
  // The standard hot-key defense at 100 TB: the fact side gets a
  // deterministic salt, the (small) build side is replicated S ways, and
  // the join key becomes (key, salt) so one hot part key fans out over S
  // reducers instead of melting one. The salt never changes the result —
  // the oracle is the plain join.
  val q60_salted_join: Q = (s, dir) => {
    val S = 8
    val li = t(s, dir, "lineitem")
      .withColumn("salt",
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(S)))
    val pt = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        explode(sequence(lit(0), lit(S - 1))).as("salt"))
    li.join(pt,
        li("l_partkey") === pt("p_partkey") && li("salt") === pt("salt"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        dround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("p_brand")
  }

  val q60_salted_join_sql: String =
    """SELECT p_brand, count(*) AS cnt,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---- 99. Bucketed co-located join (shuffle elimination by table
  // layout). The other 100 TB join defense, complementary to q60's
  // salting: pay the shuffle ONCE at write time — both tables are
  // bucketed (hash-partitioned into a fixed file layout) and sorted on
  // the join key — and every subsequent join on that key reads
  // co-located buckets with NO Exchange on either side. At 100 TB this
  // turns the recurring dominant cost of a fact⋈fact join (re-shuffling
  // both sides per query) into a one-time layout decision; bucket count
  // scales by cluster width, 8 here for local[32]. The bucket files are
  // plain parquet at an explicit path (external table) — the catalog
  // entry carries only the layout metadata. Correctness is
  // layout-invariant: the oracle is the plain join.
  // PlanAuditSpec asserts the exchange-free SMJ with broadcast disabled.
  private[graft] def bucketedPair(s: SparkSession, dir: String): (String, String) = {
    val suf = java.lang.Integer.toHexString(dir.hashCode)
    val ot = s"graft_bucketed_orders_$suf"
    val ct = s"graft_bucketed_customer_$suf"
    // idempotent per session+dir: re-bucketing on every call would make
    // each bench iteration pay the write
    if (!s.catalog.tableExists(ot)) {
      t(s, dir, "orders").write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", scratch("bucketed_orders", dir))
        .saveAsTable(ot)
      t(s, dir, "customer").write.mode("overwrite").format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", scratch("bucketed_customer", dir))
        .saveAsTable(ct)
    }
    (ot, ct)
  }

  /** Re-attach an existing bucketed layout in a session whose catalog
    * does not know it (new cluster, in-memory catalog restart). The
    * bucket FILES carry no layout metadata — without the catalog entry
    * Spark reads them as plain parquet and silently re-shuffles every
    * join, which is the expensive failure mode of bucketing in
    * operation. `CREATE TABLE ... USING parquet CLUSTERED BY ...
    * LOCATION ...` restores the layout contract over the same files;
    * PlanAuditSpec proves the re-registered table still joins
    * exchange-free. */
  private[graft] def reattachBucketed(s: SparkSession, table: String,
      path: String, schemaDdl: String, key: String): Unit =
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $table ($schemaDdl)
         |USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
         |LOCATION '$path'""".stripMargin)

  val q99_bucketed_join: Q = (s, dir) => {
    val (ot, ct) = bucketedPair(s, dir)
    s.table(ot).join(s.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        dround(sum("o_totalprice"), 2).as("sum_total"))
      .orderBy("c_mktsegment")
  }

  val q99_bucketed_join_sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS sum_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- 61. Exact percentiles (interpolated, = DuckDB quantile_cont) ----
  // Both extendedprice percentiles share ONE aggregation buffer (array
  // form) — the buffer is a per-group value-count map, so halving buffer
  // count matters. Exact quantiles are inherently memory-heavy per group;
  // at 100 TB the declared scale path is approx_percentile (same shape as
  // q13's HLL), this query covers the exact semantics.
  val q61_percentile: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.95))).as("ps"),
        dround(percentile(col("l_quantity"), lit(0.25)), 2).as("q1_qty"))
      .select(col("l_returnflag"),
        dround(element_at(col("ps"), 1), 2).as("p50"),
        dround(element_at(col("ps"), 2), 2).as("p95"),
        col("q1_qty"))
      .orderBy("l_returnflag")

  val q61_percentile_sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
      |  round(quantile_cont(l_quantity, 0.25), 2) AS q1_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- 103. Schema evolution across write batches. A 100 TB table is
  // never rewritten when a column is added: old files keep the narrow
  // schema forever and the READER reconciles. Batch 1 is written before
  // `o_orderstatus` existed; batch 2 carries it. `mergeSchema` unions
  // the per-file schemas at planning time (name-based resolution, the
  // Delta/Iceberg evolution contract on plain parquet), old rows
  // surface NULL for the unseen column, and the query backfills the
  // declared default. The batch directories double as a partition
  // column, so batch-targeted reads still prune. ----
  val q103_schema_evolution: Q = (s, dir) => {
    val p = scratch("q103_evolved", dir)
    val o = t(s, dir, "orders")
    // v1: the schema before the status column existed
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$p/batch=1")
    // v2: evolved schema (adds o_orderstatus)
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$p/batch=2")
    s.read.option("mergeSchema", "true").parquet(p)
      .withColumn("status", coalesce(col("o_orderstatus"), lit("UNKNOWN")))
      .groupBy("status")
      .agg(count(lit(1)).as("n_orders"),
        dround(sum("o_totalprice"), 2).as("total"))
      .orderBy("status")
  }

  val q103_schema_evolution_sql: String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'UNKNOWN'
      |            ELSE o_orderstatus END AS status,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin

  // ---- 101. Top-k per group via the native bounded-heap aggregate
  // (TopKRowsAgg). The window idiom (q14's row_number <= k) shuffles
  // every surviving row to its group partition and sorts there; this
  // plans an ObjectHashAggregate whose MAP-SIDE partial keeps at most k
  // rows per group, so the exchange carries <= k rows per (group,
  // mapper) — shuffle proportional to the answer, not the corpus. The
  // trailing unique-key fields make the result deterministic and the
  // DuckDB window restatement (all fields DESC) exact. ----
  val q101_topk_group: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.functions.TopKAgg.top_k_rows(
        struct(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        3).as("tk"))
      .select(col("l_returnflag"), posexplode(col("tk")))
      .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rn"),
        col("col.l_extendedprice").as("price"),
        col("col.l_orderkey").as("okey"))
      .orderBy("l_returnflag", "rn")

  val q101_topk_group_sql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_extendedprice, l_orderkey,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey DESC,
      |               l_linenumber DESC, l_partkey DESC, l_suppkey DESC)
      |      AS rn
      |  FROM lineitem)
      |SELECT l_returnflag, rn, l_extendedprice AS price, l_orderkey AS okey
      |FROM ranked WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin

  val queries: Map[String, Q] = Map(
    "q60_salted_join" -> q60_salted_join,
    "q61_percentile" -> q61_percentile,
    "q99_bucketed_join" -> q99_bucketed_join,
    "q101_topk_group" -> q101_topk_group,
    "q103_schema_evolution" -> q103_schema_evolution,
    "q01_scan_parquet" -> q01_scan_parquet,
    "q02_scan_csv" -> q02_scan_csv,
    "q02b_scan_json" -> q02b_scan_json,
    "q02c_scan_text" -> q02c_scan_text,
    "q03_sink_parquet" -> q03_sink_parquet,
    "q03b_sink_orc" -> q03b_sink_orc,
    "q03c_sink_csv" -> q03c_sink_csv,
    "q03d_sink_json" -> q03d_sink_json,
    "q03g_sink_xml" -> q03g_sink_xml,
    "q03e_sink_partitioned" -> q03e_sink_partitioned,
    "q03f_compact" -> q03f_compact,
    "q04_project" -> q04_project,
    "q05_filter" -> q05_filter,
    "q06_join_inner" -> q06_join_inner,
    "q07_join_left" -> q07_join_left,
    "q07b_join_full" -> q07b_join_full,
    "q07c_join_right" -> q07c_join_right,
    "q08_join_semi" -> q08_join_semi,
    "q08b_join_anti" -> q08b_join_anti,
    "q09_join_broadcast" -> q09_join_broadcast,
    "q10_join_range" -> q10_join_range,
    "q10b_join_cross" -> q10b_join_cross,
    "q11_agg_pricing" -> q11_agg_pricing,
    "q11b_agg_distinct" -> q11b_agg_distinct,
    "q11c_distinct_twophase" -> q11c_distinct_twophase,
    "q12_rollup" -> q12_rollup,
    "q12b_cube" -> q12b_cube,
    "q12f_grouping_id" -> q12f_grouping_id,
    "q12c_grouping_sets" -> q12c_grouping_sets,
    "q11d_listagg" -> q11d_listagg,
    "q11e_argmax" -> q11e_argmax,
    "q12d_pivot" -> q12d_pivot,
    "q12e_unpivot" -> q12e_unpivot,
    "q13_approx_distinct" -> q13_approx_distinct,
    "q14_window_rank" -> q14_window_rank,
    "q14b_window_dist" -> q14b_window_dist,
    "q15_window_lag" -> q15_window_lag,
    "q15b_nth_value" -> q15b_nth_value,
    "q16_window_running" -> q16_window_running,
    "q16b_window_rangeframe" -> q16b_window_rangeframe,
    "q17_topk" -> q17_topk,
    "q18_union_all" -> q18_union_all,
    "q18b_union_distinct" -> q18b_union_distinct,
    "q19_intersect" -> q19_intersect,
    "q19b_except" -> q19b_except,
    "q19c_intersect_all" -> q19c_intersect_all,
    "q19d_except_all" -> q19d_except_all,
    "q20_dedup_rows" -> q20_dedup_rows,
    "q20b_dedup_keyed" -> q20b_dedup_keyed)

  val oracles: Map[String, String] = Map(
    "q60_salted_join" -> q60_salted_join_sql,
    "q61_percentile" -> q61_percentile_sql,
    "q99_bucketed_join" -> q99_bucketed_join_sql,
    "q101_topk_group" -> q101_topk_group_sql,
    "q103_schema_evolution" -> q103_schema_evolution_sql,
    "q01_scan_parquet" -> q01_scan_parquet_sql,
    "q02_scan_csv" -> q02_scan_csv_sql,
    "q02b_scan_json" -> q02b_scan_json_sql,
    "q02c_scan_text" -> q02c_scan_text_sql,
    "q03_sink_parquet" -> q03_sink_parquet_sql,
    "q03b_sink_orc" -> q03b_sink_orc_sql,
    "q03c_sink_csv" -> q03c_sink_csv_sql,
    "q03d_sink_json" -> q03d_sink_json_sql,
    "q03g_sink_xml" -> q03g_sink_xml_sql,
    "q03e_sink_partitioned" -> q03e_sink_partitioned_sql,
    "q03f_compact" -> q03f_compact_sql,
    "q04_project" -> q04_project_sql,
    "q05_filter" -> q05_filter_sql,
    "q06_join_inner" -> q06_join_inner_sql,
    "q07_join_left" -> q07_join_left_sql,
    "q07b_join_full" -> q07b_join_full_sql,
    "q07c_join_right" -> q07c_join_right_sql,
    "q08_join_semi" -> q08_join_semi_sql,
    "q08b_join_anti" -> q08b_join_anti_sql,
    "q09_join_broadcast" -> q09_join_broadcast_sql,
    "q10_join_range" -> q10_join_range_sql,
    "q10b_join_cross" -> q10b_join_cross_sql,
    "q11_agg_pricing" -> q11_agg_pricing_sql,
    "q11b_agg_distinct" -> q11b_agg_distinct_sql,
    "q11c_distinct_twophase" -> q11c_distinct_twophase_sql,
    "q12_rollup" -> q12_rollup_sql,
    "q12b_cube" -> q12b_cube_sql,
    "q12f_grouping_id" -> q12f_grouping_id_sql,
    "q12c_grouping_sets" -> q12c_grouping_sets_sql,
    "q11d_listagg" -> q11d_listagg_sql,
    "q11e_argmax" -> q11e_argmax_sql,
    "q12d_pivot" -> q12d_pivot_sql,
    "q12e_unpivot" -> q12e_unpivot_sql,
    // q13_approx_distinct: HLL estimate — bench-only, no DuckDB oracle.
    "q14_window_rank" -> q14_window_rank_sql,
    "q14b_window_dist" -> q14b_window_dist_sql,
    "q15_window_lag" -> q15_window_lag_sql,
    "q15b_nth_value" -> q15b_nth_value_sql,
    "q16_window_running" -> q16_window_running_sql,
    "q16b_window_rangeframe" -> q16b_window_rangeframe_sql,
    "q17_topk" -> q17_topk_sql,
    "q18_union_all" -> q18_union_all_sql,
    "q18b_union_distinct" -> q18b_union_distinct_sql,
    "q19_intersect" -> q19_intersect_sql,
    "q19b_except" -> q19b_except_sql,
    "q19c_intersect_all" -> q19c_intersect_all_sql,
    "q19d_except_all" -> q19d_except_all_sql,
    "q20_dedup_rows" -> q20_dedup_rows_sql,
    "q20b_dedup_keyed" -> q20b_dedup_keyed_sql)
}
