package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-SQL surface: the same engine driven through `spark.sql` over
  * registered views — a user of the reference switching to this library
  * gets the full ANSI SQL parser/analyzer path, not just the DataFrame
  * DSL. The two queries are TPC-H Q3/Q5 shapes adapted to the synthetic
  * schema; the oracle runs the equivalent SQL in DuckDB, so the
  * round-the-parser plan is held to the same hash gate as everything
  * else.
  *
  * Rounding inside raw SQL uses the dround formula inline
  * (`round(x * 100, 0) / 100 + 0.0` — see graft.functions.Det for why
  * Spark's native round(x, 2) disagrees with DuckDB on scaled-half
  * boundary doubles).
  *
  * Scale notes: Q3 joins customer→orders→lineitem on their keys after
  * pushed-down filters (AQE picks broadcast for the filtered customer
  * side); Q5 is the classic star join — region/nation broadcast,
  * fact-side shuffles only on the order key.
  */
object SqlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  // ---- 71. TPC-H Q3 shape (shipping priority): top unshipped orders
  // by revenue for one market segment at a cutoff date ----
  val q71_sql_tpch_q3: Q = (s, dir) => sql(s, dir,
    """SELECT l.l_orderkey,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100, 0) / 100
      |    + 0.0 AS revenue,
      |  o.o_orderdate
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin)

  val q71_sql_tpch_q3_sql: String =
    """SELECT l.l_orderkey,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0 AS revenue,
      |  o.o_orderdate
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---- 72. TPC-H Q5 shape (local supplier volume): revenue per nation
  // where customer and supplier share the nation, one region, one year ----
  val q72_sql_tpch_q5: Q = (s, dir) => sql(s, dir,
    """SELECT n.n_name,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100, 0) / 100
      |    + 0.0 AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier su ON l.l_suppkey = su.s_suppkey
      |  AND c.c_nationkey = su.s_nationkey
      |JOIN nation n ON su.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin)

  val q72_sql_tpch_q5_sql: String =
    """SELECT n.n_name,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0 AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier su ON l.l_suppkey = su.s_suppkey
      |  AND c.c_nationkey = su.s_nationkey
      |JOIN nation n ON su.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---- 77. Recursive CTE (Spark 4 WITH RECURSIVE): funnel PATHS, not
  // just stage counts — each recursion step extends a user's journey
  // with the next stage's event inside a 2-day window. The strictly
  // increasing timestamp + depth cap make the recursion finite (Spark's
  // recursive CTEs support UNION ALL only, so acyclicity must come from
  // the data, and here it does). Each iteration is one equi-join on
  // user_id against the (broadcastable per-stage filtered) event set —
  // the same per-round shape as the label-propagation loop in q58, but
  // expressed declaratively. The identical SQL text runs on DuckDB.
  //
  // funnel_events pre-filters to the four funnel types ONCE: the CASE
  // predicate in the recursive step depends on the join row so it can
  // never reach the scan, but the IN-list is constant and Catalyst
  // pushes it into each iteration's parquet scan — every round reads
  // the ~4-type subset instead of the full event log. VERIFIED in the
  // optimized plan (PlanAuditSpec "q77"): the recursive UnionLoop side
  // is `Filter (event_type IN (...)) -> Relation parquet`. Measured at
  // sf0.1 (median of 3, warm): 1.07 s with the CTE vs 1.09-1.27 s
  // without — the r4 bench's "2.15x regression" was best-of-2 noise,
  // not this text.
  private val funnelPathsText =
    """WITH RECURSIVE funnel_events AS (
      |  SELECT user_id, ts, event_type FROM events
      |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
      |), chain(user_id, ts, depth) AS (
      |  SELECT user_id, ts, 1 FROM funnel_events WHERE event_type = 'signup'
      |  UNION ALL
      |  SELECT c.user_id, e.ts, c.depth + 1
      |  FROM chain c JOIN funnel_events e ON e.user_id = c.user_id
      |   AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 2 DAY
      |   AND e.event_type = CASE c.depth WHEN 1 THEN 'view'
      |                                   WHEN 2 THEN 'click'
      |                                   WHEN 3 THEN 'purchase' END
      |  WHERE c.depth < 4
      |)
      |SELECT depth, count(*) AS paths,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |FROM chain GROUP BY depth ORDER BY depth""".stripMargin

  val q77_recursive_funnel: Q = (s, dir) => sql(s, dir, funnelPathsText)

  val q77_recursive_funnel_sql: String = funnelPathsText

  val queries: Map[String, Q] = Map(
    "q71_sql_tpch_q3" -> q71_sql_tpch_q3,
    "q72_sql_tpch_q5" -> q72_sql_tpch_q5,
    "q77_recursive_funnel" -> q77_recursive_funnel)

  val oracles: Map[String, String] = Map(
    "q71_sql_tpch_q3" -> q71_sql_tpch_q3_sql,
    "q72_sql_tpch_q5" -> q72_sql_tpch_q5_sql,
    "q77_recursive_funnel" -> q77_recursive_funnel_sql)
}
