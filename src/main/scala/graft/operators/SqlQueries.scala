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

  val queries: Map[String, Q] = Map(
    "q71_sql_tpch_q3" -> q71_sql_tpch_q3,
    "q72_sql_tpch_q5" -> q72_sql_tpch_q5)

  val oracles: Map[String, String] = Map(
    "q71_sql_tpch_q3" -> q71_sql_tpch_q3_sql,
    "q72_sql_tpch_q5" -> q72_sql_tpch_q5_sql)
}
