package graft.operators

import graft.Tables
import graft.functions.Det.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators: gap-based sessionization and a scalable
  * as-of (point-in-time) join — the two patterns every event pipeline
  * needs and plain SQL engines express only via window tricks.
  *
  * Scale shapes:
  *  - sessionize: one shuffle on user_id, then two window passes over
  *    each user's sorted events (lag -> gap flags -> running sum) — the
  *    standard linear-scan formulation, no self-join;
  *  - as-of join: union both sides tagged, sort once per key, and carry
  *    the last order value forward with last(ignoreNulls) — one shuffle
  *    + one sort instead of a per-row correlated probe. This is the
  *    MERGE_ASOF/ASOF JOIN equivalent, built from Spark primitives.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val GapMinutes = 30

  // ---- 52. Gap-based sessionization (30-minute inactivity gap) ----
  val q52_sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val sessions = t(s, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      // millisecond arithmetic: second-truncating unix_timestamp would
      // disagree with the oracle on sub-second gap boundaries
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts"))
            > GapMinutes * 60L * 1000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        (unix_millis(max("ts")) - unix_millis(min("ts")))
          .as("duration_ms"),
        dround(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  // ---- 52b. The same sessionization through Spark's NATIVE
  // session_window aggregation (SessionWindowing + merging session
  // state in the agg, instead of q52's lag->flag->running-sum window
  // chain). One shuffle on (user_id); sessions merge inside the
  // aggregate — no per-user sort-and-scan window pass. Boundary
  // convention: session_window closes a session when the next event is
  // >= gap after the previous (an event at exactly start+gap begins a
  // NEW session), so the oracle states >= where q52's states >; the
  // fixture's ms-random timestamps make exact-boundary collisions
  // practically impossible, but the conventions are kept aligned
  // anyway. Sessions are identified by their start time (min ts), not
  // an index.
  val q52b_session_window: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (unix_millis(max("ts")) - unix_millis(min("ts"))).as("duration_ms"),
        dround(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("duration_ms"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val q52b_session_window_sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= ${GapMinutes * 60 * 1000}
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), numbered AS (
       |  SELECT user_id, ts, value,
       |    sum(new_session) OVER
       |      (PARTITION BY user_id ORDER BY ts
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged
       |)
       |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       |  CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms,
       |  round(sum(value), 2) AS sum_value
       |FROM numbered GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  val q52_sessionize_sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > ${GapMinutes * 60 * 1000}
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, event_id, ts, value,
       |    CAST(sum(new_session) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM flagged
       |)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  min(ts) AS session_start,
       |  CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms,
       |  round(sum(value), 2) AS sum_value
       |FROM numbered GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ---- 53. As-of join: latest order per user at each event time ----
  val q53_asof_join: Q = (s, dir) => {
    val orders = t(s, dir, "orders")
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").as("pit_ts"),
        lit(null).cast("long").as("event_id"),
        col("o_orderdate").as("order_date"),
        lit(0).as("side"))
    val events = t(s, dir, "events")
      .select(col("user_id"), col("ts").as("pit_ts"), col("event_id"),
        lit(null).cast("timestamp").as("order_date"),
        lit(1).as("side"))
    // Order rows sort before event rows at equal timestamps (side 0 < 1),
    // so an order dated exactly at the event time is visible to it.
    val w = Window.partitionBy("user_id")
      .orderBy(col("pit_ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("last_order_date",
        last("order_date", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("last_order_date"))
      .orderBy("event_id")
  }

  val q53_asof_join_sql: String =
    """SELECT event_id, user_id,
      |  (SELECT max(o_orderdate) FROM orders
      |   WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_date
      |FROM events ORDER BY event_id""".stripMargin

  // ---- 53b. The SAME as-of join through the native physical operator
  // (graft.plans.AsOfJoinExec: custom LogicalPlan + Strategy +
  // SparkPlan — the (c)-tier extension point). One co-partitioned
  // two-pointer merge per key: each side shuffles ONCE on its own key
  // and sorts ONCE by (key, time); no union-widened rows, no window
  // buffer. Identical oracle to q53 — two physical paths, one answer.
  val q53b_asof_native: Q = (s, dir) => {
    val events = t(s, dir, "events").select("event_id", "user_id", "ts")
    val orders = t(s, dir, "orders").select("o_custkey", "o_orderdate")
    graft.plans.AsOfJoin.asof(events, orders,
      Seq(events("user_id")), Seq(orders("o_custkey")),
      events("ts"), orders("o_orderdate"))
      .select(col("event_id"), col("user_id"),
        col("o_orderdate").as("last_order_date"))
      .orderBy("event_id")
  }

  val q53b_asof_native_sql: String = q53_asof_join_sql

  // ---- 53c. FORWARD as-of with a tolerance: the next order within 7
  // days after each event (the "what did the user do next" direction —
  // label attribution, next-touch analysis). Exercises the native
  // operator's forward merge (the unconsumed head serves many left
  // rows) and the tolerance bound, both oracle-checked: DuckDB
  // re-derives the earliest order in (ts, ts + 7d] per event via a
  // correlated min subquery.
  val q53c_asof_forward: Q = (s, dir) => {
    val events = t(s, dir, "events").select("event_id", "user_id", "ts")
    val orders = t(s, dir, "orders").select("o_custkey", "o_orderdate")
    graft.plans.AsOfJoin.asof(events, orders,
      Seq(events("user_id")), Seq(orders("o_custkey")),
      events("ts"), orders("o_orderdate"),
      direction = graft.plans.AsOfJoin.Forward,
      tolerance = Some(java.time.Duration.ofDays(7)))
      .select(col("event_id"), col("user_id"),
        col("o_orderdate").as("next_order_date"))
      .orderBy("event_id")
  }

  val q53c_asof_forward_sql: String =
    """SELECT event_id, user_id,
      |  (SELECT min(o_orderdate) FROM orders
      |   WHERE o_custkey = user_id AND o_orderdate >= ts
      |     AND o_orderdate <= ts + INTERVAL 7 DAY) AS next_order_date
      |FROM events ORDER BY event_id""".stripMargin

  // ---- 53d. NEAREST as-of: the order closest in time to each event,
  // either direction, ties resolved backward (the documented rule).
  // The oracle re-derives both candidates and picks by absolute
  // distance — a full re-implementation of the nearest semantics in
  // DuckDB SQL, so the operator's tie and one-sided edges are all
  // hash-checked.
  val q53d_asof_nearest: Q = (s, dir) => {
    val events = t(s, dir, "events").select("event_id", "user_id", "ts")
    val orders = t(s, dir, "orders").select("o_custkey", "o_orderdate")
    graft.plans.AsOfJoin.asof(events, orders,
      Seq(events("user_id")), Seq(orders("o_custkey")),
      events("ts"), orders("o_orderdate"),
      direction = graft.plans.AsOfJoin.Nearest)
      .select(col("event_id"), col("user_id"),
        col("o_orderdate").as("nearest_order_date"))
      .orderBy("event_id")
  }

  val q53d_asof_nearest_sql: String =
    """WITH cand AS (
      |  SELECT e.event_id, e.user_id,
      |    (SELECT max(o_orderdate) FROM orders
      |     WHERE o_custkey = e.user_id AND o_orderdate <= e.ts) AS bw,
      |    (SELECT min(o_orderdate) FROM orders
      |     WHERE o_custkey = e.user_id AND o_orderdate > e.ts) AS fw,
      |    e.ts AS ts
      |  FROM events e
      |)
      |SELECT event_id, user_id,
      |  CASE
      |    WHEN bw IS NULL THEN fw
      |    WHEN fw IS NULL THEN bw
      |    WHEN (epoch_ms(fw) - epoch_ms(ts)) < (epoch_ms(ts) - epoch_ms(bw))
      |      THEN fw
      |    ELSE bw
      |  END AS nearest_order_date
      |FROM cand ORDER BY event_id""".stripMargin

  // ---- 55. Funnel analysis: signup -> purchase conversion ----
  // One shuffle on user_id, then per-user min-timestamps; conversion =
  // first purchase strictly after first signup. No self-join of the
  // event stream (the naive formulation) — the grouped-min shape scales.
  val q55_funnel: Q = (s, dir) => {
    val steps = t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
    steps.select(
      count(lit(1)).as("n_users"),
      count(col("first_signup")).as("n_signed_up"),
      sum(when(col("first_purchase").isNotNull
        && col("first_signup").isNotNull
        && col("first_purchase") > col("first_signup"), 1L).otherwise(0L))
        .as("n_converted"))
  }

  val q55_funnel_sql: String =
    """WITH steps AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      |  FROM events GROUP BY user_id
      |)
      |SELECT count(*) AS n_users,
      |  count(first_signup) AS n_signed_up,
      |  CAST(sum(CASE WHEN first_purchase IS NOT NULL
      |                 AND first_signup IS NOT NULL
      |                 AND first_purchase > first_signup
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      |FROM steps""".stripMargin

  // ---- 56. Cohort retention: users active on day d AND day d+1 ----
  val q56_retention: Q = (s, dir) => {
    val daily = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val next = daily.select(col("user_id"),
      date_sub(col("day"), 1).as("day"))
    daily.join(next, Seq("user_id", "day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("retained_users"))
      .orderBy("day")
  }

  val q56_retention_sql: String =
    """WITH daily AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |)
      |SELECT a.day, count(DISTINCT a.user_id) AS retained_users
      |FROM daily a JOIN daily b
      |  ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
      |GROUP BY a.day ORDER BY a.day""".stripMargin

  // ---- 59. Interval join (batch form of the stream-stream join) ----
  // Purchases matched to the same user's signups within the next hour.
  // StreamingSpec runs the identical transformation as a watermarked
  // stream-stream join and checks it against this batch plan.
  val q59_interval_join: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    graft.streaming.GraftStreams.purchasesAfterSignup(
      ev.filter(col("event_type") === "signup"),
      ev.filter(col("event_type") === "purchase"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"),
        dround(col("value"), 2).as("value"))
      .orderBy("user_id", "signup_id", "purchase_id")
  }

  val q59_interval_join_sql: String =
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
      |  round(p.value, 2) AS value
      |FROM events s JOIN events p
      |  ON s.user_id = p.user_id
      | AND s.event_type = 'signup' AND p.event_type = 'purchase'
      | AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
      |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin

  // ---- 88. OHLC time-bucket downsampling: compact a raw event stream
  // to per-(user, hour) open/high/low/close rows — the standard
  // telemetry/market compaction. ONE map-side-combined aggregation:
  // open and close are argmin/argmax computed as min/max over a
  // (ts, event_id, value) STRUCT (lexicographic; event_id is unique so
  // the pick is total-ordered and partition-invariant) — no sort, no
  // window, no self-join, so the shape holds when one bucket has a
  // billion events. The DuckDB oracle spells the same argmin via
  // row_number CTEs. ----
  val q88_ohlc_downsample: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        min("value").as("low"), max("value").as("high"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("hr"),
        col("o.value").as("open"), col("c.value").as("close"),
        col("low"), col("high"), col("n"))
      .orderBy("user_id", "hr")

  val q88_ohlc_downsample_sql: String =
    """WITH r AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hr, value,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |      ORDER BY ts, event_id) AS rf,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |      ORDER BY ts DESC, event_id DESC) AS rl
      |  FROM events
      |), agg AS (
      |  SELECT user_id, hr, min(value) AS low, max(value) AS high,
      |    count(*) AS n
      |  FROM r GROUP BY 1, 2
      |)
      |SELECT a.user_id, a.hr, f.value AS open, l.value AS close,
      |  a.low, a.high, a.n
      |FROM agg a
      |JOIN r f ON f.user_id = a.user_id AND f.hr = a.hr AND f.rf = 1
      |JOIN r l ON l.user_id = a.user_id AND l.hr = a.hr AND l.rl = 1
      |ORDER BY a.user_id, a.hr""".stripMargin

  // ---- 98. Binned range join: a point-in-interval join with NO equi
  // key. "For each flagged user's session (±15 min halo), count the
  // concurrent events corpus-wide" — the incident-investigation /
  // interval-overlap shape (IP→geo range lookup, telemetry windows are
  // the same join). Spark has no native range-join optimization: the
  // naive formulation is a broadcast-nested-loop (driver-bound at
  // scale) or a cartesian. The standard rewrite (Databricks calls it a
  // binned range join) makes it an EQUI join: quantize time into
  // fixed-width bins, explode each interval over the bins it covers,
  // map each point to its single bin, equi-join on bin, then apply the
  // exact range predicate as a residual. Each qualifying (interval,
  // point) pair meets in exactly ONE bin (the point's), so no dedup
  // pass is needed. Both sides scale with the corpus (the interval
  // side is a constant fraction of users — not broadcastable at
  // 100 TB); the bin join shuffles both by bin key and survives any
  // scale-up, with cost O(data + matches) instead of O(|L|·|R|).
  // Bin width (30 min) ~ typical interval width: each interval
  // explodes to 2-3 bins; timestamps are positive so the
  // floor-divide bin is exact in double math (ms values < 2^53). ----
  private val RangeBinMs = 30L * 60 * 1000
  private val HaloMs = 15L * 60 * 1000

  val q98_range_join_binned: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    // q52's gaps-and-islands sessionization, restricted to the flagged
    // 10% of users, each session widened by the halo
    val sessions = ev.filter(col("user_id") % 10 === 0)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts"))
            > GapMinutes * 60L * 1000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg((unix_millis(min("ts")) - HaloMs).as("w_start"),
        (unix_millis(max("ts")) + HaloMs).as("w_end"))
    val iv = sessions.withColumn("bin",
      explode(sequence(
        floor(col("w_start") / RangeBinMs).cast("long"),
        floor(col("w_end") / RangeBinMs).cast("long"))))
    val pts = ev.select(unix_millis(col("ts")).as("pt"), col("value"),
      floor(unix_millis(col("ts")) / RangeBinMs).cast("long").as("p_bin"))
    iv.join(pts,
        iv("bin") === pts("p_bin") &&
          col("pt") >= col("w_start") && col("pt") <= col("w_end"))
      .groupBy("user_id", "session_idx", "w_start", "w_end")
      .agg(count(lit(1)).as("n_concurrent"),
        dround(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  val q98_range_join_binned_sql: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
       |              > ${GapMinutes * 60 * 1000}
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events WHERE user_id % 10 = 0
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), n AS (
       |  SELECT user_id, ts,
       |    CAST(sum(new_session) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_idx
       |  FROM g
       |), sess AS (
       |  SELECT user_id, session_idx,
       |    CAST(epoch_ms(min(ts)) - $HaloMs AS BIGINT) AS w_start,
       |    CAST(epoch_ms(max(ts)) + $HaloMs AS BIGINT) AS w_end
       |  FROM n GROUP BY user_id, session_idx
       |)
       |SELECT s.user_id, s.session_idx, s.w_start, s.w_end,
       |  count(*) AS n_concurrent, round(sum(e.value), 2) AS sum_value
       |FROM sess s JOIN events e
       |  ON epoch_ms(e.ts) >= s.w_start AND epoch_ms(e.ts) <= s.w_end
       |GROUP BY 1, 2, 3, 4
       |ORDER BY s.user_id, s.session_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q98_range_join_binned" -> q98_range_join_binned,
    "q88_ohlc_downsample" -> q88_ohlc_downsample,
    "q59_interval_join" -> q59_interval_join,
    "q52_sessionize" -> q52_sessionize,
    "q52b_session_window" -> q52b_session_window,
    "q53_asof_join" -> q53_asof_join,
    "q53b_asof_native" -> q53b_asof_native,
    "q53c_asof_forward" -> q53c_asof_forward,
    "q53d_asof_nearest" -> q53d_asof_nearest,
    "q55_funnel" -> q55_funnel,
    "q56_retention" -> q56_retention)

  val oracles: Map[String, String] = Map(
    "q98_range_join_binned" -> q98_range_join_binned_sql,
    "q88_ohlc_downsample" -> q88_ohlc_downsample_sql,
    "q59_interval_join" -> q59_interval_join_sql,
    "q52_sessionize" -> q52_sessionize_sql,
    "q52b_session_window" -> q52b_session_window_sql,
    "q53_asof_join" -> q53_asof_join_sql,
    "q53b_asof_native" -> q53b_asof_native_sql,
    "q53c_asof_forward" -> q53c_asof_forward_sql,
    "q53d_asof_nearest" -> q53d_asof_nearest_sql,
    "q55_funnel" -> q55_funnel_sql,
    "q56_retention" -> q56_retention_sql)
}
