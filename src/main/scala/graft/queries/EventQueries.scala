package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Events
import Exact._

/** Event-stream batch analytics (SURVEY.md §2B) with DuckDB oracles. All
  * time math is epoch-microsecond longs on both sides, so ns-vs-us parquet
  * precision can't skew the compare. */
object EventQueries {

  private def eventsWindowed(s: SparkSession, d: String): DataFrame =
    Events.windowed(Tables.events(s, d), "1 hour")
      .orderBy("window_start_us", "event_type")

  private val eventsWindowedSql = s"""
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
           COUNT(*) AS n_events, ${sqlSum("value")} AS sum_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Exact per-group MODE with deterministic tie-break — the argmax
    * dashboard staple next to exact_median's percentile-disc family: per
    * event type, the most frequent user (ties → lowest user_id, pinned in
    * BOTH engines — built-in mode() breaks ties arbitrarily and is not
    * oracle-safe), its count, and its share of the group. The (group,
    * user) aggregate is the ONE data-sized shuffle; the argmax window
    * runs over the aggregate (|groups × distinct users per group| rows),
    * never the raw events. */
  private def groupMode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, d)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n_mode"))
    val byCnt = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"n_mode".desc, $"user_id".asc)
    val grp = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
    counts
      .withColumn("rk", row_number().over(byCnt))
      .withColumn("n_group", sum($"n_mode").over(grp))
      .filter($"rk" === 1)
      .select($"event_type", $"user_id".as("mode_user"), $"n_mode",
        $"n_group".cast("long").as("n_group"),
        ($"n_mode".cast("double") / $"n_group").as("mode_share"))
      .orderBy($"event_type")
  }

  private val groupModeSql: String = """
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS n_mode
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, user_id, n_mode,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n_mode DESC, user_id) AS rk,
             SUM(n_mode) OVER (PARTITION BY event_type) AS n_group
      FROM c)
    SELECT event_type, user_id AS mode_user, n_mode,
           CAST(n_group AS BIGINT) AS n_group,
           n_mode::DOUBLE / n_group AS mode_share
    FROM r WHERE rk = 1 ORDER BY event_type"""

  private def eventsSessionize(s: SparkSession, d: String): DataFrame =
    Events.sessionize(Tables.events(s, d))
      .orderBy("user_id", "session_id")

  private val eventsSessionizeSql = s"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS prev_ts
            FROM e) t),
    sessions AS (
      -- CAST: DuckDB integer SUM returns HUGEINT, which pandas canonicalizes
      -- to float64 (1.0 != Spark's int64 1) — r1's one hash mismatch
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us, COUNT(*) AS n_events,
           ${sqlSum("value")} AS sum_value
    FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  /** Session-gap tuning curve ([[Events.sessionGapCurve]]): session count,
    * events per session and in-session time at five candidate gap
    * thresholds, all from the one per-user delta frame — the threshold
    * read behind `events_sessionize`'s fixed 30 minutes. The 30-minute
    * point's n_sessions equals the sessionize output's row count
    * (TuningCurveSpec pins it). */
  private def sessionGapCurveQ(s: SparkSession, d: String): DataFrame =
    Events.sessionGapCurve(Tables.events(s, d))

  private val sessionGapCurveSql = """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    dl AS (SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id) AS delta
           FROM e),
    g AS (SELECT CAST(m AS BIGINT) * 60000000 AS gap_us
          FROM (VALUES (5), (15), (30), (60), (120)) v(m))
    SELECT gap_us, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN delta IS NULL OR delta > gap_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           COUNT(*)::DOUBLE
             / SUM(CASE WHEN delta IS NULL OR delta > gap_us THEN 1 ELSE 0 END)
             AS events_per_session,
           CAST(SUM(CASE WHEN delta IS NOT NULL AND delta <= gap_us
                         THEN delta ELSE 0 END) AS BIGINT) AS in_session_us,
           SUM(CASE WHEN delta IS NOT NULL AND delta <= gap_us
                    THEN delta ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN delta IS NULL OR delta > gap_us THEN 1 ELSE 0 END)
             AS avg_session_us
    FROM dl CROSS JOIN g GROUP BY gap_us ORDER BY gap_us"""

  private def eventsSessionizeNative(s: SparkSession, d: String): DataFrame =
    Events.sessionizeNative(Tables.events(s, d))
      .orderBy("user_id", "session_start_us")

  private val eventsSessionizeNativeSql = s"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS prev_ts
            FROM e) t),
    sessions AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM flagged)
    SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events, ${sqlSum("value")} AS sum_value
    FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start_us"""

  /** Each event matched to the latest order at-or-before it for that
    * customer. Orders are pre-reduced to one per (custkey, day) so the match
    * is deterministic; the oracle uses DuckDB's native ASOF JOIN. */
  private def asofJoinQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id".as("k"), unix_micros($"ts").as("t_us"), $"event_id")
    val ord = graft.olap.StarSchema.scd1Latest(
        Tables.orders(s, d)
          .select($"o_custkey".as("k"),
                  unix_micros($"o_orderdate".cast("timestamp")).as("t_us"),
                  $"o_orderkey", $"o_totalprice"),
        Seq("k", "t_us"), Seq($"o_orderkey".desc))
    Events.asofJoin(ev, ord, "k", "t_us", Seq("o_orderkey", "o_totalprice"))
      .select($"event_id", $"k".as("user_id"), $"t_us".as("ts_us"),
              $"matched_o_orderkey", $"matched_o_totalprice")
      .orderBy("event_id")
  }

  /** The SAME events⋈orders as-of match through the native whole-operator
    * path ([[graft.plans.AsOfJoin]]: custom LogicalPlan → Strategy →
    * merge SparkPlan) — one co-partitioned shuffle+sort per side, single
    * forward merge pass, O(1) state per partition; shares [[asofJoinSql]]
    * (DuckDB's native ASOF JOIN), so the custom operator is oracle-hashed
    * end-to-end, not just spec-compared to the composed form. */
  private def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id".as("k"), unix_micros($"ts").as("t_us"), $"event_id")
    val ord = graft.olap.StarSchema.scd1Latest(
        Tables.orders(s, d)
          .select($"o_custkey".as("k"),
                  unix_micros($"o_orderdate".cast("timestamp")).as("t_us"),
                  $"o_orderkey", $"o_totalprice"),
        Seq("k", "t_us"), Seq($"o_orderkey".desc))
    graft.plans.AsOfJoin(ev, ord, "k", "t_us", Seq("o_orderkey", "o_totalprice"))
      .select($"event_id", $"k".as("user_id"), $"t_us".as("ts_us"),
              $"matched_o_orderkey", $"matched_o_totalprice")
      .orderBy("event_id")
  }

  private val asofJoinSql = """
    WITH o AS (
      SELECT k, t_us, o_orderkey, o_totalprice FROM (
        SELECT o_custkey AS k, epoch_us(o_orderdate) AS t_us, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, epoch_us(o_orderdate)
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders) t WHERE rn = 1)
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           o.o_orderkey AS matched_o_orderkey, o.o_totalprice AS matched_o_totalprice
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.k AND epoch_us(e.ts) >= o.t_us
    ORDER BY e.event_id"""

  /** Interval/range join: per order, the same customer's repeat purchases
    * STRICTLY within the following 30 days (the classic retention/repeat-
    * purchase window). The equality key (custkey) carries the shuffle —
    * Spark plans a sort-merge join on it with the time range as a
    * join-level filter, so matching stays within each customer's rows (no
    * cross product; PlanAuditSpec enforces that registry-wide). At 100 TB
    * both sides bucket by the key and the join goes shuffle-free. */
  private def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val month = 30L * 24 * 3600 * 1000000L
    def o(pre: String) = Tables.orders(s, d).select(
      $"o_orderkey".as(s"${pre}k"), $"o_custkey".as(s"${pre}c"),
      unix_micros($"o_orderdate".cast("timestamp")).as(s"${pre}t"),
      $"o_totalprice".as(s"${pre}p"))
    o("a").join(o("b"),
        $"ac" === $"bc" && $"bt" > $"at" && $"bt" <= $"at" + lit(month))
      .groupBy($"ak".as("o_orderkey"))
      .agg(count(lit(1)).as("n_followups"), dsum($"bp").as("followup_revenue"))
      .orderBy($"o_orderkey")
  }

  private val rangeJoinSql = s"""
    SELECT a.o_orderkey, COUNT(*) AS n_followups,
           ${sqlSum("b.o_totalprice")} AS followup_revenue
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND epoch_us(b.o_orderdate) > epoch_us(a.o_orderdate)
     AND epoch_us(b.o_orderdate) <= epoch_us(a.o_orderdate) + 2592000000000
    GROUP BY a.o_orderkey ORDER BY a.o_orderkey"""

  /** Strict view→click→purchase conversion funnel; step timestamps exposed
    * as epoch micros (the events-table convention — see asofJoinQ). */
  private def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Events.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))
      .select($"user_id",
        unix_micros($"step_1_ts").as("step_1_us"),
        unix_micros($"step_2_ts").as("step_2_us"),
        unix_micros($"step_3_ts").as("step_3_us"),
        $"stage")
      .orderBy("user_id")
  }

  /** Conversion latency per funnel transition
    * ([[graft.ops.Events.funnelTimings]]): exact rank-selected median,
    * nearest-rank p90 and integer-sum mean of each step-to-step duration
    * — interpolation-free so both engines agree bit-for-bit. */
  private def funnelTimeToConvert(s: SparkSession, d: String): DataFrame =
    Events.funnelTimings(Tables.events(s, d), Seq("view", "click", "purchase"))

  private val funnelTimeToConvertSql = """
    WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS step_1_us
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS step_2_us
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.step_1_us
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS step_3_us
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.step_2_us
           GROUP BY e.user_id),
    f AS (SELECT s1.user_id, step_1_us, step_2_us, step_3_us
          FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)),
    d AS (SELECT 'view' AS from_step, 'click' AS to_step,
                 step_2_us - step_1_us AS dur_us
          FROM f WHERE step_2_us IS NOT NULL
          UNION ALL
          SELECT 'click', 'purchase', step_3_us - step_2_us
          FROM f WHERE step_3_us IS NOT NULL),
    r AS (SELECT *, row_number() OVER (PARTITION BY from_step, to_step
                                       ORDER BY dur_us) AS rn,
            COUNT(*) OVER (PARTITION BY from_step, to_step) AS n FROM d)
    SELECT from_step, to_step, CAST(MAX(n) AS BIGINT) AS n_converted,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END)
          + MAX(CASE WHEN rn = (n + 2) // 2 THEN dur_us END)) / 2.0 AS median_us,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN dur_us END) AS p90_us,
           CAST(SUM(dur_us) AS DOUBLE) / MAX(n) AS mean_us
    FROM r GROUP BY from_step, to_step ORDER BY from_step, to_step"""

  private val eventsFunnelSql = """
    WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS step_1_us
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS step_2_us
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.step_1_us
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS step_3_us
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.step_2_us
           GROUP BY e.user_id)
    SELECT s1.user_id, step_1_us, step_2_us, step_3_us,
           1 + CAST(step_2_us IS NOT NULL AS INTEGER)
             + CAST(step_3_us IS NOT NULL AS INTEGER) AS stage
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    ORDER BY user_id"""

  /** Weekly retention cohorts (both engines truncate weeks to Mondays, so
    * the week index is an exact day-difference division). */
  private def eventsRetention(s: SparkSession, d: String): DataFrame =
    Events.retentionCohorts(Tables.events(s, d))
      .orderBy("cohort_week", "week_n")

  private val eventsRetentionSql = """
    WITH fw AS (SELECT user_id,
                  CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
                FROM events GROUP BY user_id),
    aw AS (SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS active_week
           FROM events)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INTEGER) AS week_n,
           COUNT(DISTINCT user_id) AS n_users
    FROM aw JOIN fw USING (user_id)
    GROUP BY 1, 2 ORDER BY cohort_week, week_n"""

  private def eventsSliding(s: SparkSession, d: String): DataFrame =
    Events.slidingWindowed(Tables.events(s, d), "2 hours", "1 hour")
      .orderBy("window_start_us", "event_type")

  /** Oracle: a 2h/1h sliding window assigns each event to the two
    * hour-aligned windows covering it — starts at trunc_hour(ts) and
    * trunc_hour(ts) − 1h (Spark windows are epoch-aligned in UTC). */
  private val eventsSlidingSql = s"""
    WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
    x AS (SELECT ts_us - (ts_us % 3600000000) - o * 3600000000 AS window_start_us,
                 event_type, value
          FROM e, (SELECT unnest([0, 1]) AS o) t)
    SELECT window_start_us, event_type, COUNT(*) AS n_events,
           ${sqlSum("value")} AS sum_value
    FROM x GROUP BY 1, 2 ORDER BY 1, 2"""

  private def eventsGapFill(s: SparkSession, d: String): DataFrame =
    Events.gapFillDaily(Tables.events(s, d)).orderBy("user_id", "day_idx")

  private val eventsGapFillSql = s"""
    WITH e AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
             value
      FROM events),
    daily AS (
      SELECT user_id, day_idx, COUNT(*) AS n_events,
             ${sqlSum("value")} AS day_value
      FROM e GROUP BY 1, 2),
    bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM daily),
    grid AS (
      SELECT u.user_id, d.day_idx
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds) d),
    j AS (
      SELECT g.user_id, g.day_idx, daily.n_events, daily.day_value
      FROM grid g LEFT JOIN daily
        ON g.user_id = daily.user_id AND g.day_idx = daily.day_idx)
    SELECT user_id, day_idx,
           COALESCE(n_events, 0) AS n_events,
           day_value,
           last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value,
           CAST(n_events IS NULL AS INT) AS is_gap
    FROM j ORDER BY user_id, day_idx"""

  private def eventTransitions(s: SparkSession, d: String): DataFrame =
    Events.transitions(Tables.events(s, d)).orderBy("from_type", "to_type")

  private val eventTransitionsSql = """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
    p AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS to_type
      FROM e),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n_trans,
           CAST(n_trans AS DOUBLE) /
           CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE) AS p_trans
    FROM c ORDER BY from_type, to_type"""

  private def slidingActiveUsers(s: SparkSession, d: String): DataFrame =
    Events.slidingActiveUsers(Tables.events(s, d), windowDays = 7)
      .orderBy("day_idx")

  private val slidingActiveUsersSql = """
    WITH ud AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events),
    b AS (SELECT max(day_idx) AS hi FROM ud),
    w AS (SELECT user_id,
                 unnest(generate_series(day_idx, day_idx + 6)) AS w_day
          FROM ud)
    SELECT w_day AS day_idx, COUNT(DISTINCT user_id) AS active_users
    FROM w, b WHERE w_day <= hi GROUP BY 1 ORDER BY 1"""

  private def dauWauStickiness(s: SparkSession, d: String): DataFrame =
    Events.stickiness(Tables.events(s, d), windowDays = 7)
      .orderBy("day_idx")

  private val dauWauStickinessSql = """
    WITH ud AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events),
    b AS (SELECT max(day_idx) AS hi FROM ud),
    w AS (SELECT user_id,
                 unnest(generate_series(day_idx, day_idx + 6)) AS w_day
          FROM ud),
    wau AS (SELECT w_day AS day_idx, COUNT(DISTINCT user_id) AS wau
            FROM w, b WHERE w_day <= hi GROUP BY 1),
    dau AS (SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS dau
            FROM ud GROUP BY 1)
    SELECT wau.day_idx, COALESCE(dau.dau, 0) AS dau, wau.wau,
           CAST(COALESCE(dau.dau, 0) AS DOUBLE) / CAST(wau.wau AS DOUBLE)
             AS stickiness
    FROM wau LEFT JOIN dau ON wau.day_idx = dau.day_idx
    ORDER BY wau.day_idx"""

  private def userConcentration(s: SparkSession, d: String): DataFrame =
    Events.userConcentration(Tables.events(s, d))

  private val userConcentrationSql = """
    WITH uc AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
    r AS (SELECT n,
             row_number() OVER (ORDER BY n DESC, user_id) AS rk,
             COUNT(*) OVER () AS n_users,
             SUM(n) OVER () AS total_events
          FROM uc)
    SELECT CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS top_users,
           CAST(SUM(n) AS BIGINT) AS top_events,
           CAST(MAX(total_events) AS BIGINT) AS total_events,
           CAST(SUM(n) AS DOUBLE) / CAST(MAX(total_events) AS DOUBLE)
             AS top_share
    FROM r WHERE rk <= (n_users + 9) // 10
    HAVING COUNT(*) > 0"""

  private def anomalyDailyCounts(s: SparkSession, d: String): DataFrame =
    Events.anomalyDailyCounts(Tables.events(s, d), z = 2.0)
      .orderBy("event_type", "day_idx")

  private val anomalyDailyCountsSql = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, day_idx, n_events,
             CAST(COUNT(*) OVER w AS DOUBLE) AS n_days,
             CAST(SUM(n_events) OVER w AS DOUBLE) AS s,
             CAST(SUM(n_events * n_events) OVER w AS DOUBLE) AS ss
      FROM daily WINDOW w AS (PARTITION BY event_type))
    SELECT event_type, day_idx, n_events,
           CASE WHEN n_days > CAST(1.0 AS DOUBLE)
                 AND (ss - s * s / n_days) > CAST(0.0 AS DOUBLE)
                THEN (CAST(n_events AS DOUBLE) - s / n_days) /
                  sqrt((ss - s * s / n_days) / (n_days - CAST(1.0 AS DOUBLE)))
           END AS z,
           COALESCE(
             abs(CASE WHEN n_days > CAST(1.0 AS DOUBLE)
                       AND (ss - s * s / n_days) > CAST(0.0 AS DOUBLE)
                      THEN (CAST(n_events AS DOUBLE) - s / n_days) /
                        sqrt((ss - s * s / n_days) / (n_days - CAST(1.0 AS DOUBLE)))
                 END) >= CAST(2.0 AS DOUBLE), FALSE) AS is_anomaly
    FROM m ORDER BY event_type, day_idx"""

  /** Semi-structured column extraction: the events `props` JSON parsed
    * through a TYPED `from_json` schema (codegen'd Jackson parse, no
    * UDF), rolled up by the extracted field's decade — the
    * schema-on-read path every event pipeline runs over its property
    * bags. The parse is map-side; the rollup is one (type, decade)
    * aggregate. */
  private def eventsJsonProps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k"), $"value")
      // DuckDB's // floors while Spark's DIV truncates toward zero; for a
      // negative k they'd bucket differently (-15 // 10 = -2, -15 DIV 10 =
      // -1). (k - pmod(k,10)) DIV 10 is exact integer floor division
      // (pmod is always non-negative), engine-identical for any k
      .groupBy($"event_type", expr("(k - pmod(k, 10)) DIV 10").as("k_decade"))
      .agg(count(lit(1)).as("n_events"), min($"k").as("min_k"),
        max($"k").as("max_k"), dsum($"value").as("sum_value"))
      .orderBy("event_type", "k_decade")
  }

  private val eventsJsonPropsSql = s"""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, value
      FROM events)
    SELECT event_type, k // 10 AS k_decade, COUNT(*) AS n_events,
           min(k) AS min_k, max(k) AS max_k, ${sqlSum("value")} AS sum_value
    FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Two-sample A/B read-out per event type — the experiment-analysis
    * staple: users split into arms by id parity (the deterministic hash
    * assignment every platform uses), per-arm counts, means, Welch z on
    * the value metric, plus the sample-ratio-mismatch chi² that must be
    * checked BEFORE the z is believed (SRM = broken assignment = invalid
    * experiment). Every moment accumulates in DECIMAL(38,6) (per-row
    * value² products are IEEE-exact); the z itself is a handful of
    * correctly-rounded double ops + one sqrt, so the statistic replays
    * bit-for-bit cross-engine — no t-distribution/p-value (that needs the
    * incomplete beta — libm territory; the z and chi² ARE the portable
    * decision inputs). One scan, one shuffle on event_type. Computed via
    * [[graft.ops.Experiments]]' mergeable moment partials — the SAME read
    * path the streaming monitor serves from, so batch and continuous
    * answers are structurally identical.
    */
  private def abTestZscore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.ops.Experiments.zFromMoments(
        graft.ops.Experiments.armMoments(
          Tables.events(s, d).select($"event_type".as("key"),
            ($"user_id" % 2).cast("int").as("arm"), $"value")))
      .withColumnRenamed("key", "event_type")
      .orderBy($"event_type")
  }

  private val abTestZscoreSql: String = """
    WITH g AS (
      SELECT event_type,
        -- no ELSE 0: an absent arm must be NULL (matching Spark's
        -- sum(when(...)) which skips non-matching rows entirely), so a
        -- one-armed key yields NULL n/srm_chi2 in BOTH engines instead
        -- of 0 here and NULL there.
        SUM(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
        SUM(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n_b,
        CAST(SUM(CASE WHEN user_id % 2 = 0
                      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS s_a,
        CAST(SUM(CASE WHEN user_id % 2 = 1
                      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS s_b,
        CAST(SUM(CASE WHEN user_id % 2 = 0
                      THEN CAST(value * value AS DECIMAL(38,6)) END) AS DOUBLE) AS q_a,
        CAST(SUM(CASE WHEN user_id % 2 = 1
                      THEN CAST(value * value AS DECIMAL(38,6)) END) AS DOUBLE) AS q_b
      FROM events GROUP BY event_type),
    v AS (
      SELECT event_type, n_a, n_b, s_a / n_a AS mean_a, s_b / n_b AS mean_b,
             CASE WHEN n_a > 1
                  THEN (q_a - s_a * s_a / n_a) / (n_a - 1) END AS var_a,
             CASE WHEN n_b > 1
                  THEN (q_b - s_b * s_b / n_b) / (n_b - 1) END AS var_b
      FROM g)
    SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           mean_a, mean_b, mean_b - mean_a AS diff,
           CASE WHEN (var_a / n_a + var_b / n_b) IS NULL THEN NULL
                WHEN var_a / n_a + var_b / n_b <= 0.0 THEN 0.0
                ELSE (mean_b - mean_a)
                     / sqrt(var_a / n_a + var_b / n_b) END AS z,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) AS srm_chi2
    FROM v ORDER BY event_type"""

  /** Activity heatmap: event volume and exact value by (ISO weekday,
    * hour-of-day) — the 7×24 usage-profile dashboard. Weekday convention
    * pinned to ISO (Monday=1) explicitly: Spark's dayofweek() counts
    * Sunday=1 while DuckDB's counts Sunday=0 — a silent off-by-one across
    * engines — so BOTH sides compute the ISO number (weekday()+1 here,
    * isodow() there). One scan, one 168-key shuffle, map-side partials. */
  private def eventsHeatmap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select((expr("weekday(ts)") + 1).as("iso_dow"), hour($"ts").as("hr"),
        $"value")
      .groupBy($"iso_dow", $"hr")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"iso_dow", $"hr")
  }

  private val eventsHeatmapSql: String = s"""
    SELECT CAST(isodow(ts) AS INT) AS iso_dow, CAST(hour(ts) AS INT) AS hr,
           COUNT(*) AS n_events, ${sqlSum("value")} AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** New-vs-returning daily actives — the product-analytics split every
    * growth dashboard leads with: per day, distinct users seen for the
    * FIRST time that day vs users seen before. The fact reduces to
    * distinct (user, day) FIRST (map-side dedup), the first-seen day is
    * one min() window over that user-keyed frame — no self-join against
    * the full history, no per-day scans; the sliding_active_users
    * reduction discipline. */
  private def newVsReturning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Floor form, not bare div: Spark's div truncates toward zero while
    // the oracle's // floors, so pre-epoch timestamps would bucket into
    // different days — same discipline as dayPartials / events_ohlc.
    val userDays = Tables.events(s, d)
      .select($"user_id",
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000L))" +
          " div 86400000000L").as("day"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    userDays
      .select($"user_id", $"day", min($"day").over(w).as("first_day"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_active"),
        sum(when($"day" === $"first_day", 1L).otherwise(0L)).as("n_new"))
      .select($"day", $"n_active", $"n_new",
        ($"n_active" - $"n_new").as("n_returning"))
      .orderBy($"day")
  }

  private val newVsReturningSql: String = """
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events),
    f AS (
      SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS first_day
      FROM ud)
    SELECT day, COUNT(*) AS n_active,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(COUNT(*) - SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning
    FROM f GROUP BY day ORDER BY day"""

  /** OHLC bars per (event type, hour): open/close = the value of the
    * chronologically first/last event — selected by lexicographic
    * struct-min/max over (t, event_id, value), ONE aggregation pass, ties
    * pinned by event_id — plus high/low/volume/exact sum. The oracle
    * selects the same rows via row_number windows: two formulations, one
    * deterministic answer (first/last are well-defined because the order
    * key is unique). The time-series bar aggregation every monitoring
    * store needs; map-side partial, one (type, hour) shuffle. */
  private def eventsOhlc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourUs = 3600000000L
    Tables.events(s, d)
      .select($"event_type", unix_micros($"ts").as("t"), $"event_id", $"value")
      .select($"event_type", expr(s"(t - pmod(t, ${hourUs}L)) div ${hourUs}L").as("hour_idx"),
        $"t", $"event_id", $"value")
      .groupBy($"event_type", $"hour_idx")
      .agg(
        min(struct($"t", $"event_id", $"value")).as("o"),
        max(struct($"t", $"event_id", $"value")).as("c"),
        max($"value").as("high"), min($"value").as("low"),
        count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"event_type", $"hour_idx", $"o.value".as("open"),
        $"high", $"low", $"c.value".as("close"), $"n_events", $"sum_value")
      .orderBy($"event_type", $"hour_idx")
  }

  private val eventsOhlcSql: String = s"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t, event_id, value,
             epoch_us(ts) // 3600000000 AS hour_idx
      FROM events),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, hour_idx
                           ORDER BY t ASC, event_id ASC) AS ra,
        row_number() OVER (PARTITION BY event_type, hour_idx
                           ORDER BY t DESC, event_id DESC) AS rd
      FROM e)
    SELECT event_type, hour_idx,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           COUNT(*) AS n_events, ${sqlSum("value")} AS sum_value
    FROM r GROUP BY event_type, hour_idx
    ORDER BY event_type, hour_idx"""

  /** Weekly growth accounting — the new/retained/resurrected/churned
    * decomposition (active(w) = new + retained + resurrected;
    * churned(w) = active(w-1) − retained(w)): the fact reduces to
    * distinct (user, week) FIRST, then ONE lag window over that
    * user-keyed frame classifies every active row; churn falls out of
    * the week totals by subtraction — no per-week scans, no history
    * self-join. The week axis is DENSIFIED over the observed min..max
    * span before the churn lag, so a globally-empty week carries its own
    * all-zero row and its churn (everyone active the week before) is
    * attributed to IT, not silently shifted onto the next active week.
    * The axis is weeks-of-span sized (bounded, not data-sized), built
    * from a broadcast 1-row bounds frame. Pure integer arithmetic. */
  private def userLifecycle(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val weekUs = 7L * 86400000000L
    val uw = Tables.events(s, d)
      .select($"user_id",
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${weekUs}L)) div ${weekUs}L")
          .as("week"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"week")
    val classified = uw
      .select($"user_id", $"week", lag($"week", 1).over(w).as("prev_week"))
      .groupBy($"week")
      .agg(
        sum(when($"prev_week".isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when($"week" === $"prev_week" + 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when($"prev_week".isNotNull && $"week" > $"prev_week" + 1, 1L)
          .otherwise(0L)).as("n_resurrected"),
        count(lit(1)).as("n_active"))
    val axis = uw.agg(min($"week").as("lo"), max($"week").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("week"))
    val wk = org.apache.spark.sql.expressions.Window.orderBy($"week")
    axis.join(classified, Seq("week"), "left")
      .select($"week",
        coalesce($"n_active", lit(0L)).as("n_active"),
        coalesce($"n_new", lit(0L)).as("n_new"),
        coalesce($"n_retained", lit(0L)).as("n_retained"),
        coalesce($"n_resurrected", lit(0L)).as("n_resurrected"))
      .select($"week", $"n_active", $"n_new", $"n_retained", $"n_resurrected",
        (coalesce(lag($"n_active", 1).over(wk), lit(0L)) - $"n_retained")
          .as("n_churned"))
      .orderBy($"week")
  }

  private val userLifecycleSql: String = """
    WITH uw AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM events),
    c AS (
      SELECT week,
        CAST(SUM(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(SUM(CASE WHEN week = prev_week + 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_retained,
        CAST(SUM(CASE WHEN prev_week IS NOT NULL AND week > prev_week + 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        COUNT(*) AS n_active
      FROM (SELECT user_id, week,
              lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
            FROM uw)
      GROUP BY week),
    axis AS (
      SELECT unnest(generate_series(MIN(week), MAX(week))) AS week FROM uw),
    dense AS (
      SELECT axis.week,
             COALESCE(n_active, 0) AS n_active,
             COALESCE(n_new, 0) AS n_new,
             COALESCE(n_retained, 0) AS n_retained,
             COALESCE(n_resurrected, 0) AS n_resurrected
      FROM axis LEFT JOIN c ON axis.week = c.week)
    SELECT week, n_active, n_new, n_retained, n_resurrected,
           CAST(COALESCE(lag(n_active) OVER (ORDER BY week), 0) - n_retained
                AS BIGINT) AS n_churned
    FROM dense ORDER BY week"""

  /** Shared oracle prefix for the attribution entries: the per-conversion
    * touch context (mirrors [[graft.ops.Events.attributionBase]] — same
    * RANGE window, same lexicographic first/last key). */
  private val attributionBaseSql = """
    WITH b AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, value, event_type,
        min(CASE WHEN event_type IN ('view', 'click')
            THEN printf('%020d%012d%s', epoch_us(ts), event_id, event_type)
            END) OVER w AS first_key,
        max(CASE WHEN event_type IN ('view', 'click')
            THEN printf('%020d%012d%s', epoch_us(ts), event_id, event_type)
            END) OVER w AS last_key,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
          AS BIGINT) AS n_view,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
          AS BIGINT) AS n_click
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)),
    p AS (SELECT *, n_view + n_click AS n_touches
          FROM b WHERE event_type = 'purchase')"""

  /** Linear (equal-credit) multi-touch attribution: each purchase's value
    * split evenly across its trailing-7d view/click touches, rolled up per
    * touch type — the budget-allocation row marketing reads first. Credit
    * per type is value·n_type/n_touches (two IEEE ops in fixed order —
    * engine-identical), accumulated in exact decimal; purchases with no
    * touch in the window report under 'none' with their full value, so the
    * rows reconcile to total purchase revenue. One user-keyed window pass
    * ([[graft.ops.Events.attributionBase]]), conversion-sized thereafter. */
  private def attributionLinear(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // conversion-sized; eagerly materialized because BOTH branches of the
    // union (per-type credits + the 'none' bucket) read it — without the
    // checkpoint each branch re-runs the fact scan + window pass
    val p = Events.attributionBase(Tables.events(s, d)).localCheckpoint(true)
    val perType = p
      .select($"value", $"n_touches", explode(array(
          struct(lit("view").as("touch_type"), $"n_view".as("n_t")),
          struct(lit("click").as("touch_type"), $"n_click".as("n_t"))))
        .as("x"))
      .select($"x.touch_type".as("touch_type"), $"x.n_t".as("n_t"),
        $"value", $"n_touches")
      .filter($"n_t" > 0)
      .groupBy($"touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        sum($"n_t").as("touches"),
        dsum($"value" * $"n_t" / $"n_touches").as("attributed_value"))
    val none = p.filter($"n_touches" === 0)
      .agg(count(lit(1)).as("n_conversions"),
        dsum($"value").as("attributed_value"))
      .select(lit("none").as("touch_type"), $"n_conversions",
        lit(0L).as("touches"), $"attributed_value")
    perType.unionByName(none).orderBy($"touch_type")
  }

  private val attributionLinearSql = s"""$attributionBaseSql,
    t AS (
      SELECT 'view' AS touch_type, n_view AS n_t, value, n_touches
      FROM p WHERE n_view > 0
      UNION ALL
      SELECT 'click', n_click, value, n_touches FROM p WHERE n_click > 0)
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(n_t) AS BIGINT) AS touches,
           ${sqlSum("value * n_t / n_touches")} AS attributed_value
    FROM t GROUP BY touch_type
    UNION ALL
    SELECT 'none', CAST(COUNT(*) AS BIGINT), 0, ${sqlSum("value")}
    FROM p WHERE n_touches = 0
    ORDER BY touch_type"""

  /** First-touch vs last-touch attribution: each touched purchase's full
    * value credited to the type of its first (resp. last) view/click in
    * the trailing 7d, both models side by side — the comparison that
    * shows whether a channel opens journeys or closes them. First/last
    * are exact min/max over the lexicographic (us, event_id, type) key,
    * deterministic under timestamp ties; values accumulate in exact
    * decimal. Conversion-sized after the shared window pass. */
  private def attributionPosition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // conversion-sized; both model branches read it (same re-derivation
    // trade as attribution_linear)
    val p = Events.attributionBase(Tables.events(s, d))
      .filter($"n_touches" > 0).localCheckpoint(true)
    def byModel(model: String, keyCol: String): DataFrame =
      p.select(expr(s"substring($keyCol, 33)").as("touch_type"), $"value")
        .groupBy($"touch_type")
        .agg(count(lit(1)).as("n_conversions"),
          dsum($"value").as("attributed_value"))
        .select(lit(model).as("model"), $"touch_type", $"n_conversions",
          $"attributed_value")
    byModel("first_touch", "first_key")
      .unionByName(byModel("last_touch", "last_key"))
      .orderBy($"model", $"touch_type")
  }

  private val attributionPositionSql = s"""$attributionBaseSql,
    u AS (
      SELECT 'first_touch' AS model, substr(first_key, 33) AS touch_type,
             value
      FROM p WHERE n_touches > 0
      UNION ALL
      SELECT 'last_touch', substr(last_key, 33), value
      FROM p WHERE n_touches > 0)
    SELECT model, touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ${sqlSum("value")} AS attributed_value
    FROM u GROUP BY model, touch_type ORDER BY model, touch_type"""

  val registry: Seq[Q] = Seq(
    Q("attribution_linear", attributionLinear, Some(attributionLinearSql)),
    Q("attribution_position", attributionPosition,
      Some(attributionPositionSql)),
    Q("events_ohlc", eventsOhlc, Some(eventsOhlcSql)),
    Q("user_lifecycle", userLifecycle, Some(userLifecycleSql)),
    Q("events_heatmap", eventsHeatmap, Some(eventsHeatmapSql)),
    Q("group_mode", groupMode, Some(groupModeSql)),
    Q("new_vs_returning", newVsReturning, Some(newVsReturningSql)),
    Q("ab_test_zscore", abTestZscore, Some(abTestZscoreSql)),
    Q("events_windowed", eventsWindowed, Some(eventsWindowedSql)),
    Q("events_sliding_windows", eventsSliding, Some(eventsSlidingSql)),
    Q("events_sessionize", eventsSessionize, Some(eventsSessionizeSql)),
    Q("events_sessionize_native", eventsSessionizeNative, Some(eventsSessionizeNativeSql)),
    Q("session_gap_curve", sessionGapCurveQ, Some(sessionGapCurveSql)),
    Q("asof_join", asofJoinQ, Some(asofJoinSql)),
    Q("asof_join_native", asofJoinNative, Some(asofJoinSql)),
    Q("range_join", rangeJoin, Some(rangeJoinSql)),
    Q("events_funnel", eventsFunnel, Some(eventsFunnelSql)),
    Q("funnel_time_to_convert", funnelTimeToConvert, Some(funnelTimeToConvertSql)),
    Q("events_retention", eventsRetention, Some(eventsRetentionSql)),
    Q("events_gap_fill", eventsGapFill, Some(eventsGapFillSql)),
    Q("event_transitions", eventTransitions, Some(eventTransitionsSql)),
    Q("sliding_active_users", slidingActiveUsers, Some(slidingActiveUsersSql)),
    Q("dau_wau_stickiness", dauWauStickiness, Some(dauWauStickinessSql)),
    Q("user_concentration", userConcentration, Some(userConcentrationSql)),
    Q("anomaly_daily_counts", anomalyDailyCounts, Some(anomalyDailyCountsSql)),
    Q("events_json_props", eventsJsonProps, Some(eventsJsonPropsSql)))
}
