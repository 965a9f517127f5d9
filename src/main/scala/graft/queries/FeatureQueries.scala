package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Exact._

/** Feature-engineering surface: the leakage-free training-feature shapes an
  * ML pipeline derives from the warehouse (reference scope: the OLAP side of
  * sync_oltp_to_olap.py is exactly the store such features are built from).
  *
  * All three operators are single-shuffle window/sweep plans: the classic
  * formulations (correlated subqueries, inequality self-joins, per-probe
  * scans) are quadratic and were deliberately NOT used — at 100 TB each of
  * these is one hash shuffle on the entity key followed by a linear
  * per-partition pass.
  */
object FeatureQueries {

  /** Point-in-time-correct feature backfill (the feature-store correctness
    * problem): for every event (a "prediction time"), the user's order
    * history STRICTLY BEFORE that instant — order count, exact total spend,
    * and recency. Built with the union trick: probes and history rows
    * interleave in ONE per-user time-ordered window, so each probe reads
    * running aggregates of the rows before it. No correlated subquery, no
    * inequality join: one shuffle on the user key, O(1) window state,
    * linear scan per partition — the same cost as a sort. Probes sort
    * BEFORE history rows at equal timestamps (is_probe DESC), which pins
    * the strictly-before semantics instead of leaving tie behavior to the
    * engine.
    *
    * Leakage note: a naive join on "orders in the same month" or a
    * post-hoc aggregate would let future orders leak into training
    * features; the window frame makes leakage structurally impossible.
    */
  def pointInTimeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = Tables.events(spark, dir).select(
      $"user_id".as("k"), unix_micros($"ts").as("t"), $"event_id".as("eid"))
    val history = Tables.orders(spark, dir).select(
      $"o_custkey".as("k"), unix_micros($"o_orderdate".cast("timestamp")).as("t"),
      $"o_orderkey".as("hid"), $"o_totalprice".as("price"))
    graft.ops.Features.pointInTime(probes, history)
      .select($"eid".as("event_id"), $"k".as("user_id"), $"t".as("ts_us"),
        $"n_before".as("n_orders_before"),
        coalesce($"sum_before".cast("double"), lit(0.0)).as("spend_before"),
        expr("(t - last_t) div 86400000000").as("days_since_last_order"))
      .orderBy($"event_id")
  }

  val pointInTimeFeaturesSql: String = """
    WITH u AS (
      SELECT user_id AS k, epoch_us(ts) AS t, 1 AS is_probe, event_id AS eid,
             CAST(NULL AS DOUBLE) AS price
      FROM events
      UNION ALL
      SELECT o_custkey, epoch_us(o_orderdate), 0, o_orderkey, o_totalprice
      FROM orders),
    w AS (
      SELECT *,
        SUM(CASE WHEN is_probe = 0 THEN 1 ELSE 0 END)
          OVER (PARTITION BY k ORDER BY t ASC, is_probe DESC, eid ASC
                ROWS UNBOUNDED PRECEDING) AS cnt,
        SUM(CASE WHEN is_probe = 0 THEN CAST(price AS DECIMAL(38,6)) END)
          OVER (PARTITION BY k ORDER BY t ASC, is_probe DESC, eid ASC
                ROWS UNBOUNDED PRECEDING) AS spend,
        MAX(CASE WHEN is_probe = 0 THEN t END)
          OVER (PARTITION BY k ORDER BY t ASC, is_probe DESC, eid ASC
                ROWS UNBOUNDED PRECEDING) AS last_t
      FROM u)
    SELECT eid AS event_id, k AS user_id, t AS ts_us,
           CAST(cnt AS BIGINT) AS n_orders_before,
           COALESCE(CAST(spend AS DOUBLE), 0.0) AS spend_before,
           (t - last_t) // 86400000000 AS days_since_last_order
    FROM w WHERE is_probe = 1 ORDER BY event_id"""

  /** Recency-weighted engagement per user at a fixed as-of instant —
    * the "time-decayed activity" feature every churn/value model wants.
    * Decay is HYPERBOLIC (weight = 1/(1+age_days)) rather than
    * exponential, deliberately: exp/pow round differently across libm
    * implementations, while integer age (long division) and one double
    * divide/multiply are IEEE-correctly-rounded everywhere — so the same
    * number falls out of any engine, and the cross-engine hash oracle can
    * pin it. Per-row weights stay in double (deterministic), the weighted
    * sum accumulates in DECIMAL(38,6) (order-independent). One scan, one
    * shuffle on user_id, map-side partial aggregation.
    */
  def decayFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asofUs = 1706745600000000L // 2024-02-01 00:00:00 UTC, after all events
    graft.ops.Features.decayWeighted(
        Tables.events(spark, dir).select(
          $"user_id".as("k"), unix_micros($"ts").as("t_us"), $"value"),
        asofUs)
      .select($"k".as("user_id"), $"n_events", $"sum_value", $"decayed_value")
      .orderBy($"user_id")
  }

  val decayFeaturesSql: String = s"""
    WITH a AS (
      SELECT user_id, value,
             (1706745600000000 - epoch_us(ts)) // 86400000000 AS age_days
      FROM events WHERE epoch_us(ts) < 1706745600000000),
    w AS (
      SELECT user_id, value,
             value * (1.0 / (1.0 + CAST(age_days AS DOUBLE))) AS wv
      FROM a)
    SELECT user_id, COUNT(*) AS n_events,
           ${sqlSum("value")} AS sum_value,
           ${sqlSum("wv")} AS decayed_value
    FROM w GROUP BY user_id ORDER BY user_id"""

  /** Peak concurrency per event type — the sweep-line classic: each event
    * opens a half-open 30-minute interval [t, t+30m); emit +1 at the start
    * and -1 at the end, order by (t, delta, id) so an interval ending at
    * the exact instant another starts does NOT overlap it, running-sum,
    * and take the max plus the first instant it was reached. Capacity
    * planning ("how many sessions were ever simultaneously open?") without
    * the quadratic interval self-join: one shuffle on event_type, one
    * linear pass. At 100 TB the timeline for one key never materializes —
    * the window operator streams it.
    */
  def eventsConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Features.peakConcurrency(
        Tables.events(spark, dir).select(
          $"event_type".as("key"), unix_micros($"ts").as("t"),
          $"event_id".as("id")),
        durUs = 1800000000L)
      .select($"key".as("event_type"), $"peak_concurrency", $"first_peak_us")
      .orderBy($"event_type")
  }

  val eventsConcurrencySql: String = """
    WITH pts AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 1800000000, -1, event_id FROM events),
    r AS (
      SELECT event_type, t,
             SUM(delta) OVER (PARTITION BY event_type
                              ORDER BY t ASC, delta ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS cur
      FROM pts),
    m AS (SELECT event_type, CAST(MAX(cur) AS INT) AS peak_concurrency
          FROM r GROUP BY 1)
    SELECT r.event_type, m.peak_concurrency, MIN(r.t) AS first_peak_us
    FROM r JOIN m ON r.event_type = m.event_type AND r.cur = m.peak_concurrency
    GROUP BY r.event_type, m.peak_concurrency
    ORDER BY r.event_type"""

  val registry: Seq[Q] = Seq(
    Q("point_in_time_features", pointInTimeFeatures, Some(pointInTimeFeaturesSql)),
    Q("decay_features", decayFeatures, Some(decayFeaturesSql)),
    Q("events_concurrency", eventsConcurrency, Some(eventsConcurrencySql)))
}
