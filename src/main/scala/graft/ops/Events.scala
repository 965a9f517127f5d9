package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators (batch forms; the streaming pipeline in
  * `graft.streaming` reuses the same shapes with watermarks).
  *
  * These are the set-oriented analogues of the reference's change-worker:
  * the worker consumes a NOTIFY stream one record at a time
  * (worker_sync.py:71-108); here the stream is a table and each operator is
  * one partitioned plan.
  */
object Events {

  /** Epoch-day index of a timestamp — the ONE load-bearing form every
    * daily operator and its oracle must share: it matches DuckDB's
    * `datediff('day', DATE '1970-01-01', CAST(ts AS DATE))` exactly
    * (UTC session both sides). */
  private[ops] def dayIdx(ts: Column): Column =
    datediff(to_date(ts), lit("1970-01-01")).cast("long")

  /** Strict sequential funnel: per user, the first `steps.head` event, then
    * the first `steps(1)` event strictly AFTER it, and so on — the classic
    * conversion-funnel question asked set-orientedly: one min-timestamp
    * aggregate per step, each joined to the previous frontier (every
    * shuffle is user-keyed; no per-user event sorting, no UDAF state).
    * `stage` = how many steps the user completed in order.
    *
    * Each step-i frontier is eagerly checkpointed: frame i feeds BOTH
    * frame i+1 and the final assembly join, and frame construction chains,
    * so without materialization Catalyst re-derives every earlier frontier
    * inside every later one — k steps planned k(k+1)/2 fact scans (6 scans
    * for 3 steps, measured) instead of one pushed-filter scan per step.
    * Frontiers are user-sized (not fact-sized), so the checkpoint is the
    * cheap side of that trade at any scale; PlanAuditSpec pins the
    * scan-per-step shape.
    *
    * @return one row per user who reached step 1: (user_id, step_1_ts …
    *         step_k_ts, stage); later steps NULL once the chain breaks */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("step_1_ts"))
      .localCheckpoint(true)
    // each frame is exactly (user_id, step_i_ts): the step-i frontier
    val frames = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) =>
        events.filter(col("event_type") === step)
          .join(prev, "user_id")
          .filter(col("ts") > col(s"step_${i}_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"step_${i + 1}_ts"))
          .localCheckpoint(true)
    }
    val joined = frames.tail.foldLeft(first) { (acc, f) =>
      acc.join(f, Seq("user_id"), "left")
    }
    val tsCols = (1 to steps.size).map(i => col(s"step_${i}_ts"))
    joined
      .select(col("user_id") +: tsCols :+
        tsCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _).as("stage"): _*)
  }

  /** Per-transition conversion-latency summary over [[funnel]] — the
    * "how long does each funnel step take" dashboard row product teams
    * read next to the conversion counts: for every consecutive step pair,
    * the converted-user count and the EXACT median / nearest-rank p90 /
    * mean of (step i+1 ts − step i ts). Exactness discipline as in the
    * exact-median entry: manual rank-position selection and integer sums
    * (one IEEE division at the end) instead of percentile()/avg(), whose
    * interpolation and accumulation arithmetic differ across engines.
    *
    * All transitions extract in ONE pass over the funnel frame (array +
    * explode — no per-transition re-joins); the rank window partitions by
    * transition, so the sort is per-transition over converted users only
    * (user-sized, never fact-sized). */
  def funnelTimings(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "need at least one transition")
    val f = funnel(events, steps)
    val durs = f.select(explode(array((1 until steps.size).map { i =>
        struct(lit(steps(i - 1)).as("from_step"), lit(steps(i)).as("to_step"),
          (unix_micros(col(s"step_${i + 1}_ts")) - unix_micros(col(s"step_${i}_ts")))
            .as("dur_us"))
      }: _*)).as("t"))
      .select(col("t.from_step").as("from_step"), col("t.to_step").as("to_step"),
        col("t.dur_us").as("dur_us"))
      .filter(col("dur_us").isNotNull)
    val wOrd = Window.partitionBy(col("from_step"), col("to_step"))
      .orderBy(col("dur_us"))
    val wAll = Window.partitionBy(col("from_step"), col("to_step"))
    durs
      .select(col("from_step"), col("to_step"), col("dur_us"),
        row_number().over(wOrd).as("rn"), count(lit(1)).over(wAll).as("n"))
      .groupBy(col("from_step"), col("to_step"))
      .agg(max(col("n")).as("n_converted"),
        ((max(when(expr("rn = (n + 1) div 2"), col("dur_us"))) +
          max(when(expr("rn = (n + 2) div 2"), col("dur_us")))) / 2.0)
          .as("median_us"),
        max(when(expr("rn = (9 * n + 9) div 10"), col("dur_us"))).as("p90_us"),
        (sum(col("dur_us")).cast("double") / max(col("n"))).as("mean_us"))
      .orderBy(col("from_step"), col("to_step"))
  }

  /** Weekly retention cohorts: users grouped by the week of their FIRST
    * event; each (cohort week, weeks-since) cell counts the cohort's users
    * active that week. The fact scans ONCE (PlanAuditSpec pins it): the
    * distinct (user, week) base is the only fact-sized aggregate, and the
    * cohort week DERIVES from it — week truncation is monotone, so
    * week(min ts) = min(active_week) — rather than re-aggregating the
    * fact. Everything after the base is user-weeks-sized. Weeks are
    * `date_trunc('week', …)` Mondays in both engines, so the week index is
    * an exact day-difference division. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val activeWeeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("active_week"))
      .distinct()
    // cohort as a whole-partition window min instead of a join back to a
    // separate first-event aggregate: a second aggregate over the same base
    // re-plans as a second fact scan (the optimizer collapses the shared
    // subtree into the scan, defeating exchange reuse — measured), while
    // the window rides the user-keyed exchange over user-weeks-sized rows
    val cohort = min(col("active_week"))
      .over(Window.partitionBy(col("user_id"))).as("cohort_week")
    activeWeeks.select(col("user_id"), col("active_week"), cohort)
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7).cast("int").as("week_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Per-user daily gap fill: the calendar-grid densification every
    * time-series pipeline runs before rolling statistics — aggregate the
    * fact to (user, day), expand every user to the corpus-wide day span,
    * and fill the holes (count 0, measure forward-filled from the last
    * observed day; `is_gap` marks synthesized rows).
    *
    * Shuffle shape: the fact aggregates ONCE keyed (user_id, day_idx) and
    * that aggregate is eagerly checkpointed — the day-span bounds, the
    * distinct-user list and the grid's left-join probe all read it, and
    * without materialization each branch would re-plan the whole fact
    * aggregation (the funnel lesson). The span is a 1-row broadcast; the
    * grid explodes MAP-SIDE from the user list (users × days rows are
    * born already user-partitioned — they never travel a shuffle); the
    * fill window rides the same user key. At 100 TB the grid is
    * |users| × |days| — bounded by dimension sizes, not the fact.
    *
    * Day indexing is an exact integer day-difference from the epoch, so
    * the grid arithmetic (`sequence(lo, hi)`) and the oracle's
    * `generate_series` agree bit-for-bit. */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), dayIdx(col("ts")).as("day_idx"))
      .agg(count(lit(1)).as("n_events"),
           graft.queries.Exact.dsum(col("value")).as("day_value"))
      .localCheckpoint(true)
    val bounds = daily.agg(min(col("day_idx")).as("lo"), max(col("day_idx")).as("hi"))
    val grid = daily.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day_idx"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
    grid.join(daily, Seq("user_id", "day_idx"), "left")
      .select(col("user_id"), col("day_idx"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(byUser).as("ffill_value"),
        col("n_events").isNull.cast("int").as("is_gap"))
  }

  /** Per-user event-type transition matrix (first-order Markov counts):
    * for every consecutive event pair in a user's timeline, the
    * (from_type → to_type) count and the conditional probability
    * p(to | from). One user-keyed shuffle for the ordered lead; the
    * (from, to) aggregate shuffles pre-reduced pairs; the conditional
    * divisor is a window over the |types|² matrix — nothing at scale.
    * The probability is one long/long double division, IEEE-identical
    * across engines. */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val bySrc = Window.partitionBy(col("from_type"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_trans", col("n_trans").cast("double") /
        sum(col("n_trans")).over(bySrc).cast("double"))
  }

  /** Trailing-window distinct actives: for every day in the observed
    * span, the distinct users active in the trailing `windowDays` days —
    * the DAU/WAU/MAU rollup. The fact reduces to distinct (user, day)
    * FIRST (the only fact-sized shuffle, checkpointed because the span
    * bound and the expansion both read it); each user-day then expands
    * MAP-SIDE to the ≤ windowDays trailing windows it participates in,
    * and the per-day distinct shuffles map-side-deduped (day, user)
    * pairs. At 100 TB the expansion factor is the window length — and
    * when even that is too hot, the [[Sketches]] family's mergeable HLL
    * per day bucket replaces the exact distinct (the incremental_distinct
    * pattern) with KB-sized sketch merges. */
  def slidingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events
      .select(col("user_id"), dayIdx(col("ts")).as("day_idx"))
      .distinct()
      .localCheckpoint(true)
    val bounds = userDays.agg(max(col("day_idx")).as("hi"))
    userDays
      .select(col("user_id"),
        explode(sequence(col("day_idx"),
          col("day_idx") + lit(windowDays - 1).cast("long"))).as("w_day"))
      .crossJoin(broadcast(bounds))
      .filter(col("w_day") <= col("hi"))
      .groupBy(col("w_day").as("day_idx"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** DAU/WAU stickiness — the engagement ratio product dashboards lead
    * with: per day, distinct users active THAT day (DAU) over distinct
    * users active in the trailing `windowDays` (WAU), stickiness =
    * dau/wau ∈ (0, 1]. Same reduction discipline as
    * [[slidingActiveUsers]]: the fact collapses to distinct (user, day)
    * FIRST (one user-keyed shuffle — the checkpointed frame feeds both
    * aggregates), the trailing window is a bounded ≤`windowDays`-row
    * explode of that user-day frame (never the fact), and DAU is a plain
    * count over the same frame. Counts are exact longs; stickiness is ONE
    * long/long IEEE division — engine-identical. Days inside another
    * user's trailing window but with no activity of their own carry
    * dau = 0 explicitly. */
  def stickiness(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events
      .select(col("user_id"), dayIdx(col("ts")).as("day_idx"))
      .distinct()
      .localCheckpoint(true)
    val bounds = userDays.agg(max(col("day_idx")).as("hi"))
    val wau = userDays
      .select(col("user_id"),
        explode(sequence(col("day_idx"),
          col("day_idx") + lit(windowDays - 1).cast("long"))).as("w_day"))
      .crossJoin(broadcast(bounds))
      .filter(col("w_day") <= col("hi"))
      .groupBy(col("w_day").as("day_idx"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val dau = userDays.groupBy(col("day_idx")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("day_idx"), "left")
      .select(col("day_idx"), coalesce(col("dau"), lit(0L)).as("dau"),
        col("wau"),
        (coalesce(col("dau"), lit(0L)).cast("double") /
          col("wau").cast("double")).as("stickiness"))
  }

  /** Activity concentration: what share of all events comes from the top
    * decile (⌈n/10⌉, at least one) of users by event count — the skew
    * read-out that decides whether per-user salting or a heavy-hitter
    * path is worth wiring in. One user-keyed count, then ranking and
    * shares over the |users|-sized rollup (ties broken by user_id — the
    * cut is deterministic); all integers plus ONE final division. */
  def userConcentration(events: DataFrame): DataFrame = {
    val byUser = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("user_id"))
    val wAll = Window.partitionBy()
    byUser
      .select(col("n"), row_number().over(w).as("rk"),
        count(lit(1)).over(wAll).as("n_users"),
        sum(col("n")).over(wAll).as("total_events"))
      .filter(col("rk") <= expr("(n_users + 9) div 10"))
      // keyed group (constant key, dropped) so an EMPTY stream yields an
      // empty frame, not one all-NULL row — a global agg would fabricate it
      .groupBy(lit(1).as("_g"))
      .agg(max(col("n_users")).as("n_users"),
        count(lit(1)).as("top_users"),
        sum(col("n")).as("top_events"),
        max(col("total_events")).as("total_events"))
      .select(col("n_users"), col("top_users"), col("top_events"),
        col("total_events"),
        (col("top_events").cast("double") /
          col("total_events").cast("double")).as("top_share"))
  }

  /** Daily-count anomaly flags: per event type, z-score every day's
    * event count against that type's mean/stddev and flag |z| ≥ `z` —
    * the volume-anomaly monitor a pipeline runs over its telemetry. One
    * (type, day) aggregate over the fact, then windowed moments over the
    * |types| × |days| result (no second scan, no join); every input to
    * the z formula is an integer count, so the double arithmetic is
    * exact below 2⁵³ and the score replays bit-for-bit on any engine
    * (sums of squared daily counts pass 2⁵³ only around 10¹¹ events per
    * type-day — beyond even the 100 TB posture). A type observed on a
    * single day, or with zero variance, has no defined z — those rows
    * carry NULL z and a false flag EXPLICITLY (guarded before the
    * division: Spark's NULL-on-zero-divide and DuckDB's IEEE NaN would
    * otherwise diverge). */
  def anomalyDailyCounts(events: DataFrame, z: Double = 2.0): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val daily = events
      .groupBy(col("event_type"), dayIdx(col("ts")).as("day_idx"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("day_idx"), col("n_events"),
        count(lit(1)).over(byType).cast("double").as("n_days"),
        sum(col("n_events")).over(byType).cast("double").as("s"),
        sum(col("n_events") * col("n_events")).over(byType).cast("double").as("ss"))
    val varNum = col("ss") - col("s") * col("s") / col("n_days")
    val zscore = when(col("n_days") > lit(1.0) && varNum > lit(0.0),
      (col("n_events").cast("double") - col("s") / col("n_days")) /
        sqrt(varNum / (col("n_days") - lit(1.0))))
    daily.select(col("event_type"), col("day_idx"), col("n_events"),
      zscore.as("z"),
      coalesce(abs(zscore) >= lit(z), lit(false)).as("is_anomaly"))
  }

  /** Tumbling-window aggregation: one shuffle on (window, key); partial
    * aggregation happens map-side so the shuffle carries pre-reduced rows. */
  def windowed(events: DataFrame, every: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.queries.Exact.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** SLIDING-window aggregation (`window(ts, width, slide)`): each event
    * contributes to width/slide overlapping windows — the moving-rate
    * view a monitoring pipeline reads (tumbling is the slide = width
    * special case, [[windowed]]). Spark expands the window assignment
    * MAP-SIDE before the one (window, key) shuffle, so the shuffle
    * carries pre-reduced rows exactly like the tumbling case, inflated
    * only by the overlap factor. */
  def slidingWindowed(events: DataFrame, width: String = "2 hours",
                      slide: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.queries.Exact.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionization: a session breaks after `gapUs` of silence per
    * user. Two windows over one shuffle on user_id: a lag to flag session
    * starts, a running sum to number sessions, then a grouped rollup.
    * All time arithmetic is in epoch-microsecond longs so results are
    * engine-exact. */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
           max(col("ts_us")).as("session_end_us"),
           count(lit(1)).as("n_events"),
           graft.queries.Exact.dsum(col("value")).as("sum_value"))
  }

  /** Session-gap tuning curve — the threshold read behind [[sessionize]]'s
    * fixed 30 minutes: for each candidate gap, the session count the
    * corpus would break into, events per session, and total/average
    * in-session time. Everything derives from ONE per-user delta frame
    * (the same lag [[sessionize]] flags session starts with — a user's
    * first event carries a NULL delta and always opens a session;
    * n_sessions = opens + breaks, and summed in-session deltas ARE the
    * summed session durations, since each session's end − start telescopes
    * over its internal deltas). The candidate gaps explode onto the
    * delta rows map-side after the one user_id window shuffle; the
    * aggregate is |gaps|-rowed with map-side partials — sweeping five
    * thresholds costs the same shuffle as sweeping one. Same boundary
    * convention as [[sessionize]]: delta == gap stays in-session. */
  def sessionGapCurve(events: DataFrame,
                      gapMinutes: Seq[Long] = Seq(5L, 15L, 30L, 60L, 120L))
      : DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val deltas = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("delta", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
    deltas
      .select(col("delta"),
        explode(array(gapMinutes.map(m => lit(m * 60L * 1000000L)): _*)).as("gap_us"))
      .groupBy(col("gap_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("delta").isNull || col("delta") > col("gap_us"), 1L)
          .otherwise(0L)).as("n_sessions"),
        sum(when(col("delta").isNotNull && col("delta") <= col("gap_us"), col("delta"))
          .otherwise(0L)).as("in_session_us"))
      .select(col("gap_us"), col("n_events"), col("n_sessions"),
        (col("n_events").cast("double") / col("n_sessions")).as("events_per_session"),
        col("in_session_us"),
        (col("in_session_us").cast("double") / col("n_sessions")).as("avg_session_us"))
      .orderBy(col("gap_us"))
  }

  /** Gap-based sessionization through Spark's NATIVE session_window
    * aggregation (one shuffle, streaming-compatible state shape) — same
    * session semantics as [[sessionize]] (a gap strictly greater than
    * `gap` breaks the session) but grouped by the built-in operator
    * instead of lag/sum windows; emits the same measures minus the
    * session ordinal (session identity is the window itself).
    *
    * Note the boundary convention: session_window merges events strictly
    * less than `gap` apart, [[sessionize]] keeps ties (delta == gap) in
    * the same session — identical outputs unless two events land exactly
    * gap apart (microsecond data: measure-zero; the oracle mirrors
    * [[sessionize]]'s convention, so a collision would surface as a diff). */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
           max(unix_micros(col("ts"))).as("session_end_us"),
           count(lit(1)).as("n_events"),
           graft.queries.Exact.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
              col("n_events"), col("sum_value"))

  /** As-of join: attach to each left row the latest right row whose time is
    * at-or-before the left's, per key — composed from a tagged union + one
    * `last(ignoreNulls)` running window. This is the merge-join formulation:
    * ONE shuffle+sort on (key, time) regardless of sides' sizes, never the
    * per-key cross product a naive range join would build.
    *
    * Right side must be unique per (key, time); callers pre-reduce
    * (e.g. latest orderkey per day) to keep the match deterministic.
    *
    * @param valueCols right-side columns to carry onto matches
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, timeUs: String,
               valueCols: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__evt", lit(1))
      .select(Seq(col(key), col(timeUs), col("__evt")) ++
              valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
              left.columns.filterNot(c => c == key || c == timeUs).map(col): _*)
    val rTagged = right.withColumn("__evt", lit(0))
      .select(Seq(col(key), col(timeUs), col("__evt")) ++
              valueCols.map(col) ++
              left.columns.filterNot(c => c == key || c == timeUs)
                .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows sort before left rows at equal time => "at-or-before" match
    val w = Window.partitionBy(col(key)).orderBy(col(timeUs), col("__evt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matchedCols = valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(s"matched_$c"))
    lTagged.unionByName(rTagged)
      .select(Seq(col("*")) ++ matchedCols: _*)
      .filter(col("__evt") === 1)
      .drop("__evt")
      .drop(valueCols: _*)
  }

  /** Per-conversion touch context for marketing attribution: for every
    * `convType` event, the touch activity of the same user in the trailing
    * `windowUs` microseconds — per-touch-type counts, total touches, and
    * the first/last touch inside the window (type + identity).
    *
    * No self-join: everything is ONE value-range window per user over the
    * event stream (RANGE BETWEEN windowUs PRECEDING AND CURRENT ROW on the
    * epoch-us order key — at-or-before semantics, a touch sharing the
    * conversion's exact timestamp counts). First/last are picked
    * deterministically even under timestamp ties by min/max over a
    * lexicographic key string `zero-padded(us) ++ zero-padded(event_id) ++
    * type` — a total order both engines compare identically, with the
    * touch type carried in the suffix so no join-back is needed. At 100 TB
    * this is one user-keyed shuffle of the event stream and a linear
    * window pass; the output is conversion-sized.
    *
    * @return (event_id, user_id, us, value, first_key, last_key,
    *         n_<type>…, n_touches) — one row per conversion event
    */
  def attributionBase(events: DataFrame,
                      touchTypes: Seq[String] = Seq("view", "click"),
                      convType: String = "purchase",
                      windowUs: Long = 7L * 86400000000L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-windowUs, 0)
    val keyed = events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      // the zero-padded key is a lexicographic total order ONLY for
      // non-negative us/event_id (a '-' sign makes padding non-positional
      // and inverts order among negatives) — the events contract is
      // post-epoch ts and non-negative ids (Tables.events); fail loudly
      // rather than silently mis-order if a caller feeds pre-epoch data.
      // NULLs are the same silent-mis-order class: a NULL us/event_id slips
      // past `< 0` (three-valued logic), yielding either the text "null" in
      // the key (sorts after every digit) or a NULL tkey dropped from
      // first/last while the row still counts in n_touches — and a NULL us
      // on a touch or conversion row also breaks the range window itself.
      // Guard every attribution-relevant row (touch or conversion), not
      // just the key branch.
      .withColumn("us",
        when(col("event_type").isin((touchTypes :+ convType): _*) &&
            (col("us").isNull || col("event_id").isNull),
          raise_error(concat(
            lit("attributionBase: NULL ts/event_id on a "),
            col("event_type"),
            lit(" row — the range window and lexicographic touch key " +
              "require non-NULL, non-negative us/event_id; got us="),
            coalesce(col("us").cast("string"), lit("NULL")),
            lit(" event_id="),
            coalesce(col("event_id").cast("string"), lit("NULL")))))
          .otherwise(col("us")))
      .withColumn("tkey",
        when(col("event_type").isin(touchTypes: _*),
          when(col("us") < 0 || col("event_id") < 0,
            raise_error(concat(
              lit("attributionBase: us/event_id must be non-negative for " +
                "the lexicographic touch key; got us="),
              col("us"), lit(" event_id="), col("event_id"))))
            .otherwise(format_string("%020d%012d%s",
              col("us"), col("event_id"), col("event_type")))))
      .withColumn("first_key", min(col("tkey")).over(w))
      .withColumn("last_key", max(col("tkey")).over(w))
    val counted = touchTypes.foldLeft(keyed) { (df, t) =>
      df.withColumn(s"n_$t",
        sum(when(col("event_type") === t, 1L).otherwise(0L)).over(w))
    }
    counted.filter(col("event_type") === convType)
      .withColumn("n_touches", touchTypes.map(t => col(s"n_$t")).reduce(_ + _))
      .drop("tkey", "event_type")
  }
}
