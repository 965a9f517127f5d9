package graft

import org.apache.spark.sql.functions._
import graft.ops.Events
import graft.olap.StarSchema

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize splits on gaps larger than the threshold") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 10:10:00"), 1.0), // same session (10 min)
      (1L, 12L, ts("2024-01-01 11:30:00"), 1.0), // new session (80 min gap)
      (2L, 20L, ts("2024-01-01 10:00:00"), 1.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Events.sessionize(events)
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)]
      .collect().toSet
    assert(out === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("asof join picks latest right row at-or-before, null when none") {
    val left = Seq((1L, 100L, 1000L), (1L, 150L, 1001L), (1L, 50L, 1002L))
      .toDF("k", "t_us", "event_id")
    val right = Seq((1L, 100L, 7L, 9.9), (1L, 120L, 8L, 8.8))
      .toDF("k", "t_us", "o_orderkey", "o_totalprice")
    val out = Events.asofJoin(left, right, "k", "t_us", Seq("o_orderkey", "o_totalprice"))
      .select($"event_id", $"matched_o_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1000L) === Some(7L)) // at t=100 the t<=100 latest is key 7 (equal time matches)
    assert(out(1001L) === Some(8L)) // t=150 -> latest is t=120
    assert(out(1002L) === None)     // t=50 -> nothing at or before
  }

  test("funnel: strictly-ordered steps; out-of-order events break the chain") {
    val events = Seq(
      // user 1 converts fully in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click BEFORE the first view — chain breaks at stage 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: view then purchase but no click — stage 1 (strict order)
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:30:00"), "purchase"),
      // user 4 never views — not in the funnel at all
      (4L, ts("2024-01-01 10:00:00"), "click"),
      // user 5: a later second view must not resurrect the chain, but a
      // click after the FIRST view counts even with noise between
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 10:01:00"), "error"),
      (5L, ts("2024-01-01 10:02:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.funnel(events, Seq("view", "click", "purchase"))
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    // user 2's only click precedes the first view, so the chain stops at 1
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 2))
    assert(!out.contains(4L), "user with no step-1 event is outside the funnel")
  }

  test("funnelTimings: exact rank median / p90 / integer-sum mean per transition") {
    // three converters view->click at 1, 2 and 10 minutes; one of them
    // goes on to purchase 5 minutes after the click
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:06:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:02:00"), "click"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:10:00"), "click"),
      (4L, ts("2024-01-01 10:00:00"), "view") // never converts
    ).toDF("user_id", "ts", "event_type")
    val out = Events.funnelTimings(events, Seq("view", "click", "purchase"))
      .as[(String, String, Long, Double, Long, Double)].collect().toSeq
    val m = 60e6 // minutes in micros
    assert(out === Seq(
      ("click", "purchase", 1L, 5 * m, (5 * m).toLong, 5 * m),
      ("view", "click", 3L, 2 * m, (10 * m).toLong, (13 * m) / 3)))
  }

  test("retentionCohorts counts distinct users per (cohort week, week offset)") {
    val events = Seq(
      // two users first seen week of Mon 2024-01-01; one returns in week 1
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-10 10:00:00")),
      (2L, ts("2024-01-04 10:00:00")),
      // one user first seen the following week
      (3L, ts("2024-01-09 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.retentionCohorts(events)
      .select($"cohort_week".cast("string"), $"week_n", $"n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-08", 0, 1L)))
  }

  test("scd1Latest keeps exactly the newest row per key") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ver", "payload")
    val out = StarSchema.scd1Latest(df, Seq("k"), Seq($"ver".desc))
      .select("k", "payload").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "b", 2L -> "c"))
  }

  test("windowed aggregation buckets by tumbling window") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (2L, 2L, ts("2024-01-01 10:55:00"), "click", 2.0),
      (3L, 3L, ts("2024-01-01 11:05:00"), "click", 4.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Events.windowed(events, "1 hour")
      .select("window_start_us", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    val h10 = ts("2024-01-01 10:00:00").getTime * 1000
    val h11 = ts("2024-01-01 11:00:00").getTime * 1000
    assert(out === Set((h10, 2L, 3.0), (h11, 1L, 4.0)))
  }

  test("events_ohlc bars: low <= open/close <= high, volumes cover the stream") {
    val rows = SparkEntry.queries("events_ohlc")(spark, sf)
      .select($"open", $"high", $"low", $"close", $"n_events")
      .as[(Double, Double, Double, Double, Long)].collect()
    rows.foreach { case (o, h, l, c, n) =>
      assert(l <= o && o <= h, s"open $o outside [$l, $h]")
      assert(l <= c && c <= h, s"close $c outside [$l, $h]")
      assert(n >= 1)
    }
    assert(rows.map(_._5).sum === graft.sources.Tables.events(spark, sf).count())
  }

  test("user_lifecycle: growth accounting identities hold every week") {
    val rows = SparkEntry.queries("user_lifecycle")(spark, sf)
      .select($"week", $"n_active", $"n_new", $"n_retained",
        $"n_resurrected", $"n_churned")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    rows.foreach { case (_, act, nw, ret, res, _) =>
      assert(act === nw + ret + res, "active must decompose exactly")
    }
    // churned(w) = active(w-1) - retained(w); first week churns nobody
    assert(rows.head._6 === 0L)
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b._6 === a._2 - b._4)
      case _         =>
    }
    assert(rows.map(_._3).sum ===
      graft.sources.Tables.events(spark, sf).select($"user_id").distinct().count())
  }

  test("events_heatmap covers the event count exactly with ISO cells") {
    val rows = SparkEntry.queries("events_heatmap")(spark, sf)
      .select($"iso_dow", $"hr", $"n_events").as[(Int, Int, Long)].collect()
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 7 && r._2 >= 0 && r._2 <= 23))
    assert(rows.map(_._3).sum ===
      graft.sources.Tables.events(spark, sf).count())
    // no duplicate cells
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  test("new_vs_returning: every user is new exactly once, splits add up") {
    val rows = SparkEntry.queries("new_vs_returning")(spark, sf)
      .select($"day", $"n_active", $"n_new", $"n_returning")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.forall(r => r._2 === r._3 + r._4))
    assert(rows.map(_._3).sum ===
      graft.sources.Tables.events(spark, sf)
        .select($"user_id").distinct().count())
    // the first observed day has no history: everyone is new
    assert(rows.head._4 === 0L)
  }

  test("ab_test_zscore: arms partition each type, identities hold exactly") {
    val rows = SparkEntry.queries("ab_test_zscore")(spark, sf).collect()
    assert(rows.nonEmpty)
    val typeCounts = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      // the parity split loses no rows
      assert(na + nb === typeCounts(r.getAs[String]("event_type")))
      // diff is exactly mean_b - mean_a (no hidden re-derivation)
      assert(r.getAs[Double]("diff") ===
        r.getAs[Double]("mean_b") - r.getAs[Double]("mean_a"))
      // SRM chi² is the exact rational (n_a-n_b)²/(n_a+n_b)
      assert(r.getAs[Double]("srm_chi2") ===
        ((na - nb) * (na - nb)).toDouble / (na + nb))
      // the synthetic value metric is arm-independent: z must not scream
      assert(math.abs(r.getAs[Double]("z")) < 5.0)
    }
  }

  test("stickiness: dau/wau exact on a hand case, zero-dau days explicit") {
    val day = 86400000000L
    // u1 active day 0 only; u2 active days 0 and 1
    val df = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, day, 20L))
      .toDF("event_id", "us0", "user_id")
      .withColumn("ts", timestamp_micros($"us0"))
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
    val out = graft.ops.Events.stickiness(df, windowDays = 7)
      .orderBy("day_idx").collect()
    assert(out.length === 2, "window days past the last active day are cut")
    assert(out(0).getAs[Long]("dau") === 2L)
    assert(out(0).getAs[Long]("wau") === 2L)
    assert(out(0).getAs[Double]("stickiness") === 1.0)
    assert(out(1).getAs[Long]("dau") === 1L)
    assert(out(1).getAs[Long]("wau") === 2L, "u1's day-0 activity stays in the trailing week")
    assert(out(1).getAs[Double]("stickiness") === 0.5)
  }

  test("userConcentration: top decile share, deterministic tie cut") {
    // 10 users: u1 fires 10 events, u2..u10 one each → top decile is
    // exactly 1 user (ceil(10/10)), holding 10 of 19 events
    val rows = (1L to 10L).map(i => (i, 0L, 1L)) ++
      (11L to 19L).map(i => (i, 0L, i - 9L))
    val df = rows.toDF("event_id", "us0", "user_id")
      .withColumn("ts", timestamp_micros($"us0"))
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
    val out = graft.ops.Events.userConcentration(df).collect()(0)
    assert(out.getAs[Long]("n_users") === 10L)
    assert(out.getAs[Long]("top_users") === 1L)
    assert(out.getAs[Long]("top_events") === 10L)
    assert(out.getAs[Long]("total_events") === 19L)
    assert(out.getAs[Double]("top_share") === 10.0 / 19.0)
  }

  test("attributionBase: window bounds, tie inclusion, deterministic first/last") {
    val week = 7L * 86400000000L
    // user 1: view@1000, click@2000, purchase@3000 — both touches in window
    // user 2: purchase@5000 with no touches at all
    // user 3: view@0, purchase@(week+1) — the view fell JUST out of window
    // user 4: click@7777 AND purchase@7777 (tie) — at-or-before includes it
    val df = Seq(
      (1L, 1000L, 10L, "view", 1.0), (2L, 2000L, 10L, "click", 1.0),
      (3L, 3000L, 10L, "purchase", 10.0),
      (4L, 5000L, 20L, "purchase", 7.0),
      (5L, 0L, 30L, "view", 1.0), (6L, week + 1L, 30L, "purchase", 3.0),
      (7L, 7777L, 40L, "click", 1.0), (8L, 7777L, 40L, "purchase", 2.0)
    ).toDF("event_id", "us0", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"us0")).drop("us0")
    val out = graft.ops.Events.attributionBase(df)
      .orderBy("user_id").collect()
    assert(out.length === 4)
    val u1 = out(0)
    assert(u1.getAs[Long]("n_view") === 1L)
    assert(u1.getAs[Long]("n_click") === 1L)
    assert(u1.getAs[Long]("n_touches") === 2L)
    assert(u1.getAs[String]("first_key").endsWith("view"))
    assert(u1.getAs[String]("last_key").endsWith("click"))
    val u2 = out(1)
    assert(u2.getAs[Long]("n_touches") === 0L)
    assert(u2.isNullAt(u2.fieldIndex("first_key")))
    val u3 = out(2)
    assert(u3.getAs[Long]("n_touches") === 0L, "touch beyond 7d must not count")
    val u4 = out(3)
    assert(u4.getAs[Long]("n_touches") === 1L, "same-instant touch counts")
    assert(u4.getAs[String]("last_key").endsWith("click"))
  }

  test("attribution entries reconcile to total purchase revenue") {
    val linear = SparkEntry.queries("attribution_linear")(spark, sf).collect()
    val total = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .agg(sum($"value".cast("decimal(38,6)"))).as[java.math.BigDecimal]
      .head()
    // linear credit + untouched 'none' bucket must add back to the total
    // (each purchase's value splits exactly across its touch types)
    val credited = linear.map(r =>
      Option(r.getAs[Double]("attributed_value")).getOrElse(0.0)).sum
    assert(math.abs(credited - total.doubleValue()) < 1e-3,
      s"linear attribution lost value: $credited vs $total")
    val pos = SparkEntry.queries("attribution_position")(spark, sf).collect()
    val models = pos.map(_.getAs[String]("model")).distinct.sorted
    assert(models.toSeq === Seq("first_touch", "last_touch"))
    // each model credits every touched purchase exactly once
    val byModel = pos.groupBy(_.getAs[String]("model"))
      .view.mapValues(_.map(_.getAs[Long]("n_conversions")).sum).toMap
    assert(byModel("first_touch") === byModel("last_touch"))
  }
}
