package graft

import org.apache.spark.sql.functions._
import graft.ops.Features

/** Hand-case pins for the feature-engineering operators: leakage semantics,
  * tie behavior at equal timestamps, half-open interval boundaries, and the
  * decay weight function — the contracts the sf oracles exercise only
  * statistically. */
class FeaturesSpec extends SparkSpec {

  import spark.implicits._

  test("pointInTime counts strictly-before history; same-instant rows excluded") {
    // probe at t=100 for key 1; history at t=99 (before), t=100 (same
    // instant — must NOT count), t=101 (future — must NOT count)
    val probes = Seq((1L, 100L, 10L)).toDF("k", "t", "eid")
    val history = Seq(
      (1L, 99L, 1L, 5.0), (1L, 100L, 2L, 7.0), (1L, 101L, 3L, 11.0)
    ).toDF("k", "t", "hid", "price")
    val out = Features.pointInTime(probes, history).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_before") === 1L)
    assert(r.getAs[java.math.BigDecimal]("sum_before").doubleValue() === 5.0)
    assert(r.getAs[Long]("last_t") === 99L)
  }

  test("pointInTime isolates keys and yields zero-count probes with null last_t") {
    val probes = Seq((1L, 50L, 10L), (2L, 50L, 11L)).toDF("k", "t", "eid")
    val history = Seq((2L, 40L, 1L, 3.0), (2L, 45L, 2L, 4.0))
      .toDF("k", "t", "hid", "price")
    val out = Features.pointInTime(probes, history)
      .orderBy("eid").collect()
    assert(out(0).getAs[Long]("n_before") === 0L) // key 1: no history at all
    assert(out(0).isNullAt(out(0).fieldIndex("last_t")))
    assert(out(1).getAs[Long]("n_before") === 2L)
    assert(out(1).getAs[java.math.BigDecimal]("sum_before").doubleValue() === 7.0)
    assert(out(1).getAs[Long]("last_t") === 45L)
  }

  test("pointInTime never leaks the future regardless of probe position") {
    // interleaved probes see strictly-growing prefixes of the same history
    val probes = Seq((1L, 10L, 100L), (1L, 30L, 101L), (1L, 50L, 102L))
      .toDF("k", "t", "eid")
    val history = Seq((1L, 20L, 1L, 1.0), (1L, 40L, 2L, 2.0))
      .toDF("k", "t", "hid", "price")
    val got = Features.pointInTime(probes, history).orderBy("eid")
      .select($"eid", $"n_before").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((100L, 0L), (101L, 1L), (102L, 2L)))
  }

  test("decayWeighted: weight 1/(1+age_days), future rows excluded") {
    val day = 86400000000L
    val asof = 10L * day
    val events = Seq(
      (1L, asof - 1L, 1.0),        // age 0 days → weight 1
      (1L, asof - day, 2.0),       // age 1 day  → weight 1/2
      (1L, asof - 3 * day, 4.0),   // age 3 days → weight 1/4
      (1L, asof + 1L, 100.0)       // future → excluded entirely
    ).toDF("k", "t_us", "value")
    val r = Features.decayWeighted(events, asof).collect().head
    assert(r.getAs[Long]("n_events") === 3L)
    assert(r.getAs[Double]("sum_value") === 7.0)
    assert(r.getAs[Double]("decayed_value") === 1.0 + 1.0 + 1.0)
  }

  test("peakConcurrency: overlap counts, half-open boundary does not") {
    val pts = Seq(
      // key "a": [0,10) and [5,15) overlap → peak 2 first reached at t=5;
      // [15,25) starts exactly when [5,15) ends → NOT concurrent with it
      ("a", 0L, 1L), ("a", 5L, 2L), ("a", 15L, 3L),
      // key "b": disjoint intervals → peak 1 at t=0
      ("b", 0L, 4L), ("b", 100L, 5L)
    ).toDF("key", "t", "id")
    val got = Features.peakConcurrency(pts, durUs = 10L)
      .orderBy("key")
      .as[(String, Int, Long)].collect()
    assert(got.toSeq === Seq(("a", 2, 5L), ("b", 1, 0L)))
  }

  test("peakConcurrency ties: first peak instant is the earliest, deterministically") {
    // two separate instants both reach peak 2 — report the first
    val pts = Seq(
      ("a", 0L, 1L), ("a", 1L, 2L),   // peak 2 at t=1
      ("a", 100L, 3L), ("a", 101L, 4L) // peak 2 again at t=101
    ).toDF("key", "t", "id")
    val got = Features.peakConcurrency(pts, durUs = 5L).collect().head
    assert(got.getAs[Int]("peak_concurrency") === 2)
    assert(got.getAs[Long]("first_peak_us") === 1L)
  }

  test("registry feature queries: single window shuffle, no cartesian, pruned scans") {
    val ptf = planOf(graft.queries.FeatureQueries.pointInTimeFeatures(spark, sf))
    assert(!ptf.contains("CartesianProduct"))
    assert(ptf.contains("Window"))
    // events scan must not read the unused props/value columns for PIT
    val evScan = ptf.linesIterator.filter(_.contains("events.parquet")).mkString
    assert(!evScan.contains("props"))
    val conc = planOf(graft.queries.FeatureQueries.eventsConcurrency(spark, sf))
    assert(!conc.contains("CartesianProduct"))
    assert(!conc.contains("Join")) // sweep-line replaces the interval self-join
  }
}
