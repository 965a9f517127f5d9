package graft

import org.apache.spark.sql.functions._
import graft.functions.{MGBuffer, MisraGries}
import graft.ops.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def assertBounds(items: Seq[String], est: Map[String, Long], k: Int): Unit = {
    val exact = exactCounts(items)
    val n = items.size.toLong
    est.foreach { case (item, c) =>
      assert(c <= exact.getOrElse(item, 0L), s"MG overestimated '$item'")
    }
    exact.foreach { case (item, f) =>
      // every heavy hitter above n/(k+1) must be present within the bound
      if (f * (k + 1) > n) {
        val c = est.getOrElse(item, 0L)
        assert(c > 0, s"heavy hitter '$item' (f=$f, n=$n) missing from sketch")
        assert(c * (k + 1) >= f * (k + 1) - n, s"'$item' below the MG bound")
      }
    }
  }

  test("MGBuffer holds the Misra-Gries guarantee on an adversarial stream and stays O(k)") {
    val k = 4
    // heavy 'a' (40) and 'b' (25) against 60 distinct one-off items that
    // force constant decrement churn; interleave worst-case
    val items = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      (1 to 60).map(i => s"junk$i")).zipWithIndex
      .sortBy { case (_, i) => (i * 31) % 125 }.map(_._1)
    val buf = new MGBuffer(k)
    items.foreach(buf.addOne)
    assert(buf.counts.size <= k, "buffer exceeded k counters")
    assertBounds(items, buf.sortedEntries.toMap, k)
    // serialize roundtrip is lossless
    val back = MGBuffer.deserialize(buf.serialize(), k)
    assert(back.sortedEntries.toSeq === buf.sortedEntries.toSeq)
  }

  test("MGBuffer merge keeps the summed-error bound across shards") {
    val k = 8
    val shard1 = Seq.fill(50)("x") ++ (1 to 40).map(i => s"s1_$i")
    val shard2 = Seq.fill(30)("x") ++ Seq.fill(25)("y") ++ (1 to 40).map(i => s"s2_$i")
    val b1 = new MGBuffer(k); shard1.foreach(b1.addOne)
    val b2 = new MGBuffer(k); shard2.foreach(b2.addOne)
    b1.mergeFrom(b2)
    assert(b1.counts.size <= k, "merged buffer exceeded k counters")
    assertBounds(shard1 ++ shard2, b1.sortedEntries.toMap, k)
  }

  test("heavy-hitter sketch table end-to-end: per-shard rows, merged bounds vs exact") {
    val k = 16
    val rows = (1 to 400).map { i =>
      val item = if (i % 3 == 0) "hot" else if (i % 5 == 0) "warm" else s"cold$i"
      (i.toLong % 2, i.toLong % 4, item)
    }
    val df = rows.toDF("bucket", "shard", "item")
    val sketches = Sketches.heavyHitterSketch(df, $"bucket", $"shard", $"item", k)
    // one KB-sized row per (bucket, shard) — the persisted shape
    assert(sketches.count() === df.select($"bucket", $"shard").distinct().count())
    val merged = Sketches.heavyHittersMerged(sketches, k)
      .as[(Long, Long, String, Long)].collect()
    rows.groupBy(_._1).foreach { case (bucket, bucketRows) =>
      val est = merged.filter(_._1 == bucket).map(r => r._3 -> r._4).toMap
      assertBounds(bucketRows.map(_._3), est, k)
      val n = merged.filter(_._1 == bucket).head._2
      assert(n === bucketRows.size.toLong, "n_bucket must be the exact total weight")
    }
  }

  test("histogram sketch: bin edges invert the bin assignment and merged ranks bracket the true quantile") {
    val nbins = 7 // deliberately not dividing the domain evenly
    val lo = 10L; val hi = 109L // width 100
    val values = (10L to 109L) ++ Seq.fill(50)(42L) ++ Seq.fill(30)(100L)
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong % 3, v) }
      .toDF("bucket", "v")
    val sk = Sketches.histogramSketch(df, $"bucket", $"v", lo, hi, nbins)
    // bins stay within [0, nbins) and every bucket has <= nbins rows
    val bins = sk.select($"bin").as[Long].collect()
    assert(bins.forall(b => b >= 0 && b < nbins))
    assert(sk.groupBy($"bucket").count().as[(Long, Long)].collect()
      .forall(_._2 <= nbins))
    // single merged subset over everything
    val est = Sketches.histogramQuantiles(
      sk.withColumn("subset", lit("all")).drop("bucket"),
      $"subset", Seq((1, 2), (9, 10)), lo, hi, nbins)
      .as[(String, Int, Int, Long, Long, Long, Long)].collect()
    val sorted = values.sorted
    est.foreach { case (_, num, den, n, rank, estLo, estHi) =>
      assert(n === values.size.toLong)
      assert(rank === (n * num + den - 1) / den)
      val exact = sorted(rank.toInt - 1)
      assert(exact >= estLo && exact <= estHi,
        s"true rank-$rank value $exact outside sketch bin [$estLo, $estHi]")
    }
    // out-of-domain values clamp to the edge bins instead of corrupting bin ids
    val clamped = Sketches.histogramSketch(
      Seq((1L, 5L), (1L, 500L)).toDF("bucket", "v"), $"bucket", $"v", lo, hi, nbins)
      .select($"bin").as[Long].collect().sorted
    assert(clamped === Array(0L, nbins - 1L))
  }

  test("countMin: bounded cells, cell-sum merge, never underestimates, collisions overestimate") {
    // 8 distinct items with frequencies 1..8 into width 2 × depth 2 —
    // collisions are unavoidable, so some estimate MUST overcount; none
    // may ever undercount (CM's deterministic property)
    val rows = (1 to 8).flatMap(i => Seq.fill(i)((s"item_$i", i % 3)))
    val df = rows.toDF("item", "b")
    val sk = Sketches.countMinSketch(df, $"b", $"item", depth = 2, width = 2)
    assert(sk.groupBy($"bucket").count()
      .as[(Int, Long)].collect().forall(_._2 <= 4), "≤ depth×width cells per bucket")
    // per-depth cell mass in every bucket equals the bucket's row count
    val mass = sk.groupBy($"bucket", $"depth").agg(sum($"cnt").as("m"))
      .as[(Int, Int, Long)].collect()
    val byBucket = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    mass.foreach { case (b, _, m) => assert(m === byBucket(b)) }
    val est = Sketches.countMinEstimates(sk, df.select($"item").distinct(),
        "item", depth = 2, width = 2)
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (it, x) =>
      assert(est(it) >= x, s"$it underestimated: ${est(it)} < $x") }
    assert(exact.exists { case (it, x) => est(it) > x },
      "width 2 must force at least one collision overcount")
    // an item whose cells are ALL empty estimates exactly 0 — the sketch
    // stores only non-empty cells, so the probe must treat a missing cell
    // as zero (wider sketch: collisions with 8 items are unlikely at 64)
    val wide = Sketches.countMinSketch(df, $"b", $"item", depth = 2, width = 64)
    val unseen = Sketches.countMinEstimates(wide, Seq("never_seen").toDF("item"),
        "item", depth = 2, width = 64)
      .as[(String, Long)].collect().toMap
    assert(unseen("never_seen") === 0L, "absent item must estimate 0")
  }

  test("bloom: members always probe true; a saturated filter false-positives but never false-negatives") {
    // 30 members into 16 bits × 3 hashes — heavily saturated, so the 70
    // non-members MUST include false positives; members must ALL hit
    val members = (1 to 30).map(i => (s"m_$i", 0))
    val sk = Sketches.bloomSketch(members.toDF("item", "b"), $"b", $"item",
      k = 3, bits = 16)
    assert(sk.count() <= 16L, "at most `bits` distinct set-bit rows")
    val all = ((1 to 30).map(i => s"m_$i") ++ (1 to 70).map(i => s"x_$i")).toDF("item")
    val probed = Sketches.bloomProbe(sk, all, "item", k = 3, bits = 16)
      .as[(String, Boolean)].collect().toMap
    (1 to 30).foreach(i => assert(probed(s"m_$i"), s"false negative on m_$i"))
    assert((1 to 70).exists(i => probed(s"x_$i")),
      "a saturated 16-bit filter must produce false positives")
    // duplicated probe rows must not break the all-k test (the guarantee
    // is per distinct item): one output row, still true
    val dup = Sketches.bloomProbe(sk, Seq("m_1", "m_1", "m_1").toDF("item"),
        "item", k = 3, bits = 16)
      .as[(String, Boolean)].collect()
    assert(dup.toSeq === Seq(("m_1", true)))
  }

  test("mg aggregates reject non-matching input types") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(MisraGries.mgSketchAgg($"a", 4)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(MisraGries.mgMergeAgg($"a", 4)).collect()
    }
  }
}
