package graft

import graft.ops.{Retrieval, Skyline}

/** Hand-case specs for the report/fusion operators whose registry
  * oracles are independent formulations (NOT-EXISTS dominance for the
  * skyline; replayed retrievers for RRF) — these pin the operator
  * SEMANTICS on inputs small enough to reason about by hand.
  */
class ReportOpsSpec extends SparkSpec {
  import spark.implicits._

  test("skyline keeps exactly the non-dominated rows, ties included") {
    // (id, x, y): 1 dominates nothing-check; 2 dominated by 1 (both dims
    // strictly worse); 3 ties 1 on x with worse y → dominated; 4 better
    // y, worse x → frontier; 5 duplicates 4 on BOTH dims → neither
    // strictly dominates, both kept; 6 dominated by 4/5 (equal x, lower y)
    val df = Seq(
      (1L, 10.0, 5.0), (2L, 9.0, 4.0), (3L, 10.0, 4.0),
      (4L, 8.0, 7.0), (5L, 8.0, 7.0), (6L, 8.0, 6.0)
    ).toDF("id", "x", "y")
    val out = Skyline.frontier2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 4L, 5L))
  }

  test("skyline excludes NULL-dimension rows as incomparable") {
    val df = Seq(
      (1L, Some(10.0), Some(5.0)), (2L, None, Some(9.0)), (3L, Some(9.0), None)
    ).toDF("id", "x", "y")
    val out = Skyline.frontier2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L))
  }

  test("skyline of a single row and of an empty frame") {
    val one = Seq((1L, 1.0, 1.0)).toDF("id", "x", "y")
    assert(Skyline.frontier2d(one, "x", "y").count() === 1L)
    assert(Skyline.frontier2d(one.limit(0), "x", "y").count() === 0L)
  }

  test("rrf fuses ranks with absence contributing zero, doc_id tiebreak") {
    // doc 1 is rank 1 in both lists: 2/61; doc 2 only lexical rank 2:
    // 1/62; doc 3 only dense rank 2: 1/62 — docs 2 and 3 tie exactly and
    // order by doc_id
    val lex = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val den = Seq((1L, 1), (3L, 2)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(lex, den, c = 60, topN = 10)
      .select("doc_id", "rrf").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(out(0)._2 - 2.0 / 61.0) < 1e-15)
    assert(out(1)._2 === out(2)._2)
    assert(math.abs(out(1)._2 - 1.0 / 62.0) < 1e-15)
  }

  test("rrf topN truncates after the deterministic order") {
    val lex = (1L to 5L).map(i => (i, i.toInt)).toDF("doc_id", "rank")
    val den = (1L to 5L).map(i => (i, i.toInt)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(lex, den, c = 60, topN = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L))
  }

  test("rankEval computes exact RR/prec@5/AP@5, NULL for no-hit queries") {
    // q1: relevant at ranks 2 and 4 → RR = 1/2, prec = 2/5,
    //     AP = (prec@2 + prec@4)/2 = (1/2 + 2/4)/2 = 1/2
    // q2: relevant at rank 1 only → RR = 1, prec = 1/5, AP = 1
    // q3: nothing relevant → NULL first/rr/ap, prec = 0
    val ranked = (1 to 5).flatMap { r =>
      Seq((1L, r, if (r == 2 || r == 4) 1 else 0, "a"),
          (2L, r, if (r == 1) 1 else 0, "a"),
          (3L, r, 0, "b"))
    }.toDF("query_id", "rank", "rel", "grp")
    val out = Retrieval.rankEval(ranked, k = 5, carry = Seq("grp"))
      .orderBy("query_id").collect()
    assert(out.length === 3)
    val q1 = out(0)
    assert(q1.getAs[Long]("n_rel") === 2L)
    assert(q1.getAs[Int]("first_rel_rank") === 2)
    assert(q1.getAs[Double]("rr") === 0.5)
    assert(q1.getAs[Double]("prec_at_5") === 0.4)
    assert(q1.getAs[Double]("ap_at_5") === 0.5)
    assert(q1.getAs[String]("grp") === "a")
    val q2 = out(1)
    assert(q2.getAs[Double]("rr") === 1.0)
    assert(q2.getAs[Double]("ap_at_5") === 1.0)
    val q3 = out(2)
    assert(q3.getAs[Long]("n_rel") === 0L)
    assert(q3.isNullAt(q3.fieldIndex("first_rel_rank")))
    assert(q3.isNullAt(q3.fieldIndex("rr")))
    assert(q3.getAs[Double]("prec_at_5") === 0.0)
    assert(q3.isNullAt(q3.fieldIndex("ap_at_5")))
  }

  test("rankEval ignores candidates past k; lcm helper is exact") {
    assert(Retrieval.rankLcm(5) === 60L)
    assert(Retrieval.rankLcm(10) === 2520L)
    // relevant only at rank 6 with k=5 → a no-hit query
    val ranked = (1 to 6).map(r => (1L, r, if (r == 6) 1 else 0))
      .toDF("query_id", "rank", "rel")
    val out = Retrieval.rankEval(ranked, k = 5).collect()(0)
    assert(out.getAs[Long]("n_rel") === 0L)
    assert(out.isNullAt(out.fieldIndex("rr")))
  }

  test("rfmSegments: balanced quartiles, best customers land in tile 1") {
    val out = graft.queries.Analytics.rfmSegments(spark, sf).collect()
    val n = out.length
    assert(n > 0)
    for (t <- Seq("r_tile", "f_tile", "m_tile")) {
      val sizes = out.groupBy(_.getAs[Int](t)).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3, 4)), s"$t out of range")
      // ntile balance: sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"$t unbalanced: $sizes")
    }
    val topMonetary = out.maxBy(_.getAs[Double]("monetary"))
    assert(topMonetary.getAs[Int]("m_tile") === 1)
    val mostRecent = out.minBy(_.getAs[Int]("recency_days"))
    assert(mostRecent.getAs[Int]("r_tile") === 1)
    assert(out.forall(r => r.getAs[String]("rfm_code") ===
      s"${r.getAs[Int]("r_tile")}-${r.getAs[Int]("f_tile")}-${r.getAs[Int]("m_tile")}"))
  }

  test("cohort_ltv: every cohort starts at offset 0, cumulative revenue never falls") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("cohort_ltv")(spark, sf)
      .select($"cohort_mi", $"month_offset", $"revenue", $"cum_revenue")
      .as[(Int, Int, Double, Double)].collect()
    rows.groupBy(_._1).values.foreach { cohort =>
      val sorted = cohort.sortBy(_._2)
      assert(sorted.head._2 === 0, "a cohort exists because someone ordered in month 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 >= a._4, "LTV is cumulative")
        case _         =>
      }
    }
    // the triangle partitions total revenue exactly (decimal sums)
    val total = graft.sources.Tables.orders(spark, sf)
      .agg(sum($"o_totalprice"
        .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6))))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(rows.map(_._3).sum - total) < 1e-3)
  }

  test("discount_effect: bands cover every lineitem with plausible percents") {
    val rows = SparkEntry.queries("discount_effect")(spark, sf)
      .select($"discount_pct", $"n_lines").as[(Int, Long)].collect()
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 50))
    assert(rows.map(_._2).sum ===
      graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("basket_lift: ordered pairs above min-support, exact rational lift") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("basket_lift")(spark, sf)
      .select($"brand_a", $"brand_b", $"pair_n", $"support", $"lift")
      .as[(String, String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val ob = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
    val nOrders = ob.select($"l_orderkey").distinct().count()
    val brandN = ob.groupBy($"p_brand").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (a, b, pn, sup, lift) =>
      assert(a < b, "pairs must be canonically ordered")
      assert(pn >= 5, "min-support cut")
      assert(sup === pn.toDouble / nOrders)
      assert(lift === (pn * nOrders).toDouble / (brandN(a) * brandN(b)))
    }
  }

  test("semi-additive balance: actives never shrink, last month covers every buyer") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("semi_additive_balance")(spark, sf)
      .select($"yr" * 12 + $"mo_num" - 1, $"c_mktsegment", $"n_active")
      .as[(Int, String, Long)].collect()
    // a balance, once established, persists (LOCF): per segment the
    // active-customer count is non-decreasing month over month
    out.groupBy(_._2).values.foreach { seg =>
      val counts = seg.sortBy(_._1).map(_._3)
      counts.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a, s"actives shrank: $a -> $b")
        case _         =>
      }
    }
    // the final month's actives across segments = distinct buying customers
    val lastMi = out.map(_._1).max
    val lastTotal = out.filter(_._1 == lastMi).map(_._3).sum
    val buyers = graft.sources.Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(lastTotal === buyers)
  }
}
