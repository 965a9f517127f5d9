package graft

import org.apache.spark.sql.functions._
import graft.ops.{Audit, Sampling}

/** Cross-table reconciliation + split-assignment specs. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("coverage counts matched, missing, and orphan ids exactly") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val vecs = Seq(3L, 4L, 5L).toDF("vec_id")
    val row = Audit.coverage(docs, $"doc_id", vecs, $"vec_id")
      .as[(Long, Long, Long, Long, Long)].head()
    // 4 docs, 3 vecs, {3,4} matched, {1,2} missing embeddings, {5} orphan
    assert(row === ((4L, 3L, 2L, 2L, 1L)))
  }

  test("coverage excludes NULL ids so the count invariants hold") {
    val docs = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    val vecs = Seq(Option.empty[Long], Some(2L)).toDF("vec_id")
    val row = Audit.coverage(docs, $"doc_id", vecs, $"vec_id")
      .as[(Long, Long, Long, Long, Long)].head()
    // null keys can never join — counting them would yield phantom rows in
    // BOTH "only" columns and break n_matched + n_left_only = n_left
    assert(row === ((2L, 1L, 1L, 1L, 0L)))
  }

  test("coverage deduplicates ids before counting") {
    val docs = Seq(1L, 1L, 2L).toDF("doc_id")
    val vecs = Seq(2L, 2L).toDF("vec_id")
    val row = Audit.coverage(docs, $"doc_id", vecs, $"vec_id")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(row === ((2L, 1L, 1L, 1L, 0L)))
  }

  test("split assigns contiguous bucket ranges in declaration order, covering every row") {
    val df = (1L to 1000L).toDF("id")
    val out = Sampling.split(df, $"id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select($"id", $"sample_bucket", $"split")
      .as[(Long, Int, String)].collect()
    assert(out.length === 1000)
    out.foreach { case (id, b, s) =>
      val expected = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(s === expected, s"id $id bucket $b labeled $s")
    }
    // every split nonempty and ratios roughly honored on 1000 uniform ids
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set("train", "val", "test"))
    assert(sizes("train") > 800 && sizes("val") > 10 && sizes("test") > 10)
    // membership is a pure function of the id: stable across runs
    val again = Sampling.split(df, $"id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, _, s) => again(id) === s })
    // misdeclared percents are rejected, not silently renormalized
    assertThrows[IllegalArgumentException] {
      Sampling.split(df, $"id", Seq("train" -> 90, "val" -> 5))
    }
  }

  test("expect detects each declared violation exactly once per dirty row") {
    val df = Seq(
      (Some(1L), 10.0),  // clean
      (None, 10.0),      // null id
      (Some(3L), -5.0),  // negative value
      (None, -1.0)       // violates both
    ).toDF("id", "v")
    val out = Audit.expect(df, Seq(
        "null_id" -> $"id".isNull,
        "negative_v" -> ($"v" < 0.0)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("null_id") === ((4L, 2L, false)))
    assert(out("negative_v") === ((4L, 2L, false)))
    val clean = Audit.expect(df.filter($"id".isNotNull && $"v" >= 0.0),
        Seq("null_id" -> $"id".isNull))
      .as[(String, Long, Long, Boolean)].head()
    assert(clean === (("null_id", 1L, 0L, true)))
  }

  test("duplicateKeys summarizes multi-row keys and is zero on unique keys") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val dup = Audit.duplicateKeys(df, $"k").as[(Long, Long)].head()
    assert(dup === ((2L, 5L))) // keys {2, 3}; 2+3 rows inside dup groups
    val none = Audit.duplicateKeys(Seq(1L, 2L).toDF("k"), $"k")
      .as[(Long, Long)].head()
    assert(none === ((0L, 0L)))
  }

  test("groupZScoreOutliers flags per-group tails and zeroes degenerate groups") {
    // group a: values 10,10,10,10,50 -> mean 18, var (4*64+1024)/5 = 256, std 16
    //   z(50) = 2.0 (not > 2), z(10) = -0.5
    // group b: constant -> std 0 -> z 0, never outliers
    // group c: one extreme point among tight cluster trips the flag
    val df = (Seq.fill(4)(("a", 10L)) ++ Seq(("a", 50L)) ++
      Seq(("b", 7L), ("b", 7L)) ++
      (Seq.fill(9)(("c", 100L)) ++ Seq(("c", 1000L)))).toDF("g", "v")
    val out = Audit.groupZScoreOutliers(df, $"g", $"v")
      .select($"g", $"v", $"z", $"is_outlier")
      .as[(String, Long, Double, Boolean)].collect()
    val a50 = out.find(r => r._1 == "a" && r._2 == 50L).get
    assert(math.abs(a50._3 - 2.0) < 1e-12 && !a50._4) // boundary: strict >
    val a10 = out.find(r => r._1 == "a" && r._2 == 10L).get
    assert(math.abs(a10._3 + 0.5) < 1e-12 && !a10._4)
    assert(out.filter(_._1 == "b").forall(r => r._3 === 0.0 && !r._4))
    val c1000 = out.find(r => r._1 == "c" && r._2 == 1000L).get
    assert(c1000._4, s"extreme point should be flagged, z=${c1000._3}")
    assert(out.count(r => r._1 == "c" && r._4) === 1)
  }
}
