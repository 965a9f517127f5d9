package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, Skew}
import graft.sources.Tables

/** Deterministic sampling + skew-salted join specs. */
class SamplingSkewSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sampling is deterministic, rate-faithful, and edge-exact") {
    val orders = Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority")
    def run() = Sampling.stratified(orders, $"o_orderpriority", $"o_orderkey",
        rates = Map("1-URGENT" -> 50), defaultRate = 10)
      .select("o_orderkey").as[Long].collect().toSet
    val s1 = run()
    assert(s1 === run(), "same inputs must produce the same sample")

    // rate 100 keeps everything, rate 0 nothing
    val n = orders.count()
    assert(Sampling.stratified(orders, $"o_orderpriority", $"o_orderkey",
      rates = Map.empty, defaultRate = 100).count() === n)
    assert(Sampling.stratified(orders, $"o_orderpriority", $"o_orderkey",
      rates = Map.empty, defaultRate = 0).count() === 0L)

    // md5 buckets are uniform: a 50% stratum keeps 50% ± a loose 10pp
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    val kept = s1.size.toDouble
    val urgentKept = Sampling.stratified(urgent, $"o_orderpriority", $"o_orderkey",
      rates = Map("1-URGENT" -> 50)).count().toDouble
    val urgentTotal = urgent.count().toDouble
    assert(math.abs(urgentKept / urgentTotal - 0.5) < 0.1,
      s"50% stratum kept ${urgentKept / urgentTotal}")
    assert(kept > 0)
  }

  test("salted join equals the plain join bit-for-bit") {
    val fact = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_orderkey", $"l_linenumber")
    val dim = Tables.part(spark, sf).select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = fact.join(dim, "l_partkey")
      .select("l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "l_partkey", salts = 8)
      .select("l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("balanceDomains equalizes skewed strata with data-derived rates, smallest kept whole") {
    // 200 'en' rows vs 20 'fr' rows: fr must keep 100%, en ~10%
    val rows = (1L to 200L).map(i => (i, "en")) ++ (201L to 220L).map(i => (i, "fr"))
    val df = rows.toDF("id", "lang")
    val out = Sampling.balanceDomains(df, col("lang"), col("id"))
      .select($"id", $"lang", $"sample_bucket", $"keep_rate")
      .as[(Long, String, Int, Int)].collect()
    val byLang = out.groupBy(_._2)
    // rates derive from the data: floor(100*20/200)=10 for en, 100 for fr
    assert(out.filter(_._2 == "en").forall(_._4 == 10))
    assert(out.filter(_._2 == "fr").forall(_._4 == 100))
    assert(byLang("fr").length === 20, "smallest stratum keeps every row")
    // membership is exactly bucket < rate — replayed here from first
    // principles (plain JVM md5, no Spark), proving the bucket is portable
    def bucketOf(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 100).toInt
    }
    val expectedEn = (1L to 200L).filter(i => bucketOf(i) < 10).toSet
    assert(byLang("en").map(_._1).toSet === expectedEn)
    // deterministic: a second run returns the identical sample
    val again = Sampling.balanceDomains(df, col("lang"), col("id"))
      .select($"id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)
  }

  test("balanceDomains treats a NULL stratum as its own group, not a row sink") {
    // untagged rows are a legitimate (and here smallest) group: they set the
    // floor AND stay in the output — a null-unsafe join would let them
    // drive min(cnt) while silently dropping every one of them
    val rows = (1L to 200L).map(i => (i, Some("en"))) ++
      (201L to 205L).map(i => (i, Option.empty[String]))
    val df = rows.toDF("id", "lang")
    val out = Sampling.balanceDomains(df, col("lang"), col("id"))
      .select($"id", $"lang", $"keep_rate")
      .as[(Long, Option[String], Int)].collect()
    val nullRows = out.filter(_._2.isEmpty)
    assert(nullRows.length === 5, "the NULL stratum must keep all 5 rows (rate 100)")
    assert(nullRows.forall(_._3 === 100))
    assert(out.filter(_._2.contains("en")).forall(_._3 === 2)) // floor(100*5/200)
  }

  test("qualityWeighted keeps everything at score 1, nothing at 0, and is deterministic") {
    val rows = (1L to 300L).map(i =>
      (i, if (i <= 100) 0.0 else if (i <= 200) 1.0 else 0.5))
    val df = rows.toDF("id", "score")
    val out = Sampling.qualityWeighted(df, col("score"), col("id"))
      .select($"id", $"keep_rate").as[(Long, Int)].collect()
    val kept = out.map(_._1).toSet
    assert(kept.intersect((1L to 100L).toSet).isEmpty, "score 0 must never survive")
    assert((101L to 200L).forall(kept), "score 1 must always survive")
    val mid = kept.count(id => id > 200)
    assert(out.filter(_._1 > 200).forall(_._2 === 50))
    assert(mid > 25 && mid < 75, s"score 0.5 should keep ~half, kept $mid")
    // pure function of (id, score): a second run is bit-identical
    val again = Sampling.qualityWeighted(df, col("score"), col("id"))
      .select($"id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("tokenBudget: over-budget strata downsample by exact integer rate, under-budget kept whole") {
    // stratum A: 4 docs × 50 tokens = 200 total, budget 100 → rate 50;
    // stratum B: 80 total ≤ budget → rate capped at 100, ALL kept
    val df = (1L to 4L).map(i => (i, "A", 50L)) ++ Seq((5L, "B", 30L), (6L, "B", 50L))
    val out = graft.ops.Sampling.tokenBudget(df.toDF("doc_id", "lang", "n_tokens"),
      $"lang", $"doc_id", $"n_tokens", budgetTokens = 100L)
    val rates = out.select($"lang", $"keep_rate").distinct()
      .as[(String, Int)].collect().toMap
    assert(rates.get("A").forall(_ === 50))
    assert(rates.getOrElse("B", 100) === 100)
    assert(out.filter($"lang" === "B").count() === 2L)
    // A keeps only bucket < 50 rows — a strict subset, deterministic
    val keptA = out.filter($"lang" === "A").select($"doc_id").as[Long].collect().toSet
    val again = graft.ops.Sampling.tokenBudget(df.toDF("doc_id", "lang", "n_tokens"),
      $"lang", $"doc_id", $"n_tokens", budgetTokens = 100L)
      .filter($"lang" === "A").select($"doc_id").as[Long].collect().toSet
    assert(keptA === again && keptA.size < 4)
  }

  test("temperatureMixture: sqrt flattening, exact shares, epoch math") {
    // n = 16 and 4: sqrt weights 4/6 and 2/6 — the big source's share
    // FLATTENS (16/20 = 0.8 raw → 2/3) and the small one rises
    val df = Seq(("big", 16L), ("small", 4L)).toDF("source", "n_tokens")
    val out = graft.ops.Sampling.temperatureMixture(df, budgetTokens = 60.0)
      .orderBy("source").collect()
    val big = out(0); val small = out(1)
    assert(big.getAs[Double]("raw_share") === 0.8)
    assert(math.abs(big.getAs[Double]("weight") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(small.getAs[Double]("weight") - 1.0 / 3.0) < 1e-12)
    assert(big.getAs[Double]("weight") < big.getAs[Double]("raw_share"),
      "temperature must flatten the dominant source")
    assert(small.getAs[Double]("weight") > small.getAs[Double]("raw_share"))
    // weights sum to 1 (up to the decimal-denominator rounding)
    assert(math.abs(out.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-6)
    // budget 60: big expects 40 tokens over 16 → 2.5 epochs, upsampled;
    // small expects 20 over 4 → 5 epochs
    assert(math.abs(big.getAs[Double]("epochs") - 2.5) < 1e-12)
    assert(big.getAs[Boolean]("upsampled"))
    // a huge budgetless source (epochs < 1) is NOT flagged
    val one = graft.ops.Sampling.temperatureMixture(
      Seq(("only", 100L)).toDF("source", "n_tokens"), budgetTokens = 50.0)
      .collect()(0)
    assert(math.abs(one.getAs[Double]("weight") - 1.0) < 1e-6)
    assert(one.getAs[Double]("epochs") < 1.0 && !one.getAs[Boolean]("upsampled"))
  }

}
