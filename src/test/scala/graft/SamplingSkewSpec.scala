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
}
