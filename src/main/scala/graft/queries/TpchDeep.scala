package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Exact._

/** The deeper TPC-H-shaped analytics surface: multi-join flow analysis,
  * market-share ratios, profit attribution, conditional-predicate scans,
  * outer-join distributions, argmax reports and anti-join opportunity
  * scans — the report queries an OLAP user of the reference would run
  * beyond the q1/q3/q4/q5/q6/q17/q21 set already in [[Analytics]]. With
  * q13/q15/q22 and the q2/q20 catalog analogs this covers every TPC-H
  * query shape the test tables can express. (Where the partsupp RELATION
  * is needed, the analog derives it from the fact's observed distinct
  * (part, supplier) pairs and documents the cost proxy on the query —
  * q16/q11/q2/q20; where a single COLUMN is missing, likewise: q13 swaps
  * the o_comment pattern for an order-priority exclusion, q22 swaps the
  * c_phone country code for c_nationkey. Only q12 stays data-blocked:
  * lineitem has no receiptdate/commitdate/shipmode at all, so it is
  * deliberately absent rather than faked.)
  *
  * Scale posture shared by all of these: lineitem⋈orders is the one
  * genuine shuffle (both sides huge, both keyed on orderkey); nation /
  * region / supplier are broadcast explicitly (fixed 25 / 5 / SF×10k
  * rows); customer and part are joined WITHOUT a forced strategy so
  * Catalyst+AQE picks broadcast at small SF and shuffle at 100 TB — the
  * statistics-driven choice, not a hand-pinned one.
  */
object TpchDeep {

  /** TPC-H Q7-shaped volume shipping: revenue flows between the nations
    * of a trading bloc by direction and year. (A bloc of three rather
    * than Q7's pair: the sf0.001 smoke data has suppliers in only 10 of
    * the 25 nations and the strict two-nation flow is empty there —
    * NATION_3 is supplier-populated at every SF.) The nation filter is
    * applied to the two broadcast nation copies BEFORE the fact joins,
    * so the customer and supplier probe sides shrink at the scan
    * (broadcast-hash semi effect), and only matching orders reach the
    * big shuffle. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pair = Seq("NATION_1", "NATION_2", "NATION_3")
    val n1 = Tables.nation(spark, dir).filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
    val n2 = Tables.nation(spark, dir).filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              $"l_shipdate" <= lit("1997-12-31 00:00:00").cast("timestamp"))
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"c_nationkey" === $"c_nk")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n2), $"s_nationkey" === $"s_nk")
      .filter($"cust_nation" =!= $"supp_nation")
      .groupBy($"cust_nation", $"supp_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"cust_nation", $"supp_nation", $"l_year")
  }

  val q7VolumeShippingSql: String = s"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** TPC-H Q8-shaped market share: the target supplier nation's share of
    * STANDARD-part revenue sold to ASIA customers, by order year. The
    * classic ratio-of-conditional-sums — both sums accumulate in exact
    * decimal over the SAME joined row set (one scan, one shuffle), and
    * the single final division is the only floating-point step. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("c_nk"))
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
              .filter($"o_orderdate" >= lit("1995-01-01 00:00:00").cast("timestamp") &&
                      $"o_orderdate" <= lit("1996-12-31 00:00:00").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(asiaNations), $"c_nationkey" === $"c_nk")
      .join(Tables.part(spark, dir).filter($"p_type" === "STANDARD"),
            $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg((dsum(when($"n_name" === "NATION_3", vol).otherwise(lit(0.0))) /
            dsum(vol)).as("mkt_share"))
      .orderBy($"o_year")
  }

  val q8MarketShareSql: String = s"""
    SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
           ${sqlSum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q9-shaped product profit: margin attributed to the supplier's
    * nation by order year, over parts matching a name pattern. The test
    * tables carry no partsupp, so supply cost is the documented proxy
    * 0.6 × p_retailprice (same role: a per-part unit cost). The LIKE
    * filter on part prunes the probe side before the fact join. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame =
    q9Core(Tables.lineitem(spark, dir), Tables.part(spark, dir),
      Tables.orders(spark, dir), Tables.supplier(spark, dir),
      Tables.nation(spark, dir))

  /** The q9 plan over arbitrary input frames — shared by the registry
    * entry at 1× and the bench's ×10 fact-replica scale-curve entry
    * (facts ×F against 1× dims: the LIKE-pruned part side and the
    * supplier/nation broadcasts are corpus-size-independent, so the
    * honest expectation is ~linear in the two fact inputs). */
  def q9Core(lineitem: DataFrame, part: DataFrame, orders: DataFrame,
             supplier: DataFrame, nation: DataFrame): DataFrame = {
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("p_retailprice") * lit(0.6) * col("l_quantity")
    lineitem
      .join(part.filter(col("p_name").like("%gear%")),
            col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(amount).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String = s"""
    SELECT n_name AS nation,
           CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
           ${sqlSum("l_extendedprice * (1.0 - l_discount) - p_retailprice * CAST(0.6 AS DOUBLE) * l_quantity")} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC"""

  /** TPC-H Q10-shaped returned-item report: top 20 customers by revenue
    * lost to returns in a quarter. Group keys carry the customer
    * attributes (they're functionally dependent on c_custkey, so the
    * wide key adds no cardinality); the final top-20 is a TakeOrdered —
    * O(20) per partition, no full sort at scale. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, dir)
              .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
                      $"o_orderdate" <  lit("1996-04-01 00:00:00").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name".as("nation"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10ReturnedItemsSql: String = s"""
    SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** TPC-H Q14-shaped promo revenue: percentage of one month's revenue
    * from PROMO parts. Scalar ratio, one fact scan with the date filter
    * pushed to the parquet reader; part joins stats-driven. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-03-01 00:00:00").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-04-01 00:00:00").cast("timestamp"))
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * dsum(when($"p_type" === "PROMO", vol).otherwise(lit(0.0))) /
            dsum(vol)).as("promo_pct"))
  }

  val q14PromoRevenueSql: String = s"""
    SELECT CAST(100.0 AS DOUBLE) *
           ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'"""

  /** TPC-H Q18-shaped large-volume orders: orders whose total quantity
    * exceeds a threshold, with their customer. The HAVING aggregate runs
    * FIRST on lineitem alone (map-side partial on the fact's natural
    * clustering key), so only qualifying orderkeys — a tiny fraction —
    * reach the joins. Top 100 by order value is a TakeOrdered. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 220.0)
    big.join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q18LargeOrdersSql: String = s"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (SELECT l_orderkey, ${sqlSum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY 1) big
    JOIN orders   ON big.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE sum_qty > 220.0
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** TPC-H Q19-shaped flexible predicate: revenue under an OR of three
    * (brand, size-band, quantity-band) conjunctions. The OR can't push
    * to the scan as-is, so the shared bounds (l_quantity ≤ 30, p_size ≤
    * 35) are hoisted explicitly — those DO reach the parquet readers and
    * prune row groups; the residual OR evaluates post-scan in codegen. */
  def q19FlexiblePred(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val branch = ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
                    $"l_quantity".between(1, 11)) ||
                 ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) &&
                    $"l_quantity".between(10, 20)) ||
                 ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) &&
                    $"l_quantity".between(20, 30))
    Tables.lineitem(spark, dir)
      .filter($"l_quantity".between(1, 30))
      .join(Tables.part(spark, dir).filter($"p_size".between(1, 35)),
            $"l_partkey" === $"p_partkey")
      .filter(branch)
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  val q19FlexiblePredSql: String = s"""
    SELECT ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_quantity BETWEEN 1 AND 30 AND p_size BETWEEN 1 AND 35
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))"""

  /** TPC-H Q13-shaped customer distribution: how many customers placed
    * exactly N qualifying orders, including the zero-order customers the
    * LEFT join preserves. (Q13's o_comment NOT-LIKE exclusion has no
    * o_comment column here; the documented analog excludes 1-URGENT
    * orders — same shape: a predicate INSIDE the join condition, not a
    * post-join filter, or the zero-order customers vanish.) The
    * custkey-keyed outer join is the one fact shuffle; the per-customer
    * count reuses its partitioning, and the final distribution aggregates
    * |distinct counts| rows — nothing at scale. */
  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderpriority" =!= "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13CustDistributionSql: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q15-shaped top supplier: the supplier(s) achieving the maximum
    * quarterly revenue. Revenue aggregates lineitem ONCE (date filter
    * pushed to the scan, suppkey-keyed shuffle); the aggregate is
    * |suppliers| rows (SF×10k), so the global max runs as a window over
    * that SMALL table — never a second fact scan, which a naive
    * scalar-subquery plan would pay — and the supplier name join is
    * broadcast. Revenue equality on the decimal-exact double is
    * deterministic, so ties surface every argmax supplier. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-04-01 00:00:00").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("total_revenue"))
      .withColumn("mx", max($"total_revenue").over(Window.partitionBy()))
      .filter($"total_revenue" === $"mx")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q15TopSupplierSql: String = s"""
    WITH revenue AS (
      SELECT l_suppkey, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  /** TPC-H Q22-shaped sales opportunity: customers in seven target
    * nations with above-average positive balance who have LAPSED — no
    * orders since a cutoff date. (Q22's phone country-code prefix has no
    * c_phone column here, so c_nationkey is the documented analog; and
    * because every synthetic customer has ≥1 lifetime order, the
    * anti-join is date-windowed — which is Q22's actual business
    * semantics, "no orders for 7 years", anyway.) The global average is
    * a 1-row broadcast computed from the customer dim alone; the lapsed
    * test is a custkey-keyed LEFT ANTI join probing recent orders
    * projected to the join key ONLY — at 100 TB the date filter prunes
    * the order scan and the anti-join ships one bigint per surviving
    * order, nothing else. */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L)
    val cust = Tables.customer(spark, dir).filter($"c_nationkey".isin(nations: _*))
    val avgBal = cust.filter($"c_acctbal" > lit(0.0))
      .agg(davg($"c_acctbal").as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2000-01-01 00:00:00").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey".as("nation_code"))
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"nation_code")
  }

  val q22SalesOpportunitySql: String = s"""
    SELECT c_nationkey AS nation_code, COUNT(*) AS numcust,
           ${sqlSum("c_acctbal")} AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (SELECT ${Exact.sqlAvg("c_acctbal")}
                       FROM customer
                       WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q16-shaped supplier variety: how many distinct suppliers can
    * deliver each surviving (brand, type, size) combination. The test
    * tables carry no partsupp, so the catalog relation is derived from
    * OBSERVED supply: the distinct (l_partkey, l_suppkey) pairs of the
    * fact — a lineitem-derived analog, documented rather than faked
    * (Q16's comment-pattern supplier exclusion becomes a negative-balance
    * exclusion; no s_comment column exists). Shapes match Q16: the pair
    * distinct is the one fact shuffle, part prunes+broadcasts onto the
    * pair set, the excluded-supplier list is a broadcast anti join, and
    * the final aggregate is catalog-sized. */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val pairs = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val parts = Tables.part(spark, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_size".isin(sizes: _*))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val excluded = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    pairs
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(excluded), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q16SupplierVarietySql: String = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q11-shaped important stock: the highest-value parts flowing
    * through one nation's suppliers. partsupp's supplycost×availqty is
    * unavailable, so value = observed discounted revenue of the nation's
    * suppliers per part (lineitem-derived analog, documented). Q11's
    * value > fraction-of-total cut is share-based and empties at larger
    * SFs (the per-part share shrinks as the catalog grows), so the
    * surviving read-out is the deterministic top-100 by (value desc,
    * partkey) — same "which stock matters" decision, scale-stable. The
    * nation's supplier keys broadcast into the fact scan; the per-part
    * aggregate is the one shuffle; the top-k sorts the part-level
    * aggregate only. */
  def q11NationPartShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter($"n_name" === "NATION_3")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    Tables.lineitem(spark, dir)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("value"))
      .orderBy($"value".desc, $"l_partkey")
      .limit(100)
  }

  val q11NationPartShareSql: String = s"""
    SELECT l_partkey, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS value
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                        JOIN nation ON s_nationkey = n_nationkey
                        WHERE n_name = 'NATION_3')
    GROUP BY l_partkey
    ORDER BY value DESC, l_partkey LIMIT 100"""

  /** TPC-H Q2-shaped min-cost supplier: for each qualifying part, the
    * EUROPE supplier offering it at the minimum cost. The test tables
    * carry no partsupp, so (as in q16/q11) the catalog relation is the
    * fact's observed distinct (part, supplier) pairs, and supply cost is
    * the observed unit price of the pair — exact-decimal sums divided
    * once in IEEE double (sum price / sum qty), a per-PAIR cost (q9's
    * part-level 0.6×retail proxy is constant across a part's suppliers
    * and would make every argmin a tie). Q2's correlated MIN subquery
    * becomes an argmin-per-part window over the catalog-sized candidate
    * frame: the pair aggregate is the ONE fact shuffle; part (filtered)
    * and the region's supplier roster broadcast onto it; the window and
    * final top-100 sort touch catalog rows only. Cost equality across
    * engines is sound because both divide the identical exact-decimal
    * doubles once. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cost = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg((dsum($"l_extendedprice") / dsum($"l_quantity")).as("supply_cost"))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val parts = Tables.part(spark, dir)
      .filter($"p_type" === "STANDARD" && $"p_size" <= 10)
      .select($"p_partkey")
    val cand = cost
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
    cand
      .withColumn("mn", min($"supply_cost").over(Window.partitionBy($"p_partkey")))
      .filter($"supply_cost" === $"mn")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"supply_cost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val q2MinCostSupplierSql: String = s"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             ${sqlSum("l_extendedprice")} / ${sqlSum("l_quantity")} AS supply_cost
      FROM lineitem GROUP BY 1, 2),
    sup AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
    cand AS (
      SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, supply_cost
      FROM cost JOIN part ON l_partkey = p_partkey
      JOIN sup ON l_suppkey = s_suppkey
      WHERE p_type = 'STANDARD' AND p_size <= 10)
    SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
    FROM cand c
    WHERE supply_cost = (SELECT MIN(supply_cost) FROM cand c2
                         WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""

  /** TPC-H Q20-shaped potential promotion: NATION_3 suppliers who are
    * surging on promo-candidate parts. Q20's availqty > half-of-shipped
    * threshold needs partsupp's availqty; the documented analog keeps the
    * nested semi-join CHAIN (part name filter → correlated pair-level
    * aggregate threshold → supplier roster) with the pair's own history
    * as the denominator: a (part, supplier) pair qualifies when its 1996
    * shipped quantity exceeds half of its all-time shipped quantity —
    * both sides exact-decimal sums over ONE grouped scan (the CASE sum
    * replaces Q20's correlated scalar subquery re-scan). The part filter
    * broadcasts into the fact scan as a semi-join, the pair aggregate is
    * the one shuffle, and the qualifying supplier ids collapse to a
    * distinct id set before the roster semi-join — at 100 TB nothing
    * wider than (partkey, suppkey, two decimals) ever shuffles. */
  def q20PotentialPromotion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promoParts = Tables.part(spark, dir)
      .filter($"p_name".like("%gear%")).select($"p_partkey")
    val qualifying = Tables.lineitem(spark, dir)
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(
        dsum(when(year($"l_shipdate") === 1996, $"l_quantity").otherwise(lit(0.0)))
          .as("q_year"),
        dsum($"l_quantity").as("q_total"))
      .filter($"q_year" > lit(0.5) * $"q_total")
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter($"n_name" === "NATION_3")),
        $"s_nationkey" === $"n_nationkey")
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_name", $"s_suppkey")
  }

  val q20PotentialPromotionSql: String = s"""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_partkey, l_suppkey,
            ${sqlSum("CASE WHEN year(CAST(l_shipdate AS DATE)) = 1996 THEN l_quantity ELSE 0 END")} AS q_year,
            ${sqlSum("l_quantity")} AS q_total
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%gear%')
          GROUP BY 1, 2) pair
        WHERE q_year > 0.5 * q_total)
    ORDER BY s_name, s_suppkey"""

  val registry: Seq[Q] = Seq(
    Q("q2_min_cost_supplier", q2MinCostSupplier, Some(q2MinCostSupplierSql)),
    Q("q20_potential_promotion", q20PotentialPromotion, Some(q20PotentialPromotionSql)),
    Q("q7_volume_shipping", q7VolumeShipping, Some(q7VolumeShippingSql)),
    Q("q16_supplier_variety", q16SupplierVariety, Some(q16SupplierVarietySql)),
    Q("q11_nation_part_share", q11NationPartShare, Some(q11NationPartShareSql)),
    Q("q8_market_share", q8MarketShare, Some(q8MarketShareSql)),
    Q("q9_product_profit", q9ProductProfit, Some(q9ProductProfitSql)),
    Q("q10_returned_items", q10ReturnedItems, Some(q10ReturnedItemsSql)),
    Q("q14_promo_revenue", q14PromoRevenue, Some(q14PromoRevenueSql)),
    Q("q18_large_orders", q18LargeOrders, Some(q18LargeOrdersSql)),
    Q("q19_flexible_pred", q19FlexiblePred, Some(q19FlexiblePredSql)),
    Q("q13_cust_distribution", q13CustDistribution, Some(q13CustDistributionSql)),
    Q("q15_top_supplier", q15TopSupplier, Some(q15TopSupplierSql)),
    Q("q22_sales_opportunity", q22SalesOpportunity, Some(q22SalesOpportunitySql)))
}
