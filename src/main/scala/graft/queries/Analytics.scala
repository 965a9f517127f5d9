package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Exact._

/** OLAP-side analytics over the star schema — the query surface a user of the
  * reference's OLAP database would run against `hecho_ventas` + dims,
  * re-expressed on the TPC-H-ish test tables.
  *
  * Scale notes: every query here is a single declarative plan; filters and
  * projections reach the parquet scan, small dimension sides are broadcast,
  * and aggregates are map-side partial (Spark HashAggregate pairs) so the
  * only full shuffle is on the group/join keys.
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: selective scan → partial agg → final agg.
    * At 100 TB this is scan-bound; no join, one shuffle on the 2 group keys.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    q1Core(Tables.lineitem(spark, dir))

  /** The q1 plan over an arbitrary lineitem frame — the registry entry
    * above at 1× and the bench's ×10 fact-replica scale-curve entry share
    * this body (group keys are replica-invariant, so the aggregate stays
    * 4-groups-bounded at any corpus multiple). */
  def q1Core(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSummarySql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlSum("l_quantity")} AS sum_qty,
      ${sqlSum("l_extendedprice")} AS sum_base_price,
      ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${sqlAvg("l_quantity")} AS avg_qty,
      ${sqlAvg("l_extendedprice")} AS avg_price,
      ${sqlAvg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q6-style: highly selective scan + single scalar aggregate.
    * Showcases predicate pushdown — all three filters reach the parquet
    * reader (PushedFilters), so at 100 TB only matching row groups are read.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1994-01-01 00:00:00").cast("timestamp") &&
              $"l_shipdate" <  lit("1995-01-01 00:00:00").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"))
  }

  val q6ForecastRevenueSql: String = s"""
    SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24"""

  /** TPC-H Q3-style shipping priority: 3-way join, grouped agg, top-N.
    * customer filter is applied BEFORE the join (pushdown) and the customer
    * side is a semijoin reduction of orders; lineitem⋈orders shuffles on
    * orderkey. LIMIT after a total order — at scale Spark runs this as a
    * TakeOrderedAndProject (no full sort materialization). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1996-03-15 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1996-03-15 00:00:00").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", to_date($"o_orderdate").as("orderdate"), $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .select($"l_orderkey", $"revenue", $"orderdate", $"o_orderpriority")
      .orderBy($"revenue".desc, $"orderdate", $"l_orderkey")
      .limit(10)
  }

  val q3ShippingPrioritySql: String = s"""
    SELECT l_orderkey,
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10"""

  /** TPC-H Q5-style: 6-way snowflake join. region/nation/supplier broadcast;
    * the co-nation predicate (c_nationkey = s_nationkey) rides the join. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              $"o_orderdate" <  lit("1998-01-01 00:00:00").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir)),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name".as("nation"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"nation")
  }

  val q5LocalSupplierSql: String = s"""
    SELECT n_name AS nation,
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, nation"""

  /** Top-N per group via ranked window — one shuffle on the partition key. */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Tables.part(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"p_brand", $"rank", $"p_partkey", $"p_name", $"p_retailprice")
      .orderBy($"p_brand", $"rank")
  }

  val topnPerGroupSql: String = """
    SELECT p_brand, rank, p_partkey, p_name, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rank
      FROM part) t
    WHERE rank <= 3 ORDER BY p_brand, rank"""

  /** Running total per customer — exact decimal window sum so every prefix
    * matches the oracle bit-for-bit. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", to_date($"o_orderdate").as("orderdate"),
              $"o_totalprice",
              sum($"o_totalprice".cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))
                .over(w).cast("double").as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val runningTotalSql: String = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey"""

  /** Multi-level ROLLUP aggregate (year × priority), the cube-style OLAP
    * report surface. Null grouping rows ordered NULLS FIRST in both engines. */
  def rollupSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(year($"o_orderdate").as("order_year"), $"o_orderpriority", $"o_totalprice")
      .rollup($"order_year", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_total"))
      .orderBy($"order_year".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val rollupSalesSql: String = s"""
    SELECT year(o_orderdate) AS order_year, o_orderpriority,
           COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS sum_total
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  /** TPC-H Q4-shaped EXISTS: orders with at least one returned lineitem,
    * counted by priority — planned as a LEFT SEMI join on the orderkey the
    * filtered lineitem side is already clustered by (no decorrelation
    * gymnastics, no double-counting risk from a plain join). */
  def q4PrioritySemi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val returned = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R").select($"l_orderkey")
    Tables.orders(spark, dir)
      .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val q4PrioritySemiSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    GROUP BY 1 ORDER BY 1"""

  /** NOT EXISTS: customers with no urgent order, by market segment — a
    * LEFT ANTI join (the set-difference workhorse; at scale the filtered
    * order-key side is small enough to broadcast). */
  def customersNoUrgent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    Tables.customer(spark, dir)
      .join(broadcast(urgent), $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  val customersNoUrgentSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1 ORDER BY 1"""

  /** Exact distinct counts (the approx/HLL variant is the separate
    * rows-only query `approx_distinct`). */
  def distinctCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_suppkey").as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val distinctCountSql: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Approximate distinct via HLL++ — the 100 TB path for cardinality
    * (no exact-distinct shuffle explosion). HLL estimates aren't
    * oracle-reproducible across engines, so the oracle-checked columns are
    * the exact counts plus a bounds flag: the estimate (rsd=0.01) must land
    * within ±5% (5σ) of the exact value — the oracle asserts the flag TRUE.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // exact and HLL distincts deliberately run as SEPARATE aggregations
    // joined on the (tiny) group set: mixing count(DISTINCT) with
    // approx_count_distinct in one agg triggers the Expand-based
    // multi-distinct rewrite, which drags the ~13KB HLL(rsd=0.01) buffer
    // through the expanded-row aggregate — ~65× slower at sf0.1.
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"),
           countDistinct($"l_orderkey").as("exact_orders"))
    val approx = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
           approx_count_distinct($"l_orderkey", 0.01).as("approx_orders"))
    exact.join(approx, "l_returnflag")
      .select($"l_returnflag", $"exact_parts", $"exact_orders",
        (abs($"approx_parts" - $"exact_parts") <= $"exact_parts" * 0.05)
          .as("parts_within_5pct"),
        (abs($"approx_orders" - $"exact_orders") <= $"exact_orders" * 0.05)
          .as("orders_within_5pct"))
      .orderBy($"l_returnflag")
  }

  val approxDistinctSql: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Classic OLAP pivot: revenue by nation (rows) × order year (columns).
    * The pivot values are DECLARED (1992-1998), not discovered — an
    * unconstrained `pivot` first runs a distinct job over the pivot column
    * just to learn the output schema, a full extra pass over the fact at
    * 100 TB. With declared values the pivot compiles to ONE hash aggregate
    * keyed on n_name with a decimal accumulator per year: a single shuffle,
    * map-side partials included. */
  def pivotSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", year($"o_orderdate").as("o_year"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .groupBy($"n_name")
      .pivot("o_year", (1992 to 1998).map(Integer.valueOf))
      .agg(dsum($"rev"))
      .orderBy($"n_name")
  }

  val pivotSalesSql: String = {
    val cols = (1992 to 1998).map { y =>
      sqlSum(s"CASE WHEN year(o_orderdate) = $y THEN l_extendedprice * (1.0 - l_discount) END") +
        s""" AS "$y""""
    }.mkString(",\n      ")
    s"""
    SELECT n_name,
      $cols
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""
  }

  /** Exact interpolated percentiles next to t-digest-style approximations —
    * the `approx_distinct` pattern applied to quantiles: the exact columns
    * are hash-checked against the oracle, the approx estimates are asserted
    * within 1% of exact as boolean flag columns (the approx sketch is
    * engine-specific; its ERROR BOUND is the portable contract). At 100 TB
    * only approx_percentile is runnable — it is a bounded-size mergeable
    * sketch; exact percentile needs the whole column per group. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice".cast("double").as("p"))
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(p, 0.5)").as("p50"),
        expr("percentile(p, 0.95)").as("p95"),
        expr("approx_percentile(p, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(p, 0.95, 10000)").as("ap95"))
      .select($"l_returnflag", $"p50", $"p95",
        (abs($"ap50" - $"p50") <= $"p50" * 0.01).as("p50_within_1pct"),
        (abs($"ap95" - $"p95") <= $"p95" * 0.01).as("p95_within_1pct"))
      .orderBy($"l_returnflag")
  }

  val approxQuantilesSql: String = """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice::DOUBLE, 0.5) AS p50,
           quantile_cont(l_extendedprice::DOUBLE, 0.95) AS p95,
           TRUE AS p50_within_1pct, TRUE AS p95_within_1pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Brand revenue through the salted fact⋈part join — result provably
    * identical to the plain join (the oracle IS the plain join), only the
    * shuffle layout changes. See [[graft.ops.Skew.saltedJoin]] for when to
    * reach for this over AQE's skew split. */
  def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fact = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    val dim = Tables.part(spark, dir)
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    graft.ops.Skew.saltedJoin(fact, dim, "l_partkey", salts = 8)
      .groupBy($"p_brand")
      .agg(dsum($"rev").as("brand_rev"), count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }

  val saltedJoinSql: String = s"""
    SELECT p_brand, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS brand_rev,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand"""

  /** Deterministic stratified sample of orders: URGENT keeps 50%, HIGH 20%,
    * the bulk 5%. Membership is a pure function of the key (portable md5
    * bucket), so the oracle reproduces the exact sample — and a re-run on
    * retried tasks cannot drift. Map-side filter; no shuffle. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Sampling.stratified(
        Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority"),
        $"o_orderpriority", $"o_orderkey",
        rates = Map("1-URGENT" -> 50, "2-HIGH" -> 20), defaultRate = 5)
      .orderBy($"o_orderkey")
  }

  val stratifiedSampleSql: String = """
    WITH b AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 100
                  AS INTEGER) AS sample_bucket
      FROM orders)
    SELECT o_orderkey, o_orderpriority, sample_bucket
    FROM b
    WHERE sample_bucket < CASE o_orderpriority WHEN '1-URGENT' THEN 50
                                               WHEN '2-HIGH' THEN 20 ELSE 5 END
    ORDER BY o_orderkey"""

  /** TPC-H Q17-shaped correlated scalar subquery: revenue from lineitems
    * whose quantity is below 20% of their part's average quantity — the
    * reference's per-record lookup loop (sync_oltp_to_olap.py:241-260) is
    * the row-at-a-time form of exactly this shape. Re-expressed Spark-first
    * as decorrelation BY HAND into a per-part WINDOW over the
    * brand-filtered fact subset: ONE fact scan (PlanAuditSpec pins the
    * scan count) + one broadcast part join + one exchange over the ~12%
    * brand slice for the window — not a per-row subquery, not a BNLJ, and
    * not the agg+join-back form, which re-evaluates the whole fact scan
    * per branch because broadcast joins leave no exchange to reuse. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_brand".isin("Brand#11", "Brand#22", "Brand#33"))
      .select($"p_partkey", $"p_brand")
    val flagged = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
    // the correlated scalar subquery as a per-part WINDOW over the
    // brand-filtered subset: the fact is scanned ONCE (an agg + join-back
    // would re-evaluate the whole scan subtree per branch — broadcast
    // joins leave no exchange boundary to reuse) at the cost of one
    // exchange over the ~12% brand slice — the cheaper side at 100 TB.
    // Same exact-decimal mean as Exact.davg, window-shaped.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val threshold = lit(0.2) *
      (sum($"l_quantity".cast(dec)).over(w).cast("double") / count($"l_quantity").over(w))
    flagged
      .withColumn("qty_threshold", threshold)
      .filter($"l_quantity" < $"qty_threshold")
      .groupBy($"p_brand")
      .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"),
           count(lit(1)).as("n_small"))
      .orderBy($"p_brand")
  }

  val q17SmallQuantitySql: String = s"""
    WITH flagged AS (
      SELECT l_partkey, l_quantity, l_extendedprice, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
    ), thresholds AS (
      SELECT l_partkey AS t_partkey,
             0.2 * (${sqlAvg("l_quantity")}) AS qty_threshold
      FROM flagged GROUP BY l_partkey
    )
    SELECT p_brand,
           ${sqlSum("l_extendedprice")} / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM flagged JOIN thresholds ON l_partkey = t_partkey
    WHERE l_quantity < qty_threshold
    GROUP BY p_brand ORDER BY p_brand"""

  /** Full CUBE over (market segment × order year) — all four grouping
    * combinations in one pass (the companion to `rollup_sales`'s
    * hierarchy-only ROLLUP). One broadcast join to the 2-column customer
    * projection, then a single Expand+HashAggregate: the fact shuffles once
    * on the cube keys, never per grouping set. */
  def cubeSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment")
    Tables.orders(spark, dir)
      .select($"o_custkey", year($"o_orderdate").as("order_year"), $"o_totalprice")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .cube($"c_mktsegment", $"order_year")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_total"))
      .orderBy($"c_mktsegment".asc_nulls_first, $"order_year".asc_nulls_first)
  }

  val cubeSalesSql: String = s"""
    SELECT c_mktsegment, year(o_orderdate) AS order_year,
           COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS sum_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, year(o_orderdate))
    ORDER BY c_mktsegment ASC NULLS FIRST, order_year ASC NULLS FIRST"""

  /** Frame-based moving statistics per customer: 3-order moving average
    * (ROWS 2 PRECEDING) and the delta vs the previous order. One shuffle on
    * the partition key; the frame sum accumulates in exact decimal so every
    * prefix matches the oracle bit-for-bit, and the delta is a plain IEEE
    * double subtraction (deterministic, identical across engines). */
  def windowMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderkey")
    val frame = w.rowsBetween(-2, 0)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        (sum($"o_totalprice".cast(dec)).over(frame).cast("double")
          / count(lit(1)).over(frame)).as("moving_avg"),
        ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowMovingAvgSql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg,
           o_totalprice - lag(o_totalprice, 1)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS delta_prev
    FROM orders ORDER BY o_custkey, o_orderkey"""

  /** Catalog statistics collection over lineitem — the input a cost-based
    * optimizer (or a data-quality monitor) needs: row count, per-column
    * null counts, exact NDVs, and typed min/max. One global aggregate: the
    * multi-column exact DISTINCTs plan as a single Expand+HashAggregate
    * (one scan, k× expanded shuffle of the partial-agg rows only). At
    * 100 TB swap the exact NDVs for one `approx_count_distinct` HLL per
    * column — no Expand, pure one-pass — exactly the `approx_distinct`
    * pattern; exact is kept here so the DuckDB oracle replays bit-for-bit.
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count($"l_orderkey")).as("orderkey_nulls"),
      countDistinct($"l_orderkey").as("orderkey_ndv"),
      min($"l_orderkey").as("orderkey_min"),
      max($"l_orderkey").as("orderkey_max"),
      countDistinct($"l_quantity").as("quantity_ndv"),
      min($"l_quantity").as("quantity_min"),
      max($"l_quantity").as("quantity_max"),
      countDistinct($"l_returnflag").as("returnflag_ndv"),
      min($"l_returnflag").as("returnflag_min"),
      max($"l_returnflag").as("returnflag_max"),
      min($"l_shipdate").as("shipdate_min"),
      max($"l_shipdate").as("shipdate_max"))
  }

  val tableStatsSql: String = """
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_orderkey) AS orderkey_nulls,
           COUNT(DISTINCT l_orderkey) AS orderkey_ndv,
           MIN(l_orderkey) AS orderkey_min, MAX(l_orderkey) AS orderkey_max,
           COUNT(DISTINCT l_quantity) AS quantity_ndv,
           MIN(l_quantity) AS quantity_min, MAX(l_quantity) AS quantity_max,
           COUNT(DISTINCT l_returnflag) AS returnflag_ndv,
           MIN(l_returnflag) AS returnflag_min, MAX(l_returnflag) AS returnflag_max,
           MIN(l_shipdate) AS shipdate_min, MAX(l_shipdate) AS shipdate_max
    FROM lineitem"""

  /** RANGE-frame trailing window: each order's count and revenue over the
    * SAME customer's orders in the trailing 30 days — a value-based frame
    * (RANGE BETWEEN), where `window_moving_avg`'s ROWS frame counts
    * neighbors. Event time is ordered as epoch seconds so both engines
    * bound the frame with identical integer arithmetic; one shuffle on the
    * customer key. */
  def windowTrailing30d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"ts")
      .rangeBetween(-30L * 86400, 0)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
              unix_timestamp($"o_orderdate").as("ts"))
      .select($"o_custkey", $"o_orderkey",
        count(lit(1)).over(w).as("n_trailing_30d"),
        sum($"o_totalprice".cast(dec)).over(w).cast("double").as("rev_trailing_30d"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowTrailing30dSql: String = """
    WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(epoch(o_orderdate) AS BIGINT) AS ts
               FROM orders)
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY ts
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
             AS n_trailing_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY ts
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rev_trailing_30d
    FROM t ORDER BY o_custkey, o_orderkey"""

  /** Sketch-table rollup + merge (`ops/Sketches`): per-year HLL sketches of
    * the customer set stand in for the per-partition sketch rows a 100 TB
    * warehouse persists at load time; the 'total' row answers the
    * all-years distinct from the SKETCHES ALONE (one `hll_union_agg` over
    * 7 tiny rows — history is never rescanned). Exact counts ride along as
    * the verification columns; the oracle checks them plus the ±5%
    * (>6σ at lgK=14) acceptance flag on each estimate. */
  def incrementalDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select(year($"o_orderdate").as("yr"), $"o_custkey")
    val sketches = graft.ops.Sketches.distinctSketch(o, $"yr", $"o_custkey")
    val yearlyExact = o.groupBy($"yr".as("b"))
      .agg(countDistinct($"o_custkey").as("exact_n"))
    val yearly = sketches.join(yearlyExact, $"bucket" === $"b")
      .select($"bucket".cast("string").as("scope"), $"n_rows", $"exact_n",
        (abs(hll_sketch_estimate($"sketch") - $"exact_n") <= $"exact_n" * 0.05)
          .as("within_5pct"))
    val totalExact = o.agg(countDistinct($"o_custkey").as("exact_n")).as("te")
    val total = graft.ops.Sketches.mergedEstimate(sketches)
      .join(totalExact)
      .select(lit("total").as("scope"), $"n_rows", $"exact_n",
        (abs($"distinct_estimate" - $"exact_n") <= $"exact_n" * 0.05)
          .as("within_5pct"))
    yearly.unionByName(total).orderBy($"scope")
  }

  val incrementalDistinctSql: String = """
    SELECT CAST(year(o_orderdate) AS VARCHAR) AS scope, COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS exact_n, TRUE AS within_5pct
    FROM orders GROUP BY year(o_orderdate)
    UNION ALL
    SELECT 'total' AS scope, COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS exact_n, TRUE AS within_5pct
    FROM orders
    ORDER BY scope"""

  /** Quantile sketch-table rollup (see [[graft.ops.Sketches
    * .histogramSketch]]) — the quantile member of the persisted-sketch
    * family next to [[incrementalDistinct]] and `heavy_hitters`: per-year
    * fixed-bin histograms of the price column (in exact cents) stand in
    * for the per-partition sketch rows a warehouse persists at load; two
    * subset queries ("all" years, "recent" ≥ 1996) are answered by
    * MERGING bins (plain addition) and reading exact integer ranks
    * ⌈n·p⌉ off the cumulative counts. The fixed-bin design is chosen over
    * GK/KLL deliberately: it is fully deterministic, so est_lo/est_hi are
    * oracle-HASHED, not just flag-checked; the one-bin-width value-space
    * error bound is known a priori. The true rank-r value (computed here
    * by an audit-only full sort per subset; at 100 TB you'd run the
    * sketch path alone) must land inside [est_lo, est_hi] — `bound_ok`
    * is deterministically true by construction. Cents come from the
    * proven double→DECIMAL(38,2) exact cast (2-decimal TPC-H prices,
    * |v|·10² ≪ 2⁵³); every bin/rank/edge computation is integer. The
    * domain bounds are one min/max scalar (the z-order bounds posture —
    * pass known bounds at scale). */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nbins = 1024
    val cents = Tables.lineitem(spark, dir)
      .select(year($"l_shipdate").as("yr"),
        ($"l_extendedprice".cast("decimal(38,2)") * 100).cast("long").as("cents"))
    val r = cents.agg(min($"cents"), max($"cents")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val subsets = (yr: org.apache.spark.sql.Column) =>
      explode(when(yr >= 1996, array(lit("all"), lit("recent")))
        .otherwise(array(lit("all")))).as("subset")
    val sk = graft.ops.Sketches.histogramSketch(cents, $"yr", $"cents", lo, hi, nbins)
      .select(subsets($"bucket"), $"bin", $"cnt")
    val est = graft.ops.Sketches.histogramQuantiles(sk, $"subset",
      Seq((1, 4), (1, 2), (9, 10), (99, 100)), lo, hi, nbins)
    val v = cents.select(subsets($"yr"), $"cents")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"subset").orderBy($"cents")))
    v.join(broadcast(est.withColumnRenamed("subset", "s")),
           $"subset" === $"s" && $"rn" === $"q_rank")
      .select($"subset", $"p_num", $"p_den", $"n", $"q_rank",
        $"est_lo", $"est_hi", $"cents".as("exact_cents"),
        $"cents".between($"est_lo", $"est_hi").as("bound_ok"))
      .orderBy($"subset", $"p_den", $"p_num")
  }

  val quantileSketchSql: String = """
    WITH c AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
                      CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
               FROM lineitem),
    b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c),
    s AS (SELECT yr, ((cents - lo) * 1024) // (hi - lo + 1) AS bin, COUNT(*) AS cnt
          FROM c, b GROUP BY 1, 2),
    x AS (SELECT subset, bin, SUM(cnt) AS cnt FROM (
            SELECT unnest(CASE WHEN yr >= 1996 THEN ['all','recent'] ELSE ['all'] END) AS subset,
                   bin, cnt FROM s)
          GROUP BY 1, 2),
    cum AS (SELECT subset, bin,
                   SUM(cnt) OVER (PARTITION BY subset ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY subset) AS n
            FROM x),
    est AS (SELECT subset, p_num, p_den, MAX(n) AS n, MAX(q_rank) AS q_rank, MIN(bin) AS bin
            FROM (SELECT *, (n * p_num + p_den - 1) // p_den AS q_rank
                  FROM cum CROSS JOIN (VALUES (1,4),(1,2),(9,10),(99,100)) AS q(p_num, p_den))
            WHERE cum >= q_rank GROUP BY 1, 2, 3),
    e2 AS (SELECT subset, p_num, p_den, CAST(n AS BIGINT) AS n,
                  CAST(q_rank AS BIGINT) AS q_rank,
                  CAST(lo + (bin * (hi - lo + 1) + 1023) // 1024 AS BIGINT) AS est_lo,
                  CAST(lo + ((bin + 1) * (hi - lo + 1) + 1023) // 1024 - 1 AS BIGINT) AS est_hi
           FROM est, b),
    v AS (SELECT subset, cents, ROW_NUMBER() OVER (PARTITION BY subset ORDER BY cents) AS rn
          FROM (SELECT unnest(CASE WHEN yr >= 1996 THEN ['all','recent'] ELSE ['all'] END) AS subset,
                       cents FROM c))
    SELECT e2.subset AS subset, p_num, p_den, n, q_rank, est_lo, est_hi,
           v.cents AS exact_cents,
           v.cents BETWEEN est_lo AND est_hi AS bound_ok
    FROM e2 JOIN v ON v.subset = e2.subset AND v.rn = e2.q_rank
    ORDER BY subset, p_den, p_num"""

  /** TPC-H Q21-shaped "sole blocker" analysis: suppliers who were the ONLY
    * late shipper on a multi-supplier order (late = shipped more than 90
    * days after the order date). The classic nested EXISTS / NOT-EXISTS
    * pair decorrelated into set-oriented form: one (orderkey, suppkey)
    * aggregate for per-supplier lateness, one orderkey aggregate for the
    * order-level counts, then a join-back — every step shuffles on the
    * orderkey the lineitem side is already clustered by; the supplier
    * dimension broadcasts at the end. */
  def q21LateSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAY")).as("late"))
    val perSupp = li.groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"late").as("supp_late"))
    val perOrder = perSupp.groupBy($"l_orderkey".as("ok"))
      .agg(count(lit(1)).as("n_supp"),
           count(when($"supp_late", 1)).as("n_late_supp"))
      .filter($"n_supp" >= 2 && $"n_late_supp" === 1)
    perSupp.filter($"supp_late")
      .join(perOrder, $"l_orderkey" === $"ok")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  val q21LateSupplierSql: String = """
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
      FROM li GROUP BY 1, 2
    ), per_order AS (
      SELECT l_orderkey FROM per_supp
      GROUP BY l_orderkey
      HAVING COUNT(*) >= 2 AND COUNT(CASE WHEN supp_late THEN 1 END) = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE supp_late
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20"""

  /** Fixed-iteration PageRank over the symmetrized supplier↔customer
    * co-purchase graph (`ops/Graph.pageRank`): nodes encode as
    * custkey·2 / suppkey·2+1 (disjoint parities), 3 deterministic
    * FIXED-POINT iterations (ranks as 10⁻¹⁵-unit integers, damping as the
    * rational 85/100 — see Graph's scaladoc for why fp/decimal forms
    * cannot be cross-engine-exact), so the oracle replays the whole
    * computation as unrolled integer CTEs bit-for-bit. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = graft.ops.Par.spread(Tables.lineitem(spark, dir))
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"s".as("dst"))
      .union(pairs.select($"s".as("src"), $"c".as("dst")))
    graft.ops.Graph.pageRank(edges, iters = 3)
      .select(
        when($"node" % 2 === 0, "customer").otherwise("supplier").as("node_type"),
        ($"node" / 2).cast("long").as("entity_id"),
        $"node", $"rank")
      .orderBy($"rank".desc, $"node")
      .limit(100)
      .drop("node")
  }

  val graphPagerankSql: String = {
    // one fixed-point PageRank step as SQL, parameterized on the previous
    // iterate — pure integer multiply/divide/sum, mirroring Graph.pageRank
    // (DuckDB's SUM(BIGINT) is HUGEINT; the // arithmetic stays exact and
    // equals the long math — nothing overflows either representation)
    val u = "1000000000000000"
    def step(prev: String, out: String) = s"""
    $out AS (
      SELECT n.node,
             (15 * $u) // (100 * (SELECT COUNT(*) FROM nodes)) +
               (85 * COALESCE(s.in_sum, 0)) // 100 AS rank_u
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank_u // d.out_deg) AS in_sum
        FROM e JOIN $prev r ON e.src = r.node JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON n.node = s.node)"""
    s"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    e AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
    r0 AS (SELECT node, $u // (SELECT COUNT(*) FROM nodes) AS rank_u FROM nodes),
    ${step("r0", "r1")},
    ${step("r1", "r2")},
    ${step("r2", "r3")}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(node // 2 AS BIGINT) AS entity_id,
           CAST(rank_u AS DOUBLE) / CAST($u AS DOUBLE) AS rank
    FROM r3 ORDER BY rank DESC, node LIMIT 100"""
  }

  /** Per-group Pearson correlation from exact decimal moment sums: the six
    * algebraic moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
    * DECIMAL(38,4) — exact, order-free — and the correlation assembles in
    * double from those exact values, so both engines compute the identical
    * number (a running `corr()` aggregate is reduction-order-dependent and
    * never hash-matches across engines). This is also the 100 TB shape:
    * moments are map-side-combinable and mergeable across partitions,
    * shards and incremental loads — the sketch-table idea for second-order
    * statistics.
    *
    * Scale 4, not the money-column 6: the double→decimal CAST is only
    * cross-engine-exact while the per-row |value|·10^scale stays below
    * 2⁵³ (Java expands the double exactly; DuckDB scales in double first —
    * above 2⁵³ the two round differently). Σy² terms reach ~1.1e10, so
    * scale 6 put them at ~1.1e16 > 2⁵³ and the engines disagreed in the
    * last decimal unit; scale 4 (~1.1e14) is exact in both — and prices
    * carry 2 decimals, so squares need only 4. */
  def statsCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 4)
    def m(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast("double")
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity".as("x"), $"l_extendedprice".as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
           m($"x").as("sx"), m($"y").as("sy"), m($"x" * $"y").as("sxy"),
           m($"x" * $"x").as("sxx"), m($"y" * $"y").as("syy"))
      .select($"l_returnflag", $"n".cast("long").as("n"),
        (($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")))
          .as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  // The decimal→double casts go through VARCHAR: DuckDB's direct
  // DECIMAL→DOUBLE cast double-rounds (int128 mantissa then the 10^-scale
  // multiply), which breaks exactly at .5-ulp midpoints — sf0.001's group-A
  // Σy² = 7096786968835.8685 is such a midpoint (half-even = ...868, DuckDB
  // direct = ...869) — while its VARCHAR→DOUBLE parse is correctly rounded,
  // matching the JVM's BigDecimal path bit for bit.
  val statsCorrSql: String = """
    WITH mo AS (
      SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             AS corr_qty_price
    FROM mo ORDER BY l_returnflag"""

  /** Count-Min sketch-table rollup (see [[graft.ops.Sketches.countMinSketch]]):
    * per-year CM sketches of order priorities, merged per-cell across
    * years, point estimates = min over depths — the point-frequency
    * member of the persisted-sketch family. Counters are pure sums over
    * the portable md5 slot hash, so the whole pipeline hash-checks
    * (exact counts ride along; `overestimates_ok` pins CM's
    * deterministic est ≥ exact guarantee). */
  def countminSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("item"), year($"o_orderdate").as("yr"))
    val sketch = graft.ops.Sketches.countMinSketch(base, $"yr", $"item")
    val exact = base.groupBy($"item").agg(count(lit(1)).as("exact_n"))
    val est = graft.ops.Sketches.countMinEstimates(sketch, exact.select($"item"), "item")
    exact.join(est, "item")
      .select($"item".as("o_orderpriority"), $"exact_n", $"est_n",
        ($"est_n" >= $"exact_n").as("overestimates_ok"))
      .orderBy("o_orderpriority")
  }

  val countminSketchSql: String = """
    WITH base AS (
      SELECT o_orderpriority AS item, year(CAST(o_orderdate AS DATE)) AS yr
      FROM orders),
    cells AS (
      SELECT yr, d AS depth,
             CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || item), 1, 15))::BIGINT
                  % 32 AS INTEGER) AS slot,
             COUNT(*) AS cnt
      FROM base, (SELECT unnest([0, 1, 2]) AS d) t GROUP BY 1, 2, 3),
    merged AS (SELECT depth, slot, SUM(cnt) AS cnt FROM cells GROUP BY 1, 2),
    items AS (SELECT item, COUNT(*) AS exact_n FROM base GROUP BY 1),
    probes AS (
      SELECT item, d AS depth,
             CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || item), 1, 15))::BIGINT
                  % 32 AS INTEGER) AS slot
      FROM items, (SELECT unnest([0, 1, 2]) AS d) t),
    est AS (SELECT item, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_n
            FROM probes LEFT JOIN merged USING (depth, slot) GROUP BY 1)
    SELECT item AS o_orderpriority, exact_n, est_n,
           est_n >= exact_n AS overestimates_ok
    FROM items JOIN est USING (item) ORDER BY 1"""

  /** Data-quality expectations gate (see [[graft.ops.Audit.expect]]):
    * seven declared violation rules over lineitem evaluated in ONE scan
    * (one conditional count per rule inside a single aggregate — never a
    * pass per rule), reported one row per rule with the pass flag. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Audit.expect(Tables.lineitem(spark, dir), Seq(
      "null_orderkey" -> $"l_orderkey".isNull,
      "nonpositive_quantity" -> ($"l_quantity" <= 0.0),
      "discount_out_of_range" -> ($"l_discount" < 0.0 || $"l_discount" > 1.0),
      "negative_price" -> ($"l_extendedprice" < 0.0),
      "tax_out_of_range" -> ($"l_tax" < 0.0 || $"l_tax" > 1.0),
      "unknown_returnflag" -> !$"l_returnflag".isin("A", "N", "R"),
      "shipdate_out_of_range" ->
        ($"l_shipdate" < lit("1990-01-01 00:00:00").cast("timestamp") ||
         $"l_shipdate" >= lit("2010-01-01 00:00:00").cast("timestamp"))))
      .orderBy("rule")
  }

  val dqAuditSql: String = {
    val rules = Seq(
      "null_orderkey" -> "l_orderkey IS NULL",
      "nonpositive_quantity" -> "l_quantity <= 0",
      "discount_out_of_range" -> "(l_discount < 0 OR l_discount > 1)",
      "negative_price" -> "l_extendedprice < 0",
      "tax_out_of_range" -> "(l_tax < 0 OR l_tax > 1)",
      "unknown_returnflag" -> "l_returnflag NOT IN ('A', 'N', 'R')",
      "shipdate_out_of_range" ->
        "(l_shipdate < TIMESTAMP '1990-01-01 00:00:00' OR l_shipdate >= TIMESTAMP '2010-01-01 00:00:00')")
    val counts = rules.zipWithIndex
      .map { case ((_, p), i) => s"COUNT(CASE WHEN $p THEN 1 END) AS v$i" }
      .mkString(",\n             ")
    val sel = rules.zipWithIndex.map { case ((n, _), i) =>
      s"SELECT '$n' AS rule, n_rows, v$i AS n_violations, v$i = 0 AS pass FROM c"
    }.mkString("\n    UNION ALL ")
    s"""
    WITH c AS (
      SELECT COUNT(*) AS n_rows,
             $counts
      FROM lineitem)
    $sel
    ORDER BY rule"""
  }

  /** Key-skew diagnostic report (see [[graft.ops.Skew.skewReport]]) over
    * the fact's supplier key — the measurement behind the salting
    * decision `salted_join` demonstrates. */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Skew.skewReport(Tables.lineitem(spark, dir), $"l_suppkey",
      hotMultiple = 2.0)
  }

  val skewReportSql: String = """
    WITH s AS (SELECT l_suppkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
    t AS (SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
                 MAX(n) AS max_rows
          FROM s)
    SELECT n_keys, n_rows, max_rows,
           CAST(n_rows AS DOUBLE) / n_keys AS mean_rows,
           CAST(max_rows AS DOUBLE) * n_keys / n_rows AS skew_ratio,
           (SELECT COUNT(*) FROM s, t
            WHERE CAST(n AS DOUBLE) * n_keys >=
                  CAST(2.0 AS DOUBLE) * CAST(n_rows AS DOUBLE)) AS n_hot_keys
    FROM t"""

  /** Bloom membership filter (see [[graft.ops.Sketches.bloomSketch]]):
    * per-year blooms of the customers who ordered in 1995, merged by bit
    * union, every customer probed — the persisted form of the runtime
    * join-pruning filter. Exact membership rides along and
    * `no_false_negative` pins Bloom's deterministic guarantee; the
    * false-positive rows are the (engine-identical) cost of the fixed
    * bit width. */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01 00:00:00").cast("timestamp") &&
              $"o_orderdate" <  lit("1996-01-01 00:00:00").cast("timestamp"))
      .select(year($"o_orderdate").as("yr"), $"o_custkey".cast("string").as("ck"))
    val sketch = graft.ops.Sketches.bloomSketch(recent, $"yr", $"ck")
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_custkey".cast("string").as("ck"))
    val probed = graft.ops.Sketches.bloomProbe(sketch, cust.select($"ck"), "ck")
    cust
      .join(probed, "ck")
      .join(recent.select($"ck").distinct().withColumn("ap", lit(true)),
        Seq("ck"), "left")
      .select($"c_custkey", $"maybe_present",
        coalesce($"ap", lit(false)).as("actually_present"),
        ($"maybe_present" || coalesce($"ap", lit(false)) === false)
          .as("no_false_negative"))
      .orderBy("c_custkey")
  }

  val bloomMembershipSql: String = """
    WITH recent AS (
      SELECT year(CAST(o_orderdate AS DATE)) AS yr,
             CAST(o_custkey AS VARCHAR) AS ck
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
    bitset AS (
      SELECT DISTINCT yr,
             CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ck), 1, 15))::BIGINT
                  % 65536 AS INTEGER) AS bit
      FROM recent, (SELECT unnest([0, 1, 2]) AS d) t),
    merged AS (SELECT DISTINCT bit FROM bitset),
    cust AS (SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS ck FROM customer),
    hits AS (
      SELECT ck, COUNT(*) AS n_hits
      FROM (SELECT ck,
              CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ck), 1, 15))::BIGINT
                   % 65536 AS INTEGER) AS bit
            FROM cust, (SELECT unnest([0, 1, 2]) AS d) t) p
      WHERE bit IN (SELECT bit FROM merged)
      GROUP BY ck),
    a AS (SELECT DISTINCT ck FROM recent)
    SELECT c_custkey,
           COALESCE(n_hits = 3, FALSE) AS maybe_present,
           (a.ck IS NOT NULL) AS actually_present,
           (COALESCE(n_hits = 3, FALSE) OR a.ck IS NULL) AS no_false_negative
    FROM cust LEFT JOIN hits USING (ck) LEFT JOIN a ON cust.ck = a.ck
    ORDER BY c_custkey"""

  /** Pareto-frontier supplier report (see [[graft.ops.Skyline]]): the
    * suppliers not dominated on (account balance, total revenue) — the
    * multi-criteria "best supplier" skyline. The window formulation
    * needs no dominance self-join; the oracle deliberately USES the
    * quadratic NOT-EXISTS dominance definition, so it independently
    * validates the window logic rather than replaying it. */
  def skylineSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    val agg = rev
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal".as("acctbal"), $"revenue")
    graft.ops.Skyline.frontier2d(agg, x = "revenue", y = "acctbal")
      .select($"s_suppkey", $"s_name", $"acctbal", $"revenue")
      .orderBy($"revenue".desc, $"s_suppkey")
  }

  val skylineSuppliersSql: String = s"""
    WITH rev AS (
      SELECT l_suppkey, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem GROUP BY 1),
    agg AS (
      SELECT s_suppkey, s_name, s_acctbal AS acctbal, revenue
      FROM supplier JOIN rev ON s_suppkey = l_suppkey)
    SELECT s_suppkey, s_name, acctbal, revenue
    FROM agg a
    WHERE NOT EXISTS (
      SELECT 1 FROM agg b
      WHERE b.revenue >= a.revenue AND b.acctbal >= a.acctbal
        AND (b.revenue > a.revenue OR b.acctbal > a.acctbal))
    ORDER BY revenue DESC, s_suppkey"""

  /** Revenue decile report: exact ntile(10) assignment over the
    * customer-level revenue aggregate (deterministic total order:
    * revenue DESC, custkey), then per-decile size and revenue range.
    * The global ntile sorts a CUSTOMER-dim-sized aggregate, never the
    * fact; when even that is too large to single-sort, the
    * quantile-threshold assignment (`ccnet_length_buckets` pattern)
    * replaces exact ntile. */
  def customerDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(dsum($"o_totalprice").as("revenue"))
    rev
      .withColumn("decile",
        ntile(10).over(Window.orderBy($"revenue".desc, $"o_custkey")))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        dsum($"revenue").as("decile_revenue"),
        min($"revenue").as("min_revenue"),
        max($"revenue").as("max_revenue"))
      .orderBy($"decile")
  }

  val customerDecilesSql: String = s"""
    WITH rev AS (
      SELECT o_custkey, ${sqlSum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1),
    t AS (
      SELECT revenue,
             ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
      FROM rev)
    SELECT decile, COUNT(*) AS n_customers,
           ${sqlSum("revenue")} AS decile_revenue,
           min(revenue) AS min_revenue, max(revenue) AS max_revenue
    FROM t GROUP BY decile ORDER BY decile"""

  /** RFM segmentation — the classic customer-value model: recency (days
    * since the customer's last order, measured against the corpus's max
    * order date), frequency (order count) and monetary (exact-decimal
    * revenue), each cut into quartiles by a deterministic ntile(4)
    * (measure then custkey — best customers in tile 1 on every axis), and
    * the composite `rfm_code`. Like [[customerDeciles]], each global
    * ntile sorts only the CUSTOMER-dim-sized aggregate — the fact table
    * contributes one keyed aggregate and is never globally sorted; at a
    * scale where even the dim sort hurts, quantile-threshold assignment
    * replaces exact ntile. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, dir)
    val maxD = orders.agg(max($"o_orderdate".cast("date")).as("max_d"))
    orders.groupBy($"o_custkey")
      .agg(max($"o_orderdate".cast("date")).as("last_d"),
           count(lit(1)).as("frequency"),
           dsum($"o_totalprice").as("monetary"))
      .crossJoin(broadcast(maxD))
      .select($"o_custkey", datediff($"max_d", $"last_d").as("recency_days"),
        $"frequency", $"monetary")
      .withColumn("r_tile",
        ntile(4).over(Window.orderBy($"recency_days", $"o_custkey")))
      .withColumn("f_tile",
        ntile(4).over(Window.orderBy($"frequency".desc, $"o_custkey")))
      .withColumn("m_tile",
        ntile(4).over(Window.orderBy($"monetary".desc, $"o_custkey")))
      .withColumn("rfm_code", concat($"r_tile".cast("string"), lit("-"),
        $"f_tile".cast("string"), lit("-"), $"m_tile".cast("string")))
      .orderBy($"o_custkey")
  }

  val rfmSegmentsSql: String = s"""
    WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
    per AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
              CAST(COUNT(*) AS BIGINT) AS frequency,
              ${sqlSum("o_totalprice")} AS monetary
            FROM orders GROUP BY 1),
    r AS (SELECT o_custkey,
            CAST(date_diff('day', last_d, max_d) AS INTEGER) AS recency_days,
            frequency, monetary
          FROM per CROSS JOIN maxd),
    t AS (SELECT *,
            ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_tile,
            ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_tile,
            ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_tile
          FROM r)
    SELECT o_custkey, recency_days, frequency, monetary, r_tile, f_tile, m_tile,
      CAST(r_tile AS VARCHAR) || '-' || CAST(f_tile AS VARCHAR) || '-' ||
        CAST(m_tile AS VARCHAR) AS rfm_code
    FROM t ORDER BY o_custkey"""

  /** 3-hop BFS neighborhood of customer 1 over the same symmetrized
    * co-purchase graph graph_pagerank walks (see [[graft.ops.Graph.bfsHops]]):
    * hop 1 = their suppliers, hop 2 = customers sharing one, hop 3 =
    * those customers' suppliers. */
  def graphBfsHops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = graft.ops.Par.spread(Tables.lineitem(spark, dir))
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"s".as("dst"))
      .union(pairs.select($"s".as("src"), $"c".as("dst")))
    // seeds picked from the checkpointed edge copy — an external sources
    // frame would re-plan the whole lineitem⋈orders pipeline a second time
    graft.ops.Graph.bfsHopsFrom(edges, col("src") === 2L, iters = 3)
      .select(
        when($"node" % 2 === 0, "customer").otherwise("supplier").as("node_type"),
        ($"node" / 2).cast("long").as("entity_id"),
        $"hop")
      .orderBy($"hop", $"node_type", $"entity_id")
  }

  val graphBfsHopsSql: String = {
    def round(prev: String, vis: String, out: String, vout: String, r: Int) = s"""
    $out AS MATERIALIZED (
      SELECT DISTINCT e.dst AS node
      FROM e JOIN $prev f ON e.src = f.node
      WHERE e.dst NOT IN (SELECT node FROM $vis)),
    $vout AS MATERIALIZED (
      SELECT * FROM $vis UNION ALL SELECT node, $r AS hop FROM $out)"""
    s"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    e AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
    v0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, 0 AS hop FROM e WHERE src = 2),
    f0 AS (SELECT node FROM v0),
    ${round("f0", "v0", "f1", "v1", 1)},
    ${round("f1", "v1", "f2", "v2", 2)},
    ${round("f2", "v2", "f3", "v3", 3)}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(node // 2 AS BIGINT) AS entity_id, hop
    FROM v3 ORDER BY hop, node_type, entity_id"""
  }

  /** GROUPING SETS that neither ROLLUP nor CUBE can express: the two
    * single-dimension marginals plus the full cross — but NOT the grand
    * total (a dashboard that shows per-year and per-priority panels wants
    * exactly these three). One scan, one expand + hash aggregate; Catalyst
    * plans the Expand with only the requested 3 projections, not CUBE's 4.
    * The grouping columns are never NULL in the data, so a NULL uniquely
    * marks "aggregated over" (same contract rollup_sales relies on). */
  def groupingSetsSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(year($"o_orderdate").as("order_year"), $"o_orderpriority",
        $"o_totalprice")
      .groupingSets(
        Seq(Seq($"order_year", $"o_orderpriority"), Seq($"order_year"),
          Seq($"o_orderpriority")),
        $"order_year", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_total"))
      .orderBy($"order_year".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val groupingSetsSalesSql: String = s"""
    SELECT year(o_orderdate) AS order_year, o_orderpriority,
           COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                            (year(o_orderdate)), (o_orderpriority))
    ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  /** EXACT per-group median + nearest-rank p90 — for when the contract is
    * exactness (SLA attainment, billing percentiles) and approx_quantiles'
    * error bound is not acceptable. Manual position selection — rank the
    * group once, pick rows at integer positions, average the two middle
    * values — instead of percentile()/quantile_cont(), whose interpolation
    * arithmetic differs across engines; every step here is integer math
    * plus one (a+b)/2, so the value is engine-independent and hash-pinned.
    * Cost is the honest exact-quantile cost: one full sort per group (a
    * single shuffle; at 100 TB this is why approx_quantiles exists — this
    * operator is the small-group/exactness-mandated path). */
  def exactMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"l_quantity".asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity")
      .select($"l_returnflag", $"l_quantity",
        row_number().over(wOrd).as("rn"), count(lit(1)).over(wAll).as("n"))
      .groupBy($"l_returnflag")
      .agg(
        max($"n").as("n_rows"),
        ((max(when(expr("rn = (n + 1) div 2"), $"l_quantity")) +
          max(when(expr("rn = (n + 2) div 2"), $"l_quantity"))) / 2.0)
          .as("median_qty"),
        max(when(expr("rn = (9 * n + 9) div 10"), $"l_quantity")).as("p90_qty"))
      .orderBy($"l_returnflag")
  }

  val exactMedianSql: String = """
    WITH r AS (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN l_quantity END)
          + MAX(CASE WHEN rn = (n + 2) // 2 THEN l_quantity END)) / 2.0
             AS median_qty,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN l_quantity END) AS p90_qty
    FROM r GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Cross-table reconciliation audit — does the order header's total agree
    * with the sum of its lines? The post-sync check a warehouse runs after
    * every OLTP→OLAP load (the reference's RI repair trusts keys; this
    * audits MEASURES). Differences land in relative-error bands, plus a
    * band for headers with no lines at all. The per-order net accumulates
    * in DECIMAL(38,6) (order-independent), the band edges compare IEEE
    * doubles — deterministic on every engine. One aggregate + one join on
    * the order key, both sides clustered on it. */
  def factReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val net = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") *
        (lit(1.0) + $"l_tax")).cast(dec)).as("net"))
    Tables.orders(spark, dir)
      .join(net, $"o_orderkey" === $"l_orderkey", "left")
      .select($"o_orderkey", $"o_totalprice",
        abs($"o_totalprice".cast(dec) - $"net").as("abs_diff"),
        when($"net".isNull, lit(null).cast("double"))
          .otherwise(abs($"o_totalprice".cast(dec) - $"net").cast("double") /
            $"o_totalprice").as("rel"))
      .select(
        when($"rel".isNull, "no_lineitems")
          .when($"rel" < 0.001, "within_0.1pct")
          .when($"rel" < 0.01, "within_1pct")
          .when($"rel" < 0.1, "within_10pct")
          .otherwise("off_10pct_plus").as("band"),
        $"abs_diff")
      .groupBy($"band")
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum($"abs_diff"), lit(0).cast(dec)).cast("double")
          .as("sum_abs_diff"))
      .orderBy($"band")
  }

  val factReconcileSql: String = """
    WITH net AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                      AS DECIMAL(38,6))) AS net
      FROM lineitem GROUP BY l_orderkey),
    d AS (
      SELECT o_orderkey,
             abs(CAST(o_totalprice AS DECIMAL(38,6)) - net) AS abs_diff,
             CASE WHEN net IS NULL THEN NULL
                  ELSE CAST(abs(CAST(o_totalprice AS DECIMAL(38,6)) - net)
                            AS DOUBLE) / o_totalprice END AS rel
      FROM orders LEFT JOIN net ON o_orderkey = l_orderkey),
    b AS (
      SELECT CASE WHEN rel IS NULL THEN 'no_lineitems'
                  WHEN rel < 0.001 THEN 'within_0.1pct'
                  WHEN rel < 0.01 THEN 'within_1pct'
                  WHEN rel < 0.1 THEN 'within_10pct'
                  ELSE 'off_10pct_plus' END AS band, abs_diff
      FROM d)
    SELECT band, COUNT(*) AS n_orders,
           CAST(COALESCE(SUM(abs_diff), 0) AS DOUBLE) AS sum_abs_diff
    FROM b GROUP BY band ORDER BY band"""

  /** Semi-additive measure: month-end "balance" per market segment — the
    * aggregation class (account balances, inventory levels) that sums
    * across ENTITIES but takes LAST-VALUE across TIME, which plain
    * GROUP BY cannot express. Per (customer, month) the latest order's
    * total is selected by lexicographic struct-argmax (deterministic
    * ties), carried forward across empty months with an ignore-nulls
    * last() over a customer×month grid, then summed per (month, segment)
    * in DECIMAL(38,6). The grid explodes MAP-SIDE from the customer dim ×
    * a 1-row broadcast month span — dimension-bounded (|customers| ×
    * |months|), never fact-bounded; the fact is touched exactly once
    * (events_gap_fill's posture at month grain). */
  def semiAdditiveBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val mo = Tables.orders(spark, dir).select($"o_custkey",
      (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).as("mi"),
      unix_micros($"o_orderdate".cast("timestamp")).as("t"),
      $"o_orderkey", $"o_totalprice")
    val lastPer = mo.groupBy($"o_custkey", $"mi")
      .agg(max(struct($"t", $"o_orderkey", $"o_totalprice")).as("m"))
      .select($"o_custkey", $"mi".as("lmi"), $"m.o_totalprice".as("bal"))
    val span = mo.agg(min($"mi").as("lo"), max($"mi").as("hi"))
    val grid = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
      .crossJoin(broadcast(span))
      .select($"c_custkey", $"c_mktsegment",
        explode(sequence($"lo", $"hi")).as("mi"))
    val wFill = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_custkey").orderBy($"mi")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid
      .join(lastPer,
        $"c_custkey" === $"o_custkey" && $"mi" === $"lmi", "left")
      .select($"c_custkey", $"c_mktsegment", $"mi",
        last($"bal", ignoreNulls = true).over(wFill).as("balance"))
      .filter($"balance".isNotNull)
      .groupBy($"mi", $"c_mktsegment")
      .agg(count(lit(1)).as("n_active"),
        sum($"balance".cast(dec)).cast("double").as("total_balance"))
      .select(expr("mi div 12").cast("int").as("yr"),
        ($"mi" % 12 + 1).cast("int").as("mo_num"),
        $"c_mktsegment", $"n_active", $"total_balance")
      .orderBy($"yr", $"mo_num", $"c_mktsegment")
  }

  val semiAdditiveBalanceSql: String = """
    WITH mo AS (
      SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
             epoch_us(o_orderdate) AS t, o_orderkey, o_totalprice
      FROM orders),
    lastper AS (
      SELECT o_custkey, mi AS lmi, o_totalprice AS bal
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, mi
                                         ORDER BY t DESC, o_orderkey DESC) AS rn
            FROM mo) WHERE rn = 1),
    span AS (SELECT min(mi) AS lo, max(mi) AS hi FROM mo),
    grid AS (
      SELECT c_custkey, c_mktsegment, unnest(range(lo, hi + 1)) AS mi
      FROM customer CROSS JOIN span),
    filled AS (
      SELECT c_custkey, c_mktsegment, mi,
             last_value(bal IGNORE NULLS)
               OVER (PARTITION BY c_custkey ORDER BY mi
                     ROWS UNBOUNDED PRECEDING) AS balance
      FROM grid g LEFT JOIN lastper l
        ON g.c_custkey = l.o_custkey AND g.mi = l.lmi)
    SELECT CAST(mi // 12 AS INT) AS yr, CAST(mi % 12 + 1 AS INT) AS mo_num,
           c_mktsegment, COUNT(*) AS n_active,
           CAST(SUM(CAST(balance AS DECIMAL(38,6))) AS DOUBLE) AS total_balance
    FROM filled WHERE balance IS NOT NULL
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Market-basket association at brand granularity: for brand pairs
    * co-purchased in the same order, support and LIFT
    * (P(a,b)/(P(a)·P(b)) — >1 means genuinely bought together, not just
    * both popular). The basket first reduces to DISTINCT (order, brand) —
    * pair fan-out is then bounded by the small brand count per order,
    * never the lineitem count, and the self-join runs on the orderkey
    * both sides are clustered by. Counts are exact longs; lift/support
    * are single IEEE divisions of exact products. The min-support cut
    * (≥5 orders) is part of the operator: below it, lift is noise. */
  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ob = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("brand"))
      .distinct()
    val nOrders = ob.select($"ok").distinct().agg(count(lit(1)).as("n_orders"))
    val brandN = ob.groupBy($"brand").agg(count(lit(1)).as("bn"))
    val pairs = ob.as("a")
      .join(ob.as("b"), $"a.ok" === $"b.ok" && $"a.brand" < $"b.brand")
      .groupBy($"a.brand".as("brand_a"), $"b.brand".as("brand_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter($"pair_n" >= 5)
    pairs
      .join(broadcast(brandN.select($"brand".as("brand_a"), $"bn".as("na"))),
        Seq("brand_a"))
      .join(broadcast(brandN.select($"brand".as("brand_b"), $"bn".as("nb"))),
        Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select($"brand_a", $"brand_b", $"pair_n",
        ($"pair_n".cast("double") / $"n_orders").as("support"),
        (($"pair_n" * $"n_orders").cast("double") / ($"na" * $"nb"))
          .as("lift"))
      .orderBy($"brand_a", $"brand_b")
  }

  val basketLiftSql: String = """
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM ob),
    bn AS (SELECT brand, COUNT(*) AS bn FROM ob GROUP BY brand),
    p AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_n
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2 HAVING COUNT(*) >= 5)
    SELECT brand_a, brand_b, CAST(pair_n AS BIGINT) AS pair_n,
           CAST(pair_n AS DOUBLE) / n_orders AS support,
           CAST(pair_n * n_orders AS DOUBLE) / (na.bn * nb.bn) AS lift
    FROM p
    JOIN bn na ON p.brand_a = na.brand
    JOIN bn nb ON p.brand_b = nb.brand
    CROSS JOIN n
    ORDER BY brand_a, brand_b"""

  /** Cohort LTV triangle: customers grouped by FIRST-order month, each
    * cohort's exact cumulative revenue tracked by months-since-first —
    * the "how much is a cohort worth after N months" table subscription
    * and retail teams steer by. First-order month is one min() window
    * over the order frame (no self-join); the cumulative sum is a window
    * over the |cohorts|×|offsets| aggregate, never the fact. Revenue
    * accumulates in DECIMAL(38,6); month math is pure integers. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val o = Tables.orders(spark, dir).select($"o_custkey",
      (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).as("mi"),
      $"o_totalprice")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"o_custkey")
    val cohorted = o.select($"o_custkey", $"mi", $"o_totalprice",
      min($"mi").over(w).as("cohort_mi"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"cohort_mi").orderBy($"month_offset")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cohorted
      .groupBy($"cohort_mi", ($"mi" - $"cohort_mi").as("month_offset"))
      .agg(countDistinct($"o_custkey").as("n_customers"),
        sum($"o_totalprice".cast(dec)).as("rev"))
      .select($"cohort_mi", $"month_offset", $"n_customers",
        $"rev".cast("double").as("revenue"),
        sum($"rev").over(wCum).cast("double").as("cum_revenue"))
      .orderBy($"cohort_mi", $"month_offset")
  }

  val cohortLtvSql: String = """
    WITH o AS (
      SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
             o_totalprice,
             MIN(year(o_orderdate) * 12 + month(o_orderdate) - 1)
               OVER (PARTITION BY o_custkey) AS cohort_mi
      FROM orders),
    g AS (
      SELECT cohort_mi, mi - cohort_mi AS month_offset,
             COUNT(DISTINCT o_custkey) AS n_customers,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM o GROUP BY 1, 2)
    SELECT cohort_mi, month_offset, CAST(n_customers AS BIGINT) AS n_customers,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (PARTITION BY cohort_mi ORDER BY month_offset
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cum_revenue
    FROM g ORDER BY cohort_mi, month_offset"""

  /** Discount-response profile: per discount band, volume, exact average
    * quantity, and revenue — the "does discounting move units" read-out
    * (TPC-H Q6's domain, aggregated instead of filtered). Bands are
    * integer percent floors (pure integer math both engines); averages
    * come from DECIMAL sums. One scan, one tiny-key shuffle.
    *
    * round(), deliberately not floor(): discounts are 2-decimal values
    * whose IEEE double image sits a few ulps off the integer percent
    * (0.06*100 computes BELOW 6.0), so floor would mislabel bands;
    * round lands every near-integer on the intended band and its
    * HALF_UP-vs-half-even difference never engages off the .5 tie. */
  def discountEffect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select(round($"l_discount" * 100).cast("int").as("discount_pct"),
        $"l_quantity", $"l_extendedprice", $"l_discount")
      .groupBy($"discount_pct")
      .agg(count(lit(1)).as("n_lines"),
        davg($"l_quantity").as("avg_qty"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_revenue"))
      .orderBy($"discount_pct")
  }

  val discountEffectSql: String = s"""
    SELECT CAST(round(l_discount * 100) AS INT) AS discount_pct,
           COUNT(*) AS n_lines,
           ${sqlAvg("l_quantity")} AS avg_qty,
           ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS net_revenue
    FROM lineitem GROUP BY 1 ORDER BY 1"""

  val registry: Seq[Q] = Seq(
    Q("cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    Q("discount_effect", discountEffect, Some(discountEffectSql)),
    Q("basket_lift", basketLift, Some(basketLiftSql)),
    Q("semi_additive_balance", semiAdditiveBalance, Some(semiAdditiveBalanceSql)),
    Q("grouping_sets_sales", groupingSetsSales, Some(groupingSetsSalesSql)),
    Q("exact_median", exactMedian, Some(exactMedianSql)),
    Q("fact_reconcile", factReconcile, Some(factReconcileSql)),
    Q("graph_bfs_hops", graphBfsHops, Some(graphBfsHopsSql)),
    Q("skyline_suppliers", skylineSuppliers, Some(skylineSuppliersSql)),
    Q("customer_deciles", customerDeciles, Some(customerDecilesSql)),
    Q("rfm_segments", rfmSegments, Some(rfmSegmentsSql)),
    Q("q1_pricing_summary", q1PricingSummary, Some(q1PricingSummarySql)),
    Q("q3_shipping_priority", q3ShippingPriority, Some(q3ShippingPrioritySql)),
    Q("q5_local_supplier", q5LocalSupplier, Some(q5LocalSupplierSql)),
    Q("q6_forecast_revenue", q6ForecastRevenue, Some(q6ForecastRevenueSql)),
    Q("q4_priority_semi", q4PrioritySemi, Some(q4PrioritySemiSql)),
    Q("customers_no_urgent", customersNoUrgent, Some(customersNoUrgentSql)),
    Q("topn_per_group", topnPerGroup, Some(topnPerGroupSql)),
    Q("running_total", runningTotal, Some(runningTotalSql)),
    Q("rollup_sales", rollupSales, Some(rollupSalesSql)),
    Q("distinct_count", distinctCount, Some(distinctCountSql)),
    Q("approx_distinct", approxDistinct, Some(approxDistinctSql)),
    Q("pivot_sales", pivotSales, Some(pivotSalesSql)),
    Q("approx_quantiles", approxQuantiles, Some(approxQuantilesSql)),
    Q("salted_join", saltedJoinQ, Some(saltedJoinSql)),
    Q("stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    Q("q17_small_quantity", q17SmallQuantity, Some(q17SmallQuantitySql)),
    Q("cube_sales", cubeSales, Some(cubeSalesSql)),
    Q("window_moving_avg", windowMovingAvg, Some(windowMovingAvgSql)),
    Q("table_stats", tableStats, Some(tableStatsSql)),
    Q("incremental_distinct", incrementalDistinct, Some(incrementalDistinctSql)),
    Q("quantile_sketch", quantileSketch, Some(quantileSketchSql)),
    Q("countmin_sketch", countminSketch, Some(countminSketchSql)),
    Q("bloom_membership", bloomMembership, Some(bloomMembershipSql)),
    Q("dq_audit", dqAudit, Some(dqAuditSql)),
    Q("skew_report", skewReport, Some(skewReportSql)),
    Q("q21_late_supplier", q21LateSupplier, Some(q21LateSupplierSql)),
    Q("window_trailing_30d", windowTrailing30d, Some(windowTrailing30dSql)),
    Q("graph_pagerank", graphPagerank, Some(graphPagerankSql)),
    Q("stats_corr", statsCorr, Some(statsCorrSql)))
}
