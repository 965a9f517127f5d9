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
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

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

  val registry: Seq[Q] = Seq(
    Q("q1_pricing_summary", q1PricingSummary, Some(q1PricingSummarySql)),
    Q("q6_forecast_revenue", q6ForecastRevenue, Some(q6ForecastRevenueSql)))
}
