package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** A named engine query: the Spark plan plus (when SQL-expressible) the ANSI
  * SQL a DuckDB oracle runs over the same parquet tables. Output column names
  * must match the oracle's exactly (the driver sorts columns by name before
  * hashing values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Exact-arithmetic aggregate helpers.
  *
  * Floating sums are order-dependent, and Spark and DuckDB reduce in
  * different orders — so every money/measure aggregate accumulates in
  * DECIMAL(38,6) (exact, associative) and only the final value is cast to
  * double. Per-row double arithmetic (a*b) is IEEE-deterministic and
  * identical across engines, so products may be computed in double before
  * the decimal cast. The same shape is used in the oracle SQL:
  * CAST(SUM(CAST(expr AS DECIMAL(38,6))) AS DOUBLE).
  */
object Exact {
  private val D = DataTypes.createDecimalType(38, 6)

  /** Exact sum, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact average (sum/count over non-nulls), returned as double. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** Oracle-side SQL for dsum. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side SQL for davg. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,6))) AS DOUBLE) / COUNT($expr)"
}
