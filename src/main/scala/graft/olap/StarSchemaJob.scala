package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{FileFormats, Tables}

/** Full-sync orchestration — the Spark form of the reference's
  * `sync_all` / `sync_oltp_to_olap()` (sync_oltp_to_olap.py:337-345,
  * 352-414): build every dimension, then the fact, and write the whole star
  * to a parquet OLAP area through the [[graft.sources.FileFormats]] sinks
  * (dims single-file, fact partitioned by date_key and sorted within
  * partitions on the natural key).
  *
  * This is the entry point a user of the reference runs first; downstream
  * queries read the written star back (partition-pruned on date_key,
  * broadcast-joining the dims).
  */
object StarSchemaJob {

  /** One built (not yet written) star. */
  final case class Star(
      dimDate: DataFrame,
      dimCustomer: DataFrame,
      dimPart: DataFrame,
      dimCategory: DataFrame,
      dimSupplier: DataFrame,
      dimPriority: DataFrame,
      dimShipmode: DataFrame,
      factSales: DataFrame) {
    def dims: Map[String, DataFrame] = Map(
      "dim_date" -> dimDate,
      "dim_customer" -> dimCustomer,
      "dim_part" -> dimPart,
      "dim_category" -> dimCategory,
      "dim_supplier" -> dimSupplier,
      "dim_priority" -> dimPriority,
      "dim_shipmode" -> dimShipmode)
  }

  /** Build every dimension + the fact from the OLTP-side tables in `dir`.
    * Each member is one declarative plan; nothing is computed until
    * written/consumed. */
  def build(spark: SparkSession, dir: String): Star = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val customer = Tables.customer(spark, dir)
    Star(
      dimDate = StarSchema.dimDate(orders, "o_orderdate"),
      dimCustomer = StarSchema.dimCustomer(customer, nation, region, orders),
      dimPart = StarSchema.dimPart(part),
      dimCategory = StarSchema.dimCategory(part),
      dimSupplier = StarSchema.dimSupplier(supplier, nation, region),
      dimPriority = StarSchema.surrogateDenseRank(
        orders, Seq("o_orderpriority"), "priority_sk"),
      dimShipmode = StarSchema.surrogateDenseRank(
        lineitem, Seq("l_returnflag", "l_linestatus"), "shipmode_sk"),
      factSales = StarSchema.factSales(lineitem, orders, part, supplier))
  }

  /** Build and write the full star under `outDir` (`outDir/dim_*`,
    * `outDir/fact_sales`). Dims first, fact last — same ordering contract as
    * the reference (FK targets exist before the fact lands). The dim writes
    * are independent Spark jobs, so they are submitted concurrently
    * (driver threads; the scheduler interleaves their stages across the
    * cluster instead of running seven small jobs back-to-back).
    *
    * `largeDims` declares the size tier per dim (name → join key): a dim
    * listed there is NOT broadcastable-small (the 100 TB deployment's
    * customer dim mirrors a billions-of-rows OLTP table), so it is written
    * through the bucketed sink on its join key — multi-file, and
    * join-co-located with any fact copy bucketed the same way (SMJ with
    * zero exchanges; SourcesSpec asserts the plan) — instead of the
    * single-file broadcast posture.
    *
    * `factGranularity` passes through to [[FileFormats.writeFact]]: `"day"`
    * (default) is the 100 TB layout; `"month"` is the documented
    * small-scale layout (see writeFact's scaladoc for the crossover). */
  def run(spark: SparkSession, srcDir: String, outDir: String,
          largeDims: Map[String, String] = Map.empty,
          buckets: Int = 32,
          factGranularity: String = "day"): Star = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val star = build(spark, srcDir)
    val dimWrites = star.dims.toSeq.map { case (name, df) =>
      Future(largeDims.get(name) match {
        case Some(key) =>
          FileFormats.writeBucketed(df, s"star_$name", s"$outDir/$name", key, buckets)
        case None => FileFormats.writeDim(df, s"$outDir/$name")
      })
    }
    Await.result(Future.sequence(dimWrites), Duration.Inf)
    FileFormats.writeFact(star.factSales, s"$outDir/fact_sales",
      granularity = factGranularity)
    star
  }

  /** Sync-status report over a written star — the library form of the
    * reference's health endpoint (main.py reports per-table row counts):
    * one row per star table with its current count. Parquet count() is
    * metadata-only (footer row counts), so this is cheap even on a 100 TB
    * star. */
  def status(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val tables = Seq("dim_date", "dim_customer", "dim_part", "dim_category",
      "dim_supplier", "dim_priority", "dim_shipmode", "fact_sales")
    tables.map { t =>
      val n = try spark.read.parquet(s"$outDir/$t").count() catch {
        case _: org.apache.spark.sql.AnalysisException => -1L
      }
      (t, n)
    }.toDF("table_name", "n_rows")
  }

  /** Targeted incremental re-sync — the worker's per-record path
    * (worker_sync.py:94-108, sync_oltp_to_olap.py:367-404) at partition
    * grain: rebuild ONLY the fact slices whose customers changed and
    * overwrite JUST those date partitions in place (dynamic partition
    * overwrite — untouched partitions keep their files; a full-table
    * overwrite at 100 TB for a handful of changed orders would be absurd).
    *
    * The changed-key set is tiny → broadcast semijoin prunes the rebuild to
    * matching orders before the fact joins run.
    *
    * @return the number of fact rows rewritten
    */
  def syncIncremental(spark: SparkSession, srcDir: String, outDir: String,
                      changedCustKeys: DataFrame): Long = {
    val orders = Tables.orders(spark, srcDir)
    // partition-grain rebuild: a date partition is rewritten WHOLE (all
    // customers on that date), or not at all — overwriting a partition with
    // only the changed customers' rows would silently drop everyone else's
    val changedDates = orders
      .join(broadcast(changedCustKeys.select(col("user_id"))),
            col("o_custkey") === col("user_id"), "left_semi")
      .select(to_date(col("o_orderdate")).as("changed_date")).distinct()
    val ordersOnDates = orders
      .join(broadcast(changedDates),
            to_date(col("o_orderdate")) === col("changed_date"), "left_semi")
    val slice = StarSchema.factSales(
      Tables.lineitem(spark, srcDir), ordersOnDates,
      Tables.part(spark, srcDir), Tables.supplier(spark, srcDir))
    // schema-evolution gate: a partition-grain overwrite lands new files
    // NEXT TO standing ones, so a narrowed/retyped slice would silently
    // fork the directory's schema — refuse it before any partition is
    // replaced (a widened slice is fine: old partitions read the new
    // column as NULL through FileFormats.readEvolved)
    FileFormats.standingSchema(spark, s"$outDir/fact_sales").foreach { s0 =>
      graft.sources.SchemaEvolution.requireEvolvable(
        org.apache.spark.sql.types.StructType(
          s0.fields.filterNot(_.name == "month_key")),
        slice.schema, s"syncIncremental($outDir/fact_sales)")
    }
    // row count comes from an observe() metric on the write itself — a
    // separate count() action would run the whole semijoin+star-join twice
    val obs = org.apache.spark.sql.Observation("incremental_sync")
    slice
      .observe(obs, count(lit(1)).as("n_rows"))
      .repartition(col("date_key"))
      .sortWithinPartitions(col("date_key"), col("l_orderkey"), col("l_linenumber"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date_key")
      .parquet(s"$outDir/fact_sales")
    obs.get("n_rows").asInstanceOf[Long]
  }
}
