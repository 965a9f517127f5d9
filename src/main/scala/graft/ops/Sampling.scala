package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based `df.sample` is irreproducible across retries/replans (task
  * reruns reseed) — a dataset build wants the SAME sample every run, from
  * any engine. So the sampling decision is a pure function of the row's id:
  * a portable hash bucket in [0, 100) compared to the stratum's rate. The
  * filter is a map-side predicate — no shuffle, no state; at 100 TB it runs
  * at scan speed and composes with partition pruning.
  *
  * The bucket uses the md5-prefix trick shared with the dedup oracles
  * (15 hex chars → 60-bit non-negative int), so any SQL engine reproduces
  * the exact sample membership (xxhash64 would be Spark-only).
  */
object Sampling {

  /** Portable per-row bucket in [0, 100): md5 of the id's decimal string. */
  def bucket(idCol: Column): Column =
    pmod(conv(substring(md5(idCol.cast("string").cast("binary")), 1, 15), 16, 10)
           .cast("long"), lit(100L)).cast("int")

  /** Keep each row iff bucket(id) < rate(stratum), with per-stratum percent
    * rates — e.g. oversample rare/high-quality strata, downsample bulk.
    * Rows keep a `sample_bucket` column so downstream splits (train/val =
    * bucket ranges) stay consistent with the sampling decision. */
  def stratified(df: DataFrame, stratumCol: Column, idCol: Column,
                 rates: Map[String, Int], defaultRate: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(stratumCol === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("sample_bucket", bucket(idCol))
      .filter(col("sample_bucket") < rate)
  }
}
