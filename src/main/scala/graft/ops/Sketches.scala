package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollup tables — the incremental-statistics pattern a
  * 100 TB warehouse runs instead of rescanning history: each load builds a
  * tiny sketch row per partition (day, shard, source), and any later
  * question over any partition subset is answered by MERGING sketches —
  * never by touching the underlying data again. Distinct counts use the
  * Apache DataSketches HLL aggregates built into Spark
  * (`hll_sketch_agg` / `hll_union_agg`, SPARK-16484): unlike
  * `count(DISTINCT)`, the sketch state is a few KB, mergeable in any
  * order, and persistable as a binary column.
  *
  * The estimate error is ~1.04/√(2^lgK) relative standard deviation —
  * lgK=14 ⇒ ~0.8% RSD, so a ±5% acceptance bound is >6σ.
  */
object Sketches {

  /** One sketch row per bucket: (bucket, n_rows, exact_n — kept for
    * verification/backfill audits — and the mergeable HLL sketch of
    * `key`). This is the table a pipeline PERSISTS per load. */
  def distinctSketch(df: DataFrame, bucket: Column, key: Column,
                     lgK: Int = 14): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
           hll_sketch_agg(key, lgK).as("sketch"))

  /** Merge a sketch-table subset to a single distinct estimate — the
    * incremental read path: cost ∝ number of buckets, not data size. */
  def mergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      sum(col("n_rows")).as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("sketch"), allowDifferentLgConfigK = false))
        .as("distinct_estimate"))

  /** Heavy-hitters sketch table — one row per (bucket, shard) holding the
    * serialized ≤ k-counter Misra-Gries summary of `item` plus the shard's
    * total item weight ([[graft.functions.MisraGries]]). This is the table
    * a pipeline PERSISTS per load shard, the heavy-hitter twin of
    * [[distinctSketch]]: each row is KBs regardless of shard size, and the
    * partial/shuffle state behind it is O(k) everywhere. */
  def heavyHitterSketch(df: DataFrame, bucket: Column, shard: Column,
                        item: Column, k: Int = 64): DataFrame =
    df.groupBy(bucket.as("bucket"), shard.as("shard"))
      .agg(graft.functions.MisraGries.mgSketchAgg(item, k).as("sketch"),
           count(item).as("n_items"))

  /** Merge a sketch-table subset per bucket — the incremental read path
    * (cost ∝ sketch rows, never data size): merged counters decoded to
    * (item, count_est) rows with the bucket's total weight, against which
    * the Misra-Gries bound f − n/(k+1) ≤ ĉ ≤ f is checkable. */
  def heavyHittersMerged(sketches: DataFrame, k: Int = 64): DataFrame =
    sketches.groupBy(col("bucket"))
      .agg(graft.functions.MisraGries.mgMergeAgg(col("sketch"), k).as("items"),
           sum(col("n_items")).as("n_bucket"))
      .select(col("bucket"), col("n_bucket"), explode(col("items")).as("it"))
      .select(col("bucket"), col("n_bucket"),
        col("it.item").as("item"), col("it.count_est").as("count_est"))
}
