package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Idempotent micro-batch state appends for every foreachBatch sink that
  * maintains an additive parquet state table (feature partials, experiment
  * moments, sketch rows, dedup pairs, quality reports).
  *
  * The hazard this closes is ENGINE-retry duplication, which is distinct
  * from the documented at-least-once-source caveat: Spark's micro-batch
  * engine re-runs a failed batch under the SAME batchId, so a blind
  * `.mode("append")` after a partial or complete write appends the same
  * partials again and additive readers silently double-count. Since every
  * such sink already stamps `batch_id` on each row, the fix is structural:
  * write each batch as its own `batch_id=` partition with dynamic
  * partition overwrite — a retry lands on the same partition and REPLACES
  * its own output. Redelivery from an at-least-once SOURCE arrives under a
  * NEW batchId and still appends; that caveat stays with the operators
  * (dedupe upstream via [[EventsCdc.dedupStream]] or use an exactly-once
  * source), documented per sink.
  *
  * Read-path note: `batch_id` becomes a partition column, so partition
  * pruning makes batch-ranged reads (drain, replay audit) metadata-only;
  * readers that merge state ignore it or drop it as before.
  */
object StateSink {

  /** Write one micro-batch's rows into `dir` under its own `idCol`
    * partition, overwriting that partition only. Tags the rows with
    * `batchId` unless the frame already carries `idCol` (e.g. the
    * Misra-Gries sketch's `shard` column). */
  def appendIdempotent(df: DataFrame, batchId: Long, dir: String,
                       idCol: String = "batch_id"): Unit = {
    val tagged =
      if (df.columns.contains(idCol)) df
      else df.withColumn(idCol, lit(batchId))
    tagged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(idCol)
      .parquet(dir)
  }
}
