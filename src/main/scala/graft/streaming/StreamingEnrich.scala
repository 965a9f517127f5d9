package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous as-of enrichment of an event-arrival stream against a
  * standing reference table — the streaming twin of the native
  * [[graft.plans.AsOfJoin]] operator (the worker-loop behavior of the
  * reference's per-arrival enrichment, re-expressed per micro-batch).
  *
  * Per micro-batch the arrived rows join the CURRENT reference snapshot
  * through the custom merge operator and append to the enriched store.
  * The reference is re-read per batch, so a slowly-changing reference
  * (e.g. an SCD1 dimension maintained by [[EventsCdc]]) is picked up at
  * batch granularity. Because enrichment is per-row against a reference
  * frozen per batch, there is no streaming state, and the concatenated
  * output over any run equals the batch as-of join of everything that
  * arrived against the final reference — spec-pinned for a static
  * reference; under a mutating reference each batch is enriched against
  * the snapshot current AT ARRIVAL, which is the worker-loop semantics
  * (an enrichment-time lookup, not a retroactive one).
  *
  * Replay caveat: blind appends — dedupe upstream
  * ([[EventsCdc.dedupStream]]) or use an exactly-once source.
  */
object StreamingEnrich {

  /** Launch the continuous as-of enrichment over a file-arrival stream
    * (each new parquet file = one arrival batch).
    *
    * @param refSnapshot called once per batch to obtain the current
    *                    reference frame (right side, unique per
    *                    (key, time) — the [[graft.plans.AsOfJoin]]
    *                    caller contract)
    */
  def runAsofEnrich(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                    refSnapshot: () => DataFrame, key: String, timeUs: String,
                    valueCols: Seq[String], outDir: String,
                    checkpointDir: String, maxFilesPerTrigger: Int = 0,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    EventsCdc.readEventStream(spark, srcDir, schemaFrom, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.plans.AsOfJoin(batch, refSnapshot(), key, timeUs, valueCols)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
