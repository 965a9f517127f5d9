package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the standing ANN index — the arrival path of
  * the IVF lifecycle ([[graft.ops.Ivf.refreshIndex]]) as a continuous
  * pipeline instead of a scheduled batch: each micro-batch of new vectors
  * is absorbed by [[graft.ops.Ivf.appendToIndex]] — assigned to the FROZEN
  * centroids (a broadcast of the tiny centroid table against the batch)
  * and blind-appended to the assigned lists' directories. Per-batch cost
  * is batch-sized; the standing lists never rewrite; no streaming state.
  *
  * The division of labor is deliberate: the STREAM only feeds the index
  * (cheap, per-arrival); the drift decision and re-fit/compaction stay a
  * scheduled [[graft.ops.Ivf.refreshIndex]] batch job — a re-fit inside a
  * micro-batch would stall the stream for an index-sized rebuild.
  *
  * Replay caveat (the Count-Min/Misra-Gries posture, not the HLL one):
  * appends are at-least-once — a re-delivered batch appends its vectors
  * again, and a duplicated vector occupies TWO top-k slots in any search
  * whose probe reaches it (displacing the k-th distinct neighbor), while
  * list sizes and drift statistics count the replayed stream. Feed
  * through [[EventsCdc.dedupStream]]-style upstream dedup or an
  * exactly-once source; [[graft.ops.Ivf.appendToIndex]]'s caller
  * contract (arrival vec_ids are new) is this pipeline's contract too. */
object IndexMaintenance {

  /** Launch the continuous index-append pipeline over a file-arrival
    * vector stream (each new parquet file = one arrival batch). */
  def runIvfAppend(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                   indexDir: String, checkpointDir: String,
                   maxFilesPerTrigger: Int = 0,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    EventsCdc.readEventStream(spark, srcDir, schemaFrom, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Ivf.appendToIndex(spark, indexDir, batch)
        ()
      }
      .start()
}
