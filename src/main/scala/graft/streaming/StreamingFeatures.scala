package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous online-feature maintenance — the streaming twin of
  * [[graft.ops.Features.decayWeighted]]'s serving path: every micro-batch
  * reduces its arrivals to per-(key, day) partial rows
  * ([[graft.ops.Features.dayPartials]] — at most one row per key×day per
  * batch, regardless of batch size) and APPENDS them to the feature state
  * table. Blind deterministic appends: no streaming state, no
  * read-modify-write, so maintenance cost is O(batch) and the state table
  * is O(keys × days). Serving ([[graft.ops.Features.serveFeatures]])
  * merges partials by addition/max and computes count / exact sum /
  * recency / hyperbolic decay at ANY midnight as-of from state alone —
  * the moving-as-of serving the fixed-as-of batch operator cannot give
  * without rescanning history.
  *
  * Replay caveat (the CM/MG one, not the HLL/Bloom one): counts and sums
  * add, so an at-least-once source that redelivers a batch appends its
  * exact partials again and served features describe the REPLAYED stream.
  * Exactness over the logical stream needs upstream
  * [[EventsCdc.dedupStream]] or an exactly-once source — spec-pinned, not
  * assumed. ENGINE retries (same batchId re-run after a failure) are a
  * different hazard and ARE handled: both sinks write through
  * [[StateSink.appendIdempotent]], so a re-run batch replaces its own
  * partition instead of double-appending.
  */
object StreamingFeatures {

  /** Launch feature-partial maintenance over a file-arrival stream.
    * `stream` must carry (k, t_us, value) — pre-project upstream. */
  def runFeatureMaintenance(stream: DataFrame, stateDir: String,
                            checkpointDir: String,
                            trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Features.dayPartials(batch.select("k", "t_us", "value")),
          batchId, stateDir)
        ()
      }
      .start()

  /** Continuous experiment monitoring — the streaming twin of
    * `ab_test_zscore`: every micro-batch reduces its arrivals to
    * per-(key, arm) moment partials ([[graft.ops.Experiments.armMoments]]
    * — at most 2 rows per experiment key per batch) and blind-appends
    * them; the dashboard read
    * ([[graft.ops.Experiments.zFromMoments]] over
    * [[graft.ops.Experiments.mergeMoments]]) answers current counts,
    * means, Welch z, and SRM chi² from state alone. Because the moments
    * are DECIMAL and merge by addition, the served z equals the batch
    * operator's over everything arrived EXACTLY — not approximately
    * (spec-pinned). Same replay caveat as the other additive state
    * tables: a redelivered batch counts again; dedupe upstream or use an
    * exactly-once source. `stream` must carry (key, arm, value). */
  def runAbMaintenance(stream: DataFrame, stateDir: String,
                       checkpointDir: String,
                       trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Experiments.armMoments(batch.select("key", "arm", "value")),
          batchId, stateDir)
        ()
      }
      .start()
}
