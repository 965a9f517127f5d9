package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the custom-state twin of the batch
  * `graft.ops.Events.funnel` (same strict-sequence semantics: the first
  * step-1 event, then the first step-2 event strictly after it, and so
  * on), built on `flatMapGroupsWithState` the way
  * [[StreamingSessionize]] is: per-user state is the list of completed
  * step timestamps (≤ `steps.size` longs — O(users·k) total state,
  * independent of stream length), and a user's current funnel row is
  * re-emitted whenever a micro-batch ADVANCES their stage. The latest
  * emitted row per user is therefore always the batch answer over the
  * prefix seen so far — what the spec pins against `Events.funnel` on
  * in-order micro-batches.
  *
  * In-order greedy advancement IS the batch semantics: processing events
  * in (ts, event_id) order, the first next-step event with ts strictly
  * after the previous step's timestamp is exactly the `min(ts)`-per-step
  * chain the batch aggregate computes. Events for steps the user has not
  * reached (or has already passed) update nothing and add no state.
  */
object StreamingFunnel {

  final case class FEv(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, event_type: String)

  /** Snapshot of a user's funnel progress: timestamps (epoch micros) of
    * each completed step in order, and stage = how many completed. */
  final case class FunnelProgress(user_id: Long, step_ts_us: Seq[Long], stage: Int)

  /** Completed step timestamps, in order (encoder-visible: state classes
    * must be public for the codegen'd state serializer). */
  final case class FunnelState(done: Seq[Long])

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def step(steps: Seq[String])(
      userId: Long, events: Iterator[FEv], state: GroupState[FunnelState])
      : Iterator[FunnelProgress] = {
    // micro-batch iterators carry no ordering guarantee — restore event
    // time order (ts, then event_id — the batch operator's tiebreak)
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var done = state.getOption.map(_.done).getOrElse(Seq.empty)
    val before = done.size
    sorted.foreach { e =>
      if (done.size < steps.size && e.event_type == steps(done.size) &&
          (done.isEmpty || micros(e.ts) > done.last))
        done = done :+ micros(e.ts)
    }
    if (done.size > before) {
      state.update(FunnelState(done))
      Iterator.single(FunnelProgress(userId, done, done.size))
    } else Iterator.empty
  }

  /** Funnel-progress updates of the event stream (append mode): one row
    * per (user, micro-batch) in which the user's stage advanced; the
    * latest row per user is their current funnel standing. */
  def progress(events: DataFrame, steps: Seq[String],
               delay: String = "2 hours"): Dataset[FunnelProgress] = {
    require(steps.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step(steps))
  }
}
