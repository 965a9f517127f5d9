package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-transition extraction — the custom-state twin of the
  * batch `graft.ops.Events.transitions` lead-window: each micro-batch
  * emits one row per consecutive (from_type → to_type) event pair in a
  * user's timeline, INCLUDING the pair that straddles the batch boundary
  * (the batch lead window sees it; a stateless per-batch window would
  * not). Per-user state is the single last-seen event — O(users) total,
  * independent of stream length — making this the cheapest member of the
  * `flatMapGroupsWithState` family ([[StreamingSessionize]],
  * [[StreamingFunnel]]).
  *
  * Downstream, the transition rows aggregate to the same (from, to)
  * counts the batch operator produces (the spec pins exactly that over
  * in-order micro-batches); in production the aggregation is the
  * streaming sketch-table pattern — blind-append per-batch partial
  * counts, merged at read.
  */
object StreamingTransitions {

  final case class TEv(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, event_type: String)

  /** One consecutive event pair in a user's timeline; ts_us is the
    * DESTINATION event's timestamp (micros). */
  final case class Transition(user_id: Long, from_type: String,
                              to_type: String, ts_us: Long)

  /** Last event seen per user (encoder-visible for the state serializer). */
  final case class LastEvent(ts_us: Long, event_id: Long, event_type: String)

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def step(userId: Long, events: Iterator[TEv],
                   state: GroupState[LastEvent]): Iterator[Transition] = {
    // micro-batch iterators carry no ordering guarantee — restore event
    // time order (ts, then event_id — the batch operator's tiebreak)
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val before = state.getOption
    var last = before
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      val ts = micros(e.ts)
      last match {
        // the boundary guard compares the FULL (ts, event_id) tuple, not
        // just ts: an equal-timestamp event whose id sorts BEFORE the
        // stored last (or a redelivery of the last event itself) arrived
        // out of order across the batch boundary — emitting last→e would
        // INVERT the batch lead-window's pair, so such events are
        // dropped (with watermarked in-order sources this cannot occur;
        // under at-least-once redelivery it is the safe behavior)
        case Some(l) if ts < l.ts_us ||
            (ts == l.ts_us && e.event_id <= l.event_id) => ()
        case _ =>
          last.foreach(l =>
            out += Transition(userId, l.event_type, e.event_type, ts))
          last = Some(LastEvent(ts, e.event_id, e.event_type))
      }
    }
    if (last != before) last.foreach(state.update)
    out.result().iterator
  }

  /** Transition rows of the event stream (append mode). */
  def transitions(events: DataFrame, delay: String = "2 hours"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[TEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
  }
}
