package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming marketing attribution — the custom-state twin of the batch
  * `graft.ops.Events.attributionBase` (trailing `windowUs` touch window
  * per user, at-or-before range semantics, deterministic first/last touch
  * via the same zero-padded lexicographic key), built on
  * `flatMapGroupsWithState` the way [[StreamingFunnel]] is.
  *
  * Per-user state is BOUNDED: the trailing-window touch buffer (touches
  * older than `windowUs` before every frame that can still be served are
  * evicted each batch) plus the user's not-yet-final conversions — never
  * the stream. Total state is O(users · touches-per-window), independent
  * of stream length, exactly the bound the batch range window implies.
  *
  * Emission discipline: the batch frame for a conversion at `t` includes
  * every touch with `us` in `[t - windowUs, t]` — including a touch that
  * SHARES the conversion's timestamp but sorts after it, which an
  * in-order stream may deliver in a LATER micro-batch. A conversion is
  * therefore held in state until its frame is PROVABLY complete, by
  * either of two proofs: (a) the user has seen an event with `us > t`
  * (in-order streams deliver ascending `(ts, event_id)`, so a
  * strictly-later same-user event proves every `us <= t` touch has
  * arrived), or (b) the WATERMARK has passed `t` — any remaining
  * `us <= t` touch would be later than `delay` behind the stream and is
  * contractually late. Proof (b) rides an event-time timeout (wake on
  * each watermark advance while conversions are withheld), so `delay`
  * genuinely bounds emission latency: a user whose final event is a
  * conversion flushes ~`delay` after the stream passes it, not never.
  * Each conversion is emitted exactly once, with exactly the batch
  * frame. The tail consequence mirrors [[StreamingSessionize]]'s
  * still-open session, now shrunk to the watermark fringe: only
  * conversions at a user's maximum seen timestamp AND within `delay` of
  * the stream's final watermark stay pending when the data ends —
  * everything else must equal the batch operator row-for-row, which is
  * what the spec pins.
  */
object StreamingAttribution {

  final case class AEv(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, event_type: String,
                       value: Double)

  /** One buffered touch (encoder-visible: state classes must be public
    * for the codegen'd state serializer). */
  final case class Touch(us: Long, event_id: Long, event_type: String)

  /** A conversion awaiting its `us > t` finalization proof. */
  final case class PendingConv(us: Long, event_id: Long, value: Double)

  /** `max_us` is the user's finalization frontier — the largest event
    * timestamp seen across ALL their events (any type; an event of an
    * attribution-irrelevant type still proves global arrival up to its
    * us), persisted so a proof seen in one batch is not forgotten by the
    * next. */
  final case class AttrState(touches: Seq[Touch], pending: Seq[PendingConv],
                             max_us: Long)

  /** One attributed conversion — the batch row with the per-type counts
    * carried as a map (the batch operator's n_<type> columns, keyed by
    * type). */
  final case class Attribution(user_id: Long, event_id: Long, us: Long,
                               value: Double,
                               first_key: Option[String],
                               last_key: Option[String],
                               n_by_type: Map[String, Long],
                               n_touches: Long)

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** The batch operator's lexicographic touch key, verbatim: zero-padded
    * us ++ zero-padded event_id ++ type — a total order both the window
    * min/max and this buffer compare identically (non-negative us/ids
    * only, guarded below exactly like the batch side). */
  private def key(t: Touch): String = f"${t.us}%020d${t.event_id}%012d${t.event_type}"

  private def step(touchTypes: Seq[String], convType: String, windowUs: Long)(
      userId: Long, events: Iterator[AEv], state: GroupState[AttrState])
      : Iterator[Attribution] = {
    val relevant = (touchTypes :+ convType).toSet
    val evs = events.toSeq
    // NULL-ts discipline BEFORE any sort touches micros (r13 ADVICE): a
    // relevant-type row with NULL ts/event_id raises the descriptive
    // batch-guard message; an attribution-IRRELEVANT NULL-ts row passes
    // through harmlessly (it is neither touch, conversion, nor frontier
    // proof) — mirroring attributionBase's nullOther tolerance instead
    // of dying in sortBy with a raw NullPointerException.
    evs.foreach { e =>
      if (relevant(e.event_type))
        require(e.ts != null && micros(e.ts) >= 0 && e.event_id >= 0,
          s"StreamingAttribution: NULL/negative ts or event_id on a " +
            s"${e.event_type} row (us=${Option(e.ts).map(micros)}, " +
            s"event_id=${e.event_id}) — the touch key and window require " +
            "non-NULL, non-negative values (the batch guard, streamed)")
    }
    val sorted = evs.filter(_.ts != null).sortBy(e => (micros(e.ts), e.event_id))
    val prev = state.getOption.getOrElse(
      AttrState(Seq.empty, Seq.empty, Long.MinValue))
    val touches = (prev.touches ++ sorted
      .filter(e => touchTypes.contains(e.event_type))
      .map(e => Touch(micros(e.ts), e.event_id, e.event_type)))
      .sortBy(t => (t.us, t.event_id))
    val convs = prev.pending ++ sorted.filter(_.event_type == convType)
      .map(e => PendingConv(micros(e.ts), e.event_id, e.value))
    // the finalization frontier, two proofs (either suffices):
    //   - per-user: every event (any type) seen for this user proves
    //     global arrival up to its us (in-order streams)
    //   - watermark: events older than the watermark are contractually
    //     late — a conversion strictly below it will never gain another
    //     frame touch the stream admits, so its frame is complete. This
    //     is what makes `delay` bound emission latency (r13 ADVICE): a
    //     user whose FINAL event is a conversion flushes once the
    //     watermark passes it, instead of being withheld forever waiting
    //     for a strictly-later same-user event.
    val maxUs = sorted.map(e => micros(e.ts))
      .foldLeft(prev.max_us)(_ max _)
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val frontier = maxUs max wmUs
    val (ready, pending) = convs.partition(_.us < frontier)
    val out = ready.sortBy(c => (c.us, c.event_id)).map { c =>
      val frame = touches.filter(t => t.us >= c.us - windowUs && t.us <= c.us)
      val keys = frame.map(key)
      Attribution(userId, c.event_id, c.us, c.value,
        if (keys.isEmpty) None else Some(keys.min),
        if (keys.isEmpty) None else Some(keys.max),
        touchTypes.map(tt => tt -> frame.count(_.event_type == tt).toLong).toMap,
        frame.size.toLong)
    }
    // bounded eviction: no servable frame (pending now, or any future
    // conversion, which per-user in-order arrival puts at us >= maxUs)
    // reaches below min(maxUs, pending us) - windowUs. Deliberately keyed
    // on maxUs, NOT the watermark frontier: a lagging user may still
    // deliver a conversion at us in [maxUs, wm) whose frame reaches back
    // to us - windowUs < wm - windowUs.
    val floor = (maxUs +: pending.map(_.us)).min - windowUs
    val kept = touches.filter(_.us >= floor)
    if (kept.nonEmpty || pending.nonEmpty || maxUs > Long.MinValue) {
      state.update(AttrState(kept, pending, maxUs))
      // wake on the next watermark advance while conversions are
      // withheld, so frontier conversions flush via the watermark proof
      // even if no further event for this user ever arrives
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
    } else if (state.exists) state.remove()
    out.iterator
  }

  /** Attributed conversions of the event stream (append mode): one row
    * per conversion, emitted in the first micro-batch that proves its
    * trailing touch frame complete. */
  def attribution(events: DataFrame,
                  touchTypes: Seq[String] = Seq("view", "click"),
                  convType: String = "purchase",
                  windowUs: Long = 7L * 86400000000L,
                  delay: String = "2 hours"): Dataset[Attribution] = {
    require(touchTypes.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .as[AEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        step(touchTypes, convType, windowUs))
  }
}
