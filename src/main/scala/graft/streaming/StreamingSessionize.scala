package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the custom-state twin of the batch
  * `graft.ops.Events.sessionize` (same session numbering, same exact
  * decimal value sums), built on `flatMapGroupsWithState`: per-user state
  * holds the one open session; each micro-batch's events extend it or close
  * it (a gap > `gapUs` starts the next session), and CLOSED sessions are
  * emitted append-style. The final open session per user stays in state —
  * it is not knowably complete until more data (or a timeout policy) says
  * so.
  *
  * State size is O(users), independent of stream length; event-time
  * watermarking bounds late data before the stateful operator.
  */
object StreamingSessionize {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class Session(
      user_id: Long, session_id: Long,
      session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  /** The open session per user: bounds, count, and an exact decimal value
    * sum (scale 6, HALF_UP — the same rounding Spark's cast(double as
    * decimal(38,6)) applies, so emitted sums are bit-equal to the batch
    * operator's `Exact.dsum`). */
  final case class OpenSession(
      sessionId: Long, startUs: Long, endUs: Long, n: Long, sum: BigDecimal)

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def dec(v: Double): BigDecimal =
    BigDecimal.decimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def close(userId: Long, s: OpenSession): Session =
    Session(userId, s.sessionId, s.startUs, s.endUs, s.n, s.sum.toDouble)

  private def step(gapUs: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[OpenSession])
      : Iterator[Session] = {
    // micro-batch iterators carry no ordering guarantee — restore event time
    // order (same tiebreak as the batch window: ts, then event_id)
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val out = scala.collection.mutable.ListBuffer.empty[Session]
    var open = state.getOption
    sorted.foreach { e =>
      val t = micros(e.ts)
      open match {
        case Some(s) if t - s.endUs <= gapUs =>
          open = Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1,
                             sum = s.sum + dec(e.value)))
        case Some(s) =>
          out += close(userId, s)
          open = Some(OpenSession(s.sessionId + 1, t, t, 1, dec(e.value)))
        case None =>
          open = Some(OpenSession(1, t, t, 1, dec(e.value)))
      }
    }
    open.foreach(state.update)
    out.iterator
  }

  /** Closed sessions of the event stream (append mode; schema matches the
    * batch operator's output). */
  def sessions(events: DataFrame, gapUs: Long = 30L * 60 * 1000000,
               delay: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step(gapUs))
  }
}
