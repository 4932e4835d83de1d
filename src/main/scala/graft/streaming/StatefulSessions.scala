package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** Streaming sessionization with custom state
  * (`flatMapGroupsWithState`): the streaming counterpart of
  * [[graft.operators.AsOf.sessionize]].
  *
  * Per user, events accumulate into an open session held in group state;
  * when the event-time watermark passes the session's last event by the
  * gap, the processing-time timeout fires and the closed session is
  * emitted. State per key is O(1) (the open session's bounds only), so
  * state size is bounded by |active users|, not |events| — the property
  * that matters at 100 TB/day event volumes.
  */
object StatefulSessions {

  case class Event(user_id: Long, event_id: Long, tsMicros: Long)

  /** Wire row: `ts` must stay a TimestampType column (not pre-converted
    * to micros) so the watermark metadata on the attribute survives the
    * projection into the typed stream — flatMapGroupsWithState's
    * event-time timeout requires a watermarked input column.
    */
  case class EventRow(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  case class OpenSession(startMicros: Long, endMicros: Long, nEvents: Long)

  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Fold a batch of events for one user into sessions; emit every
    * session that is definitely closed (a later event arrived more than
    * `gapMicros` after it), keep the still-open one in state.
    *
    * Pure function → unit-testable without a streaming query; the
    * streaming wrapper below feeds it from flatMapGroupsWithState.
    */
  def foldEvents(userId: Long, sorted: Seq[Event], open: Option[OpenSession],
                 gapMicros: Long): (Seq[ClosedSession], Option[OpenSession]) = {
    var current = open
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      current match {
        case Some(s) if e.tsMicros - s.endMicros <= gapMicros =>
          current = Some(s.copy(
            endMicros = math.max(s.endMicros, e.tsMicros),
            nEvents = s.nEvents + 1))
        case Some(s) =>
          closed += toClosed(userId, s)
          current = Some(OpenSession(e.tsMicros, e.tsMicros, 1L))
        case None =>
          current = Some(OpenSession(e.tsMicros, e.tsMicros, 1L))
      }
    }
    (closed.result(), current)
  }

  private def toClosed(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId,
      new java.sql.Timestamp(s.startMicros / 1000).tap(_.setNanos(((s.startMicros % 1000000) * 1000).toInt)),
      new java.sql.Timestamp(s.endMicros / 1000).tap(_.setNanos(((s.endMicros % 1000000) * 1000).toInt)),
      s.nEvents)

  private implicit class Tap[T](private val t: T) extends AnyVal {
    def tap(f: T => Unit): T = { f(t); t }
  }

  /** Streaming wrapper: events(user_id, event_id, ts) → closed sessions.
    * Uses event-time timeout keyed to the watermark: a session closes
    * when the watermark passes its end by the gap.
    */
  def sessionStream(events: DataFrame, gapSeconds: Long,
                    watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("event_id").cast("long"), col("ts"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed: the open session is final
            val out = state.getOption.map(toClosed(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.map(r => Event(r.user_id, r.event_id, micros(r.ts)))
              .toSeq.sortBy(e => (e.tsMicros, e.event_id))
            val (closed, open) = foldEvents(userId, sorted, state.getOption, gapMicros)
            open match {
              case Some(s) =>
                state.update(s)
                // close when the watermark passes the session end by the
                // gap; clamped above the current watermark so late
                // micro-batches (files can arrive out of order) cannot
                // set an already-elapsed timeout, which Spark rejects
                state.setTimeoutTimestamp(math.max(
                  (s.endMicros + gapMicros) / 1000 + 1,
                  state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
