package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** Streaming sessionization with custom state
  * (`flatMapGroupsWithState`): the streaming counterpart of
  * [[graft.operators.AsOf.sessionize]].
  *
  * Per user, the state holds every session that is not yet FINAL — a
  * session is final only once the event-time watermark has passed its
  * end by the gap, because until then a late event may still extend it
  * or bridge it with a neighbor. Emitting earlier (e.g. as soon as a
  * later in-batch event closes a gap) would split one true session into
  * two append-mode outputs that can never be retracted.
  *
  * State per key is O(undecided sessions), bounded by the watermark
  * delay divided by the gap (plus one open session) — small constants,
  * so total state is ~|active users|, the property that matters at
  * 100 TB/day event volumes.
  */
object StatefulSessions {

  case class Event(user_id: Long, event_id: Long, tsMicros: Long)

  /** Wire row: `ts` must stay a TimestampType column (not pre-converted
    * to micros) so the watermark metadata on the attribute survives the
    * projection into the typed stream — flatMapGroupsWithState's
    * event-time timeout requires a watermarked input column.
    */
  case class EventRow(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

  case class OpenSession(startMicros: Long, endMicros: Long, nEvents: Long)

  case class SessionState(sessions: Seq[OpenSession])

  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def toClosed(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, toTs(s.startMicros), toTs(s.endMicros), s.nEvents)

  /** Merge a batch of events into the undecided-session list. An event
    * within `gapMicros` of a session's bounds (on either side — late
    * events may precede the open session) extends it; adjacent sessions
    * bridged by the new event are coalesced. Pure and total: emits
    * nothing, only restructures state — finality is decided solely by
    * the watermark in [[sessionStream]].
    */
  def mergeEvents(events: Seq[Event], state: Seq[OpenSession],
                  gapMicros: Long): Seq[OpenSession] =
    events.foldLeft(state.sortBy(_.startMicros)) { (sessions, e) =>
      val t = e.tsMicros
      val (touching, rest) = sessions.partition(s =>
        t >= s.startMicros - gapMicros && t <= s.endMicros + gapMicros)
      val merged = touching.foldLeft(OpenSession(t, t, 1L)) { (acc, s) =>
        OpenSession(math.min(acc.startMicros, s.startMicros),
          math.max(acc.endMicros, s.endMicros), acc.nEvents + s.nEvents)
      }
      (rest :+ merged).sortBy(_.startMicros)
    }

  /** Sessions final under `watermarkMicros` (end + gap strictly passed),
    * and the remainder to keep in state.
    */
  def splitFinal(sessions: Seq[OpenSession], gapMicros: Long,
                 watermarkMicros: Long): (Seq[OpenSession], Seq[OpenSession]) =
    sessions.partition(s => s.endMicros + gapMicros < watermarkMicros)

  /** Streaming wrapper: events(user_id, event_id, ts) → closed sessions,
    * emitted only once the watermark makes them final.
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
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val events = rows.map(r => Event(r.user_id, r.event_id, micros(r.ts)))
            .toSeq.sortBy(e => (e.tsMicros, e.event_id))
          val sessions = mergeEvents(events, prior, gapMicros)
          val watermarkMicros = state.getCurrentWatermarkMs() * 1000L
          val (finals, undecided) = splitFinal(sessions, gapMicros, watermarkMicros)
          if (undecided.isEmpty) state.remove()
          else {
            state.update(SessionState(undecided))
            // wake when the earliest undecided session becomes final;
            // clamped above the current watermark (late micro-batches
            // cannot register an already-elapsed timeout)
            state.setTimeoutTimestamp(math.max(
              (undecided.map(_.endMicros).min + gapMicros) / 1000 + 1,
              state.getCurrentWatermarkMs() + 1))
          }
          finals.sortBy(_.startMicros).map(toClosed(userId, _)).iterator
      }
  }
}
