package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, OpenSession}

/** Stateful streaming sessionization: the pure merge/finality logic and
  * the flatMapGroupsWithState stream end-to-end over file micro-batches.
  */
class StatefulSessionsSpec extends SparkSpec {

  private val Gap = 1800L * 1000000L // 30 min in micros
  private def us(min: Long) = min * 60L * 1000000L

  test("mergeEvents groups by gap and keeps separate sessions undecided") {
    val sessions = StatefulSessions.mergeEvents(
      Seq(Event(1, 1, us(0)), Event(1, 2, us(10)),
        Event(1, 3, us(90)), Event(1, 4, us(100))),
      Seq.empty, Gap)
    assert(sessions == Seq(
      OpenSession(us(0), us(10), 2L), OpenSession(us(90), us(100), 2L)))
  }

  test("mergeEvents extends a session restored from state") {
    val sessions = StatefulSessions.mergeEvents(
      Seq(Event(1, 9, us(20))), Seq(OpenSession(us(0), us(5), 3L)), Gap)
    assert(sessions == Seq(OpenSession(us(0), us(20), 4L)))
  }

  test("mergeEvents: a late event before the session start extends it backwards") {
    val sessions = StatefulSessions.mergeEvents(
      Seq(Event(1, 9, us(36))), Seq(OpenSession(us(45), us(45), 1L)), Gap)
    assert(sessions == Seq(OpenSession(us(36), us(45), 2L)))
  }

  test("mergeEvents: a too-old late event forms its own preceding session") {
    val sessions = StatefulSessions.mergeEvents(
      Seq(Event(1, 9, us(0))), Seq(OpenSession(us(60), us(60), 1L)), Gap)
    assert(sessions == Seq(OpenSession(us(0), us(0), 1L), OpenSession(us(60), us(60), 1L)))
  }

  test("mergeEvents: a bridging event coalesces two undecided sessions") {
    // sessions ending 10:00 and starting 11:00 with a 30-min gap rule:
    // an event at 10:30 touches both → one session
    val sessions = StatefulSessions.mergeEvents(
      Seq(Event(1, 9, us(30))),
      Seq(OpenSession(us(0), us(0), 1L), OpenSession(us(60), us(60), 1L)), Gap)
    assert(sessions == Seq(OpenSession(us(0), us(60), 3L)))
  }

  test("mergeEvents exact-gap boundary stays in-session") {
    val sessions = StatefulSessions.mergeEvents(
      Seq(Event(1, 1, us(0)), Event(1, 2, us(30))), Seq.empty, Gap)
    assert(sessions == Seq(OpenSession(us(0), us(30), 2L)))
  }

  test("splitFinal only finalizes sessions strictly past end+gap") {
    val a = OpenSession(us(0), us(10), 2L)
    val b = OpenSession(us(60), us(70), 1L)
    val (fin, keep) = StatefulSessions.splitFinal(Seq(a, b), Gap, us(41))
    assert(fin == Seq(a) && keep == Seq(b))
    // exactly at end+gap: still undecided (a bridging event at that
    // instant would be in-gap)
    val (fin2, keep2) = StatefulSessions.splitFinal(Seq(a), Gap, us(40))
    assert(fin2.isEmpty && keep2 == Seq(a))
  }

  test("sessionStream emits closed sessions across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sess").toString

    def writeBatch(name: String, mtimeOffsetSec: Int, rows: Seq[(Long, Long, String)]): Unit = {
      val json = rows.map { case (u, e, ts) =>
        s"""{"user_id":$u,"event_id":$e,"ts":"$ts"}"""
      }.mkString("\n")
      val p = java.nio.file.Paths.get(s"$dir/$name.json")
      Files.write(p, json.getBytes)
      // deterministic micro-batch order: the file source orders by mtime
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
        1700000000000L + mtimeOffsetSec * 1000L))
    }

    // user 1: two events close together, then (next batch) an event far
    // enough ahead to advance the watermark past session1 + gap.
    writeBatch("b0", 0, Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (1L, 2L, "2024-01-01 10:05:00"),
      (2L, 3L, "2024-01-01 10:00:00")))
    writeBatch("b1", 10, Seq((1L, 4L, "2024-01-01 14:00:00")))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)   // one file per micro-batch
      .json(dir)

    StatefulSessions.sessionStream(stream, gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val out = spark.table("sessions_out")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    // user 1's first session (2 events) must have closed once the
    // watermark advanced past 10:05 + 30min; the 14:00 session and user
    // 2's session stay open (no later watermark) and are not emitted.
    assert(out.contains((1L, 2L)), s"expected closed session for user 1, got $out")
  }
}
