package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, OpenSession}

/** Stateful streaming sessionization: the pure session fold, and the
  * flatMapGroupsWithState stream end-to-end over file micro-batches.
  */
class StatefulSessionsSpec extends SparkSpec {

  private val Gap = 1800L * 1000000L // 30 min in micros
  private def us(min: Long) = min * 60L * 1000000L

  test("foldEvents groups by gap and carries the open session") {
    val events = Seq(
      Event(1, 1, us(0)), Event(1, 2, us(10)),  // session 1
      Event(1, 3, us(90)),                       // 80-min gap → closes session 1
      Event(1, 4, us(100)))
    val (closed, open) = StatefulSessions.foldEvents(1, events, None, Gap)
    assert(closed.map(_.n_events) == Seq(2L))
    assert(open.contains(OpenSession(us(90), us(100), 2L)))
  }

  test("foldEvents extends a session restored from state") {
    val prior = Some(OpenSession(us(0), us(5), 3L))
    val (closed, open) = StatefulSessions.foldEvents(1, Seq(Event(1, 9, us(20))), prior, Gap)
    assert(closed.isEmpty)
    assert(open.contains(OpenSession(us(0), us(20), 4L)))
  }

  test("foldEvents exact-gap boundary stays in-session") {
    val (closed, open) = StatefulSessions.foldEvents(
      1, Seq(Event(1, 1, us(0)), Event(1, 2, us(30))), None, Gap)
    assert(closed.isEmpty)
    assert(open.exists(_.nEvents == 2L))
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
