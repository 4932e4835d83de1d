package graft

import graft.app.Scheduler

/** The Airflow-DAG semantics (schedule, retries, catchup=false, run
  * history) with injected clock/sleeper — no wall time anywhere.
  */
class SchedulerSpec extends SparkSpec {

  import spark.implicits._

  private val Day = 24L * 3600 * 1000

  test("dueBoundary: fires once per ELAPSED interval (Airflow data-" +
      "interval rule), catchup=false collapses a gap") {
    // nothing covered yet → the latest fully-ELAPSED interval fires:
    // just after the day-10 boundary the run covers day 9 (the day
    // that actually elapsed — a daily job at 00:05 processes yesterday)
    assert(Scheduler.dueBoundary(10 * Day + 5, None, Day) == Some(9 * Day))
    // same interval again → nothing due
    assert(Scheduler.dueBoundary(10 * Day + 9, Some(9 * Day), Day).isEmpty)
    // next boundary crossed → day 10 has now elapsed
    assert(Scheduler.dueBoundary(11 * Day + 1, Some(9 * Day), Day)
      == Some(10 * Day))
    // a WEEK of missed intervals → exactly one run, the latest elapsed
    assert(Scheduler.dueBoundary(17 * Day + 1, Some(9 * Day), Day)
      == Some(16 * Day))
    // before the first interval has elapsed, nothing is due
    assert(Scheduler.dueBoundary(Day - 1, None, Day).isEmpty)
  }

  test("runWithRetries: fails twice then succeeds — 3 attempts, 2 delays; " +
      "exhausted retries record the final failure") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val attempts = Scheduler.runWithRetries(
      () => { calls += 1; if (calls < 3) sys.error(s"boom $calls") },
      retries = 2, retryDelayMs = 120000L, sleep = sleeps += _)
    assert(attempts.map(_.ok) == Seq(false, false, true))
    assert(attempts.map(_.attempt) == Seq(1, 2, 3))
    assert(attempts(0).error.contains("boom 1"))
    assert(sleeps.toSeq == Seq(120000L, 120000L),
      "one retry delay between each attempt, none after success")

    val exhausted = Scheduler.runWithRetries(
      () => sys.error("always"), retries = 2, retryDelayMs = 1L, _ => ())
    assert(exhausted.size == 3 && exhausted.forall(!_.ok))
    // success on first try: one attempt, zero sleeps
    val clean = Scheduler.runWithRetries(() => (), 2, 1L,
      _ => fail("must not sleep"))
    assert(clean == Seq(Scheduler.Attempt(1, ok = true, "")))
  }

  test("tick: history appends per attempt; a failed interval re-fires " +
      "next tick; a succeeded one does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sched").toString
    var healthy = false
    var runs = 0
    val job = () => { runs += 1; if (!healthy) sys.error("db down") }

    // day 10: job down → 3 failed attempts recorded, interval NOT
    // covered (the due boundary is day 9, the elapsed interval)
    val t1 = Scheduler.tick(spark, dir, job, nowMs = 10 * Day + 5,
      intervalMs = Day, retries = 2, retryDelayMs = 1L, sleep = _ => ())
    assert(t1.size == 3 && t1.forall(!_.ok) && runs == 3)
    // later the same day: the uncovered boundary fires again
    healthy = true
    val t2 = Scheduler.tick(spark, dir, job, nowMs = 10 * Day + 9,
      intervalMs = Day, retries = 2, retryDelayMs = 1L, sleep = _ => ())
    assert(t2 == Seq(Scheduler.Attempt(1, ok = true, "")) && runs == 4)
    // again the same day: covered → nothing due, job untouched
    assert(Scheduler.tick(spark, dir, job, nowMs = 10 * Day + 99,
      intervalMs = Day, retries = 2, retryDelayMs = 1L, sleep = _ => ()).isEmpty)
    assert(runs == 4)
    // next day fires exactly once more
    assert(Scheduler.tick(spark, dir, job, nowMs = 11 * Day,
      intervalMs = Day, retries = 2, retryDelayMs = 1L,
      sleep = _ => ()).size == 1)

    // the run history is a queryable attempt-grained trail
    val hist = graft.sources.Versioned.read(spark, s"$dir/runs")
      .select("recorded_at_ms", "boundary_ms", "attempt", "ok")
      .as[(Long, Long, Int, Boolean)].collect()
      .sortBy(r => (r._1, r._3)).map(r => (r._2, r._3, r._4)).toSeq
    assert(hist == Seq(
      (9 * Day, 1, false), (9 * Day, 2, false), (9 * Day, 3, false),
      (9 * Day, 1, true), (10 * Day, 1, true)))
  }
}
