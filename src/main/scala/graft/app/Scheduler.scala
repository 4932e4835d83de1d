package graft.app

import org.apache.spark.sql.SparkSession

/** Scheduled-batch orchestration — the engine-side analogue of the
  * reference's Airflow DAG (reference 0affc6b7559b_dag.py:23-43:
  * `schedule_interval='@daily'`, `retries: 2`, `retry_delay: 2 min`,
  * `catchup=False`, submitting one batch job per interval). The
  * reference delegates these semantics to Airflow; here they are a
  * small, fully spec-testable runner:
  *
  *  - **fixed-interval schedule**: intervals are `[k·interval,
  *    (k+1)·interval)` epochs; a run is due when `now` has crossed a
  *    boundary the last successful run has not covered;
  *  - **no catchup**: missed intervals collapse to the LATEST boundary
  *    (Airflow's `catchup=False`) — a runner that was down for a week
  *    runs once, not seven times;
  *  - **bounded retries with delay**: a failing job re-runs up to
  *    `retries` more times, sleeping `retryDelayMs` between attempts;
  *    the final failure is recorded, never thrown away;
  *  - **run history as data**: every attempt appends to a
  *    [[graft.sources.Versioned]] `runs` table beside the job's own
  *    outputs — the crash/retry trail is queryable like anything else.
  *
  * Clock and sleeper are INJECTED so every semantic above is asserted
  * in SchedulerSpec without wall time; `main` wires the real clock
  * around the daily incremental-curation batch (the engine's natural
  * daily job, [[graft.operators.Curation.curateBatch]]).
  */
object Scheduler {

  /** One attempt's outcome. */
  final case class Attempt(attempt: Int, ok: Boolean, error: String)

  /** The boundary (epoch ms, multiple of `intervalMs`) a run should
    * cover now, if any: the start of the latest fully-ELAPSED interval
    * `[due, due + intervalMs)` not yet covered by `lastCovered` —
    * Airflow's data-interval rule (a daily run triggered just after
    * midnight covers YESTERDAY, the day that has actually elapsed).
    * `catchup = false` semantics — at most ONE boundary regardless of
    * how many were missed. Before the first interval has elapsed
    * (`nowMs < intervalMs`) nothing is due.
    */
  def dueBoundary(nowMs: Long, lastCovered: Option[Long],
                  intervalMs: Long): Option[Long] = {
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    val due = (nowMs / intervalMs) * intervalMs - intervalMs
    if (due >= 0 && lastCovered.forall(_ < due)) Some(due) else None
  }

  /** Run `job` with the DAG's retry discipline: up to `retries` extra
    * attempts, `sleep(retryDelayMs)` between them. Returns every
    * attempt's outcome in order (size ≤ retries + 1); the run succeeded
    * iff the last attempt's `ok`.
    */
  def runWithRetries(job: () => Unit, retries: Int, retryDelayMs: Long,
                     sleep: Long => Unit): Seq[Attempt] = {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    val out = Seq.newBuilder[Attempt]
    var attempt = 0
    var done = false
    while (!done && attempt <= retries) {
      attempt += 1
      val r = try { job(); Attempt(attempt, ok = true, "") }
      catch { case e: Exception =>
        Attempt(attempt, ok = false, Option(e.getMessage).getOrElse(e.toString))
      }
      out += r
      done = r.ok
      if (!done && attempt <= retries) sleep(retryDelayMs)
    }
    out.result()
  }

  /** One scheduler tick: if an interval is due, run the job with
    * retries and append one history row PER ATTEMPT to
    * `historyDir/runs` (boundary, attempt, ok, error, recorded_at_ms).
    * Returns the attempts (empty = nothing due). The boundary counts
    * as covered only when the run SUCCEEDED — a failed interval is
    * retried at the next tick (depends_on_past = false: it runs the
    * then-latest boundary, not the failed one).
    */
  def tick(spark: SparkSession, historyDir: String, job: () => Unit,
           nowMs: Long, intervalMs: Long, retries: Int = 2,
           retryDelayMs: Long = 120000L,
           sleep: Long => Unit = Thread.sleep): Seq[Attempt] = {
    import spark.implicits._
    val runsTable = s"$historyDir/runs"
    val lastOk =
      if (!graft.sources.Versioned.exists(spark, runsTable)) None
      else {
        val rows = graft.sources.Versioned.read(spark, runsTable)
          .filter(org.apache.spark.sql.functions.col("ok"))
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("boundary_ms")))
          .as[Option[Long]].collect()
        rows.headOption.flatten
      }
    dueBoundary(nowMs, lastOk, intervalMs) match {
      case None => Seq.empty
      case Some(boundary) =>
        val attempts = runWithRetries(job, retries, retryDelayMs, sleep)
        val rows = attempts.map(a =>
          (boundary, a.attempt, a.ok, a.error, nowMs))
        graft.sources.Versioned.append(
          rows.toDF("boundary_ms", "attempt", "ok", "error", "recorded_at_ms"),
          runsTable): Unit
        attempts
    }
  }

  /** The coverage marker row's stage name: appended once per boundary
    * AFTER every stage succeeded, so "is this interval covered?" is one
    * filter regardless of how the stage list evolves across deploys.
    */
  val CoveredStage = "_covered"

  /** One scheduler tick of a MULTI-STAGE job (a linear DAG, the Airflow
    * task-chain shape): stages run in order, each with the full retry
    * discipline; a stage that exhausts its retries FAILS THE RUN and
    * the remaining stages are skipped (their absence from the history
    * is the skip record — exactly Airflow's upstream_failed). One
    * history row per (stage, attempt) goes to `historyDir/runs`
    * (boundary_ms, stage, stage_idx, attempt, ok, error,
    * recorded_at_ms), plus one [[CoveredStage]] marker row when the
    * whole chain succeeded — the boundary counts as covered ONLY then.
    *
    * A re-tick of an UNCOVERED boundary resumes where it failed: stages
    * that already have an ok row for this boundary are SKIPPED (exactly
    * Airflow's clear-and-rerun — only failed and never-run tasks
    * execute), so a stage that already applied the day's batch to
    * append-only state (signal counts, index postings) is never applied
    * twice. Returns the attempts per stage RUN THIS TICK in order
    * (empty = nothing due).
    */
  def tickStages(spark: SparkSession, historyDir: String,
                 stages: Seq[(String, () => Unit)], nowMs: Long,
                 intervalMs: Long, retries: Int = 2,
                 retryDelayMs: Long = 120000L,
                 sleep: Long => Unit = Thread.sleep): Seq[(String, Seq[Attempt])] = {
    import spark.implicits._
    require(stages.nonEmpty, "tickStages needs at least one stage")
    require(!stages.exists(_._1 == CoveredStage),
      s"stage name $CoveredStage is reserved for the coverage marker")
    val runsTable = s"$historyDir/runs"
    val lastOk =
      if (!graft.sources.Versioned.exists(spark, runsTable)) None
      else {
        val rows = graft.sources.Versioned.read(spark, runsTable)
          .filter(org.apache.spark.sql.functions.col("ok") &&
            org.apache.spark.sql.functions.col("stage") === CoveredStage)
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("boundary_ms")))
          .as[Option[Long]].collect()
        rows.headOption.flatten
      }
    dueBoundary(nowMs, lastOk, intervalMs) match {
      case None => Seq.empty
      case Some(boundary) =>
        // stages already ok for THIS boundary (a prior failed tick got
        // partway through) — resume after them, never re-apply them
        val doneStages: Set[String] =
          if (!graft.sources.Versioned.exists(spark, runsTable)) Set.empty
          else graft.sources.Versioned.read(spark, runsTable)
            .filter(org.apache.spark.sql.functions.col("ok") &&
              org.apache.spark.sql.functions.col("boundary_ms") === boundary)
            .select("stage").distinct().as[String].collect().toSet
        val out = Seq.newBuilder[(String, Seq[Attempt])]
        var failed = false
        stages.zipWithIndex.foreach { case ((name, job), idx) =>
          if (!failed && !doneStages.contains(name)) {
            val attempts = runWithRetries(job, retries, retryDelayMs, sleep)
            out += name -> attempts
            val rows = attempts.map(a =>
              (boundary, name, idx, a.attempt, a.ok, a.error, nowMs))
            graft.sources.Versioned.append(
              rows.toDF("boundary_ms", "stage", "stage_idx", "attempt",
                "ok", "error", "recorded_at_ms"),
              runsTable): Unit
            if (!attempts.last.ok) failed = true
          }
        }
        if (!failed)
          graft.sources.Versioned.append(
            Seq((boundary, CoveredStage, stages.size, 0, true, "", nowMs))
              .toDF("boundary_ms", "stage", "stage_idx", "attempt",
                "ok", "error", "recorded_at_ms"),
            runsTable): Unit
        out.result()
    }
  }

  /** Real-clock entry point: one tick of the daily incremental-curation
    * batch. Run from cron/systemd per the deployment's cadence — the
    * runner is a TICK, not a daemon, so process supervision stays with
    * the platform (the same division of labor the reference delegates
    * to Airflow's scheduler process).
    *
    * Usage: tools/run.sh graft.app.Scheduler [sfDir] [workDir]
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scheduler")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val attempts = tick(spark, workDir,
      () => { graft.operators.Curation.curateBatch(
        graft.Tables.documents(spark, sfDir), s"$workDir/state"): Unit },
      nowMs = System.currentTimeMillis(),
      intervalMs = 24L * 3600 * 1000)
    if (attempts.isEmpty) println("[scheduler] nothing due")
    else println(s"[scheduler] ran ${attempts.size} attempt(s), " +
      s"ok=${attempts.last.ok}")
    val history = graft.sources.Versioned.read(spark, s"$workDir/runs")
      .orderBy(col("boundary_ms"), col("attempt"))
    history.show(20, truncate = false)
    spark.stop()
  }
}
