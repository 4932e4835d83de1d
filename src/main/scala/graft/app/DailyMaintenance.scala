package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Corpus, Retrieval, Similarity}
import graft.sources.Versioned

/** The COMPOSED daily maintenance job (SURVEY §8, round 10) — the full
  * documented daily cadence in one [[Scheduler.tickStages]] chain,
  * where the reference's Airflow DAG ticks a single notebook
  * (reference 0affc6b7559b_dag.py:28-41). Each day's document/vector
  * batch flows through every state artifact the engine maintains:
  *
  *  1. `curate`        — incremental curation state
  *                       ([[Curation.curateBatch]]: candidates + pairs)
  *  2. `signal_state`  — the frozen doc-signal lookup tables
  *                       (build day 0, [[Corpus.appendSignalState]] after)
  *  3. `bm25_append`   — the lexical inverted index (build day 0,
  *                       FAISS-add appends after)
  *  4. `chunk_append`  — the chunk-grain (RAG) index, same cadence;
  *                       appends derive the window grid from the
  *                       index's own sidecar
  *  5. `ivf_append`    — the ANN index (same cadence)
  *  6. `bm25_compact`/`chunk_compact`/`ivf_compact` — ONLY when
  *                       appends have demoted the declared bucketed
  *                       layout (latest log action = append):
  *                       re-establish it in version lockstep (the
  *                       Delta OPTIMIZE cadence)
  *  7. `vacuum`        — drop data files referenced by no retained
  *                       version on EVERY maintained table
  *
  * A stage failure stops the chain (remaining stages skip — Airflow's
  * upstream_failed) and leaves the boundary uncovered; the next tick
  * RESUMES it — stages with an ok row for the boundary are skipped, so
  * an append-only stage (signal counts, index postings) never applies
  * the day's batch twice, and the failed stage itself re-runs against
  * state its own crash may have half-committed (each artifact's own
  * heal/lockstep contract covers that case).
  *
  * Scale shape: each stage is batch-sized work against
  * vocabulary/index-bounded state — nothing rescans the accumulated
  * corpus; compaction rewrites one snapshot; vacuum is file-metadata
  * work. The history table records every (stage, attempt) so the
  * crash/retry trail is queryable data.
  */
object DailyMaintenance {

  /** Every Versioned table the daily job maintains, relative to the
    * work dir — the vacuum stage's worklist.
    */
  def maintainedTables(work: String): Seq[String] = Seq(
    s"$work/state/candidates", s"$work/state/pairs",
    s"$work/signals/nd", s"$work/signals/c1",
    s"$work/signals/c12", s"$work/signals/vsz",
    s"$work/bm25/postings", s"$work/bm25/stats",
    s"$work/chunks/postings", s"$work/chunks/stats",
    s"$work/ivf/centroids", s"$work/ivf/assignment")

  /** True when appends have landed on `table` since its last declared
    * layout (latest log action is an append) — the read path is
    * demoted to plain files until a compaction re-establishes it.
    */
  private def demoted(spark: SparkSession, table: String): Boolean =
    Versioned.exists(spark, table) &&
      Versioned.history(spark, table).last._2 == "append"

  /** The day's stage list over a batch of documents (doc_id, text,
    * n_chars, …) and their embedding rows (id, vec). Build-or-append
    * decisions, demotion checks, and the vacuum worklist all evaluate
    * AT RUN TIME (inside the closures), so a stage retried after a
    * crash sees the current state, not the tick-construction snapshot.
    */
  def stages(spark: SparkSession, batch: DataFrame, vecs: DataFrame,
             work: String,
             retainVersions: Int = 2): Seq[(String, () => Unit)] = Seq(
    "curate" -> (() =>
      Curation.curateBatch(batch, s"$work/state"): Unit),
    "signal_state" -> (() => {
      if (!Versioned.exists(spark, s"$work/signals/nd"))
        Corpus.buildSignalState(batch, col("doc_id"), col("text"),
          s"$work/signals"): Unit
      else
        Corpus.appendSignalState(batch, col("doc_id"), col("text"),
          s"$work/signals"): Unit
    }),
    "bm25_append" -> (() => {
      if (!Versioned.exists(spark, s"$work/bm25/postings"))
        Retrieval.buildBm25Index(batch, col("doc_id"), col("text"),
          s"$work/bm25"): Unit
      else
        Retrieval.appendToBm25Index(batch, col("doc_id"), col("text"),
          s"$work/bm25"): Unit
    }),
    "chunk_append" -> (() => {
      if (!Versioned.exists(spark, s"$work/chunks/postings"))
        Retrieval.buildChunkBm25Index(batch, col("doc_id"), col("text"),
          s"$work/chunks", size = 32, stride = 16): Unit
      else
        // the window grid comes from the index's own sidecar
        Retrieval.appendToChunkBm25Index(batch, col("doc_id"), col("text"),
          s"$work/chunks"): Unit
    }),
    "ivf_append" -> (() => {
      if (!Versioned.exists(spark, s"$work/ivf/centroids"))
        Similarity.buildIvfIndex(vecs, s"$work/ivf"): Unit
      else
        Similarity.appendToIvfIndex(vecs, s"$work/ivf"): Unit
    }),
    "bm25_compact" -> (() => {
      if (demoted(spark, s"$work/bm25/postings"))
        Retrieval.compactBm25Index(spark, s"$work/bm25"): Unit
    }),
    "chunk_compact" -> (() => {
      if (demoted(spark, s"$work/chunks/postings"))
        Retrieval.compactBm25Index(spark, s"$work/chunks"): Unit
    }),
    "ivf_compact" -> (() => {
      if (demoted(spark, s"$work/ivf/assignment"))
        Similarity.compactIvfIndex(spark, s"$work/ivf"): Unit
    }),
    "vacuum" -> (() =>
      maintainedTables(work)
        .filter(Versioned.exists(spark, _))
        .foreach(t => Versioned.vacuum(spark, t, retainVersions): Unit)))

  /** One daily tick of the composed job. Returns per-stage attempts
    * (empty = nothing due).
    */
  def tick(spark: SparkSession, work: String, batch: DataFrame,
           vecs: DataFrame, nowMs: Long,
           intervalMs: Long = 24L * 3600 * 1000, retries: Int = 2,
           retryDelayMs: Long = 120000L,
           sleep: Long => Unit = Thread.sleep): Seq[(String, Seq[Scheduler.Attempt])] =
    Scheduler.tickStages(spark, work, stages(spark, batch, vecs, work),
      nowMs, intervalMs, retries, retryDelayMs, sleep)

  /** Real-clock entry point, one tick over an sf-dir batch.
    * Usage: tools/run.sh graft.app.DailyMaintenance [sfDir] [workDir]
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = args.lift(1).getOrElse("/tmp/graft_daily")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val res = tick(spark, workDir, docs, vecs,
      nowMs = System.currentTimeMillis())
    if (res.isEmpty) println("[daily] nothing due")
    else res.foreach { case (s, a) =>
      println(s"[daily] $s: ${a.size} attempt(s), ok=${a.last.ok}") }
    spark.stop()
  }
}
