package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Versioned

/** Document DELETION from the persisted serving indexes — the takedown
  * / opt-out / discovered-contamination path a 100 TB training-data
  * pipeline needs routinely (GDPR erasure, DMCA takedown, a benchmark
  * leak found after ingestion). Lucene's delete-then-merge split,
  * re-expressed over the engine's Versioned index family:
  *
  *  - **Logical delete now**: [[add]] appends doc ids to a small
  *    `tombstones/` Versioned table beside the index's own tables.
  *    Every query path anti-joins its CANDIDATE stream against the
  *    broadcast tombstone set BEFORE ranking (the no-starvation
  *    discipline — survivors fill the top-k), so a tombstoned document
  *    stops being served the moment the tombstone commits. Term/corpus
  *    statistics (df, cf, n_docs, sum_dl) stay PRE-delete until the
  *    merge — exactly Lucene's semantics, where deleted docs keep
  *    counting in docFreq until segments merge — so a survivor's score
  *    is unchanged by a pending delete.
  *  - **Physical drop at the compaction cadence**: the index
  *    compactions ([[Retrieval.compactBm25Index]],
  *    [[Similarity.compactIvfIndex]], [[Retrieval.compactForwardIndex]])
  *    anti-join the tombstones out of the data tables and CORRECT the
  *    corpus statistics (n_docs/sum_dl subtract the dropped documents'
  *    denormalized lengths), after which the index is row-identical to
  *    a fresh build without the documents (spec-proven) and every df/cf
  *    derived per-query from the postings is post-delete automatically.
  *
  * Retroactivity: gates always read the LATEST tombstone set, even for
  * `asOf`-pinned probes — a takedown must stop a pinned serving stream
  * too; time travel answers "what did the index hold", never "serve the
  * deleted document again". The serving STREAMS get this for free:
  * every [[graft.streaming.StreamJobs]] serve loop rebuilds its probe
  * inside foreachBatch, so the gate re-reads the tombstones each
  * micro-batch and a mid-stream takedown applies from the next batch
  * without a restart (even on a version-pinned stream).
  *
  * Re-ingestion: the append paths' new-doc-only invariant plus the
  * always-on gate mean a tombstoned doc_id is dead forever — re-adding
  * the same id would be shadowed. Re-ingesting content later (e.g. an
  * opt-out reversed) takes a new doc_id, consistent with the
  * append-only discipline every state artifact shares.
  *
  * Idempotence & growth: [[add]] is append-only and the gate is an
  * anti-join, so re-adding an id is harmless; the table is
  * takedown-list-sized (tiny against the corpus — it broadcasts), is
  * never cleared (a pinned pre-drop read must stay gated), and rides
  * the same compact/vacuum cadence as every other maintained table.
  *
  * Chunk-grain indexes (composite key doc_id·2³² + chunk_start) store
  * tombstones at DOCUMENT grain; gates and drops decode the high 32
  * bits ([[Retrieval]]'s chunk-key convention), so one takedown removes
  * every span of the document across every grain.
  */
object Tombstones {

  /** The tombstone table's subpath under an index dir. */
  val TableName = "tombstones"

  def table(indexDir: String): String = s"$indexDir/$TableName"

  /** Append doc ids to `indexDir`'s tombstone set (creating it on first
    * use). `docIds` may be any relation with a `doc_id` column; ids are
    * long (the engine-wide doc key). Returns the committed version.
    */
  def add(docIds: DataFrame, indexDir: String): Long = {
    val rows = docIds.select(col("doc_id").cast("long").as("doc_id")).distinct()
    val t = table(indexDir)
    if (Versioned.exists(rows.sparkSession, t)) Versioned.append(rows, t)
    else Versioned.overwrite(rows, t)
  }

  /** [[add]] across every index dir a corpus serves from — the takedown
    * entry point: one call tombstones the document in the lexical,
    * semantic, and forward artifacts together. Dirs whose tombstone
    * table does not exist yet get one.
    */
  def addAll(docIds: DataFrame, indexDirs: Seq[String]): Unit =
    indexDirs.foreach(d => add(docIds, d): Unit)

  /** The current tombstone set (latest version — see retroactivity in
    * the object doc), or None when the index has none. Deduplicated:
    * re-adds and the append-only history collapse to one row per id.
    */
  def of(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val t = table(indexDir)
    if (!Versioned.exists(spark, t)) None
    else Some(Versioned.read(spark, t).select(col("doc_id")).distinct())
  }

  /** Gate a candidate stream: drop rows whose document is tombstoned.
    * `docExpr` maps a row to its DOCUMENT id (identity for doc-grain
    * ids; `shiftright(ck, 32)` for chunk-grain composite keys). The
    * tombstone side broadcasts (takedown-list-sized), so the gate is a
    * map-side anti probe on the already-pruned candidate scan — no
    * shuffle, no corpus-sized join. No-op (the exact input plan) when
    * the index has no tombstones.
    */
  def gate(spark: SparkSession, indexDir: String, rows: DataFrame,
           docExpr: Column): DataFrame =
    of(spark, indexDir) match {
      case None => rows
      case Some(t) => rows.join(
        broadcast(t.select(col("doc_id").as("__ts_doc"))),
        docExpr === col("__ts_doc"), "left_anti")
    }

  /** The rows of `df` whose document IS tombstoned — the drop set a
    * compaction removes (semi form of [[gate]]). Empty when no
    * tombstones exist.
    */
  def hits(spark: SparkSession, indexDir: String, rows: DataFrame,
           docExpr: Column): DataFrame =
    of(spark, indexDir) match {
      case None => rows.limit(0)
      case Some(t) => rows.join(
        broadcast(t.select(col("doc_id").as("__ts_doc"))),
        docExpr === col("__ts_doc"), "left_semi")
    }
}
