package graft.operators

import org.apache.spark.sql.DataFrame

/** THE multi-consumer staging seam (guide §1.2 "don't compute things
  * you throw away"): materialize a corpus-grain intermediate ONCE so
  * every downstream consumer reads the staged rows instead of
  * re-running the producing subtree (tokenize/hash/score passes are
  * the expensive producers in this engine).
  *
  * Local form: a LAZY `localCheckpoint` — MEMORY_AND_DISK blocks that
  * materialize inside the first consuming action (no separate staging
  * job; `explain`/plan audits stay computation-free), owned by the
  * plan (nothing registered in the session cache manager for callers
  * to clean up; blocks free when the plan is GC'd).
  *
  * CLUSTER CAVEAT (the reason this seam exists as ONE function): a
  * localCheckpoint block CUTS lineage — on a real cluster a lost
  * executor cannot recompute it and the job dies. At 100 TB the
  * corpus-grain stages routed through here must become reliable
  * stages: a parquet write+read between jobs (what a production
  * pipeline does between its DAG steps) or a storage-backed
  * `checkpoint()`. That swap is THIS function's body — operators that
  * stage through [[staged]] need no per-site edits. Shortlist-sized
  * seams (|Q|·k rows, e.g. Retrieval's shared PQ shortlist) are fine
  * either way; the corpus×token-grain ones are why the swap matters.
  *
  * NOT routed through here, deliberately:
  *  - iterative lineage cuts (Graph/Bpe round tables) — those bound
  *    PLAN GROWTH, one per round; a parquet stage per iteration would
  *    be its own regression. They keep explicit localCheckpoints.
  *  - [[graft.operators.Retrieval.constraintFreeStage]] — that seam
  *    additionally strips origin constraints (SPARK-39748) so
  *    downstream DPP guards survive; swapping it for a parquet stage
  *    must preserve that property (a parquet read does).
  */
object Stage {
  /** Stage `df` for multiple consumers. Lazy: no job runs until the
    * first consuming action materializes the blocks.
    */
  def staged(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

  /** Suffix form, so a staging site reads `producer.staged` in place:
    * `import graft.operators.Stage.StagedOps`.
    */
  implicit class StagedOps(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = Stage.staged(df)
  }
}

/** Partition key for AUDITED single-partition windows. A handful of
  * windows in this engine legitimately run over one partition: global
  * prefix sums / ranks over COLLAPSED dimensions whose cardinality is
  * proven bounded at the call site (per-shuffle-partition offset
  * tables, vocab symbol tables, day dimensions, limit(k) seed samples
  * — each carries its proof as a comment). For those, WindowExec's
  * "No Partition Defined … Moving all data to a single partition"
  * warning is a false positive, and ~80 repeats per Verify run bury
  * the real warnings the message exists for.
  *
  * `Window.partitionBy(lit(0))` does NOT silence it on Spark 4: the
  * EliminateWindowPartitions optimizer rule drops foldable partition
  * expressions and the spec is empty again by execution time. [[key]]
  * builds a key that is constant-VALUED but not constant-FOLDABLE —
  * `pmod(xxhash64(anchor), 1)` ≡ 0 for every row, null-safe (xxhash64
  * never returns null), referencing a real column so no folding rule
  * can remove it. Identical results (same single partition, same
  * order, same frame), one hash per row on an input already proven
  * tiny — and any FUTURE unpartitioned window still warns, which is
  * the point.
  */
object BoundedWindow {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

  /** Constant-0 partition key anchored on `anchor` (any type; may be
    * null). Use ONLY with a boundedness proof at the call site.
    */
  def key(anchor: Column): Column = pmod(xxhash64(anchor), lit(1L))
}
