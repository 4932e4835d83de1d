package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic-ish directory publish for write-audit-publish swaps
  * (compaction, CDC snapshots). The naive `delete(live); rename(staging,
  * live)` has a data-loss window: a crash between the two calls — or a
  * `rename` that returns false instead of throwing (the object-store
  * contract) — leaves NO live copy, with the data stranded in staging.
  *
  * The safe order keeps a live copy on disk at every instant:
  *
  *   1. `rename(live, live.old)`   — the old data survives, just moved
  *   2. `rename(staging, live)`    — the new data takes the live name
  *   3. `delete(live.old)`         — cleanup, only after 2 succeeded
  *
  * Every rename's boolean is CHECKED; a false return at step 2 rolls
  * the old data back to the live name and raises, so a failed publish
  * degrades to "compaction didn't happen" instead of "partition gone".
  * The `.old` name starts with a dot, so Spark's file listing ignores
  * it if a crash strands it (a reader never double-counts).
  *
  * Single-directory renames on HDFS are atomic; on S3-like stores each
  * step is a copy, but the ordering still guarantees a crash leaves at
  * least one complete copy under either `live` or `.live.old` —
  * recoverable by an operator, never silently lost.
  */
object Publish {

  /** Name the displaced live copy hides under during the swap. */
  def retired(live: Path): Path =
    new Path(live.getParent, s".${live.getName}.old")

  /** Swap `staging` into place at `live`. `live` may not exist yet
    * (first publish). Throws instead of losing data on any failed step.
    */
  def swap(fs: FileSystem, staging: Path, live: Path): Unit = {
    require(fs.exists(staging), s"staging dir missing: $staging")
    val old = retired(live)
    // a stranded .old from a previous crashed swap: if the live copy
    // exists the crash was post-step-2 and the stranded dir is garbage;
    // if not, .old holds the ONLY copy — refuse to touch anything
    if (fs.exists(old)) {
      if (!fs.exists(live))
        throw new IllegalStateException(
          s"found $old with no live copy at $live — recover it first")
      require(fs.delete(old, true), s"could not clear stale $old")
    }
    val hadLive = fs.exists(live)
    if (hadLive)
      require(fs.rename(live, old), s"rename $live -> $old failed")
    if (!fs.rename(staging, live)) {
      // roll back so the table keeps serving the pre-swap data
      if (hadLive && !fs.rename(old, live))
        throw new IllegalStateException(
          s"publish failed AND rollback failed: data preserved at $old")
      throw new IllegalStateException(
        s"rename $staging -> $live failed; original left in place")
    }
    if (hadLive) fs.delete(old, true): Unit // best-effort cleanup
  }
}
