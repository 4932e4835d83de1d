package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Merge/upsert semantics over plain parquet snapshots — the operation
  * the reference delegates to Delta (reference README.md:300-304).
  * Without a transactional table format the merge produces the
  * post-merge state as a new snapshot; at scale this is the
  * write-audit-publish pattern (write new snapshot, validate, swap the
  * table pointer), which keeps the operator a pure join with no
  * driver-side row handling.
  */
object Upsert {

  /** Deterministic merge: same-key rows in `updates` replace rows in
    * `target` (whole-row replace), unmatched update rows insert,
    * unmatched target rows carry over. One full-outer shuffle join on
    * the key — broadcastable when the update batch is small, which is
    * the common CDC shape.
    *
    * `updates` MUST be unique per key — a duplicate update key would
    * fan out the matched target row once per duplicate (full-outer join
    * semantics), corrupting the snapshot. The precondition is enforced,
    * not assumed: pass `orderCol` to resolve duplicates inside merge
    * (highest value wins — the CDC "latest event" rule), or leave it
    * empty and merge VERIFIES key uniqueness up front, failing fast on
    * violation. The verify pass is one aggregation over the update
    * batch (the small side), not the target.
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
            orderCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty)
    require(target.columns.sameElements(updates.columns),
      "merge requires identical target/updates schemas")
    val upd1 = orderCol match {
      case Some(c) =>
        Ranking.topPerGroup(updates, keys.map(col), Seq(col(c).desc), 1)
      case None =>
        val dups = updates.groupBy(keys.map(col): _*)
          .count().filter(col("count") > 1).limit(1).count()
        require(dups == 0L,
          s"merge: duplicate update keys on (${keys.mkString(", ")}) would " +
            "fan out target rows — dedupe first or pass orderCol")
        updates
    }
    val valueCols = target.columns.filterNot(keys.contains).toSeq
    // Rename value columns per side instead of relying on dataset-id
    // disambiguation: update batches are routinely DERIVED from the
    // target (CDC readback, corrections), where t("c")/u("c") hits the
    // ambiguous-self-join trap.
    val t = valueCols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val u = valueCols.foldLeft(upd1)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__upd", lit(true))
    // USING-style join coalesces the key columns; value columns pick the
    // update side exactly when an update row matched.
    t.join(u, keys, "full_outer")
      .select((keys.map(col) ++ valueCols.map { c =>
        when(col("__upd").isNotNull, col(s"__u_$c")).otherwise(col(s"__t_$c")).as(c)
      }): _*)
  }

  /** Anti-join delete: drop target rows whose key appears in
    * `tombstones`.
    */
  def delete(target: DataFrame, tombstones: DataFrame, keys: Seq[String]): DataFrame =
    target.join(tombstones.select(keys.map(col): _*), keys, "left_anti")
}
