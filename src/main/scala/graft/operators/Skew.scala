package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale (SURVEY.md §7.4
  * "100 TB posture").
  *
  * AQE's skew-join splitting (on by default) handles most cases by
  * splitting oversized shuffle partitions, and it is the first tool to
  * reach for. These operators cover the two places AQE doesn't:
  *
  *  - [[saltedJoin]]: a single join key so hot that ONE key's rows
  *    exceed an executor (AQE can split a partition, but a broadcast-
  *    ineligible small side still meets every hot-key row in one task
  *    per split). Salting fans the hot key into `nSalts` sub-keys.
  *  - [[saltedCount]]: two-phase aggregation when a group key is so hot
  *    the final-aggregate task for that key dominates the stage; the
  *    salted partial pass shrinks per-task input by ~nSalts.
  *
  * Both are result-identical to their unsalted forms (pinned in
  * SkewSpec).
  */
object Skew {

  /** Inner equi-join with the big (skewed) side salted: each big-side
    * row gets a deterministic salt in [0, nSalts); the small side is
    * replicated nSalts times. The (key, salt) join spreads a hot key
    * over nSalts tasks at the cost of an nSalts× blowup of the small
    * side — use when the small side is modest but above the broadcast
    * threshold.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    // Salt from the row's key hash + a per-row uniform component that is
    // deterministic given the data (xxhash64 over all big-side columns).
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase salted count: partial count per (keys, salt), final sum
    * per keys. Identical result to `groupBy(keys).count()`, but the hot
    * key's partial work spreads over nSalts map-side groups.
    */
  def saltedCount(df: DataFrame, keys: Seq[Column], nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    // Alias the keys in the partial pass: re-resolving an EXPRESSION key
    // (e.g. col("ts").cast("date")) against the aggregated plan — where
    // the source column no longer exists — would fail analysis. Output
    // column names are taken from the plain groupBy's schema so the
    // contract "identical to groupBy(keys).count()" includes naming.
    val targetNames = df.groupBy(keys: _*).agg(count(lit(1)).as("count")).columns
    val aliased = keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") }
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(nSalts)).cast("int"))
    salted
      .groupBy((aliased :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.indices.map(i => col(s"__k$i")): _*)
      .agg(sum(col("__partial")).as("count"))
      .toDF(targetNames.toIndexedSeq: _*)
  }
}
