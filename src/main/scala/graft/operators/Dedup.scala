package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators (SURVEY.md §2.4 A7/A8 + LLM-pipeline north
  * star). Spark's `dropDuplicates` keeps an arbitrary row per key; every
  * variant here instead declares WHICH row survives (min key under a
  * stable order) so results are reproducible and oracle-checkable.
  *
  * Scale shape: all variants are a single hash aggregation / window over
  * the key — one shuffle, partial aggregation map-side where possible.
  * The MinHash/SimHash candidate generation in [[NearDup]] avoids the
  * O(n²) pair space by banding/bucketing so only same-bucket pairs join.
  */
object Dedup {

  /** Exact dedup by key columns: keep the row with the smallest
    * `keepOrder` value per key (deterministic dropDuplicates).
    */
  def exactByKey(df: DataFrame, keys: Seq[Column], keepOrder: Column): DataFrame =
    Ranking.topPerGroup(df, keys, Seq(keepOrder.asc), 1)

  /** Exact full-row dedup — plain distinct (order-free, deterministic). */
  def exactFullRow(df: DataFrame): DataFrame = df.distinct()

  /** Normalized-text dedup summary: one row per canonical text form with
    * the surviving id and the duplicate count.
    */
  def normalizedText(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(TextOps.normalized(text)).as("norm_fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))
}
