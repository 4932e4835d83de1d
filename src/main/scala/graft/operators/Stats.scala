package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical operators.
  *
  * [[exactPercentiles]] is the EXACT-percentile scale path: Spark's
  * `percentile` (and DuckDB's `quantile_cont`) buffer every group value
  * in one aggregation buffer — per-group memory grows with the data, an
  * executor OOM by design at 100 TB. This form computes the identical
  * interpolated value with a distributed sort instead: one shuffle to
  * rank values within each group (Spark's external sort spills, never
  * buffers a group in memory), then an O(|groups|·|ps|) aggregation
  * over ONLY the rank-boundary rows. Nothing anywhere holds a group's
  * values in memory — the 100 TB-safe exact method, alongside the
  * `percentile_approx` sketch (q80/q89) when an error bound is
  * acceptable.
  */
object Stats {

  /** Exact interpolated percentiles (quantile_cont semantics: target
    * rank `1 + p·(n−1)`, linear interpolation between the two bounding
    * ranks) per group, one output row per (group, p).
    *
    * Ties in `value` are safe under any row_number tie order: equal
    * values at the boundary ranks interpolate to the same result.
    */
  def exactPercentiles(df: DataFrame, group: Column, value: Column,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    df.select(group.as("g"), value.cast("double").as("v"))
      .select(col("g"), col("v"),
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"))).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("g"))).as("n"))
      .select(col("g"), col("v"), col("rn"), col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("t", lit(1.0) + col("p") * (col("n") - lit(1)))
      // only the two rank-boundary rows per (group, p) survive — the
      // aggregation input is O(|groups|·|ps|), not O(rows)
      .filter(col("rn") === floor(col("t")) || col("rn") === ceil(col("t")))
      .groupBy(col("g"), col("p"))
      .agg(
        min(when(col("rn") === floor(col("t")), col("v"))).as("vlo"),
        min(when(col("rn") === ceil(col("t")), col("v"))).as("vhi"),
        min(col("t")).as("t"))
      .select(col("g"), col("p"),
        (col("vlo") + (col("t") - floor(col("t"))) * (col("vhi") - col("vlo")))
          .as("pct"))
  }
}
