package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column completeness/cardinality/range stats in
  * ONE scan — the pre-ingest audit a training-data pipeline runs before
  * accepting a drop. All columns' aggregates compute in a single
  * partial+final hash agg (no per-column re-scan); stack() then pivots
  * the 1-row result to one row per column, driver-free.
  *
  * min/max surface as strings so heterogeneous column types fit one
  * output schema; doubles go through DECIMAL(18,2) first — double→
  * string formatting is engine-specific, decimal→string is not.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String],
               decimalCols: Set[String] = Set.empty): DataFrame = {
    require(cols.nonEmpty)
    def ranged(c: String) =
      if (decimalCols(c)) col(c).cast("decimal(18,2)") else col(c)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(ranged(c)).cast("string").as(s"${c}__min"),
        max(ranged(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    row.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, n_vals, n_nulls, n_distinct, min_val, max_val)")
  }
}
