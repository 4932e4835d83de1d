package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-pass data-quality counters riding the job itself
  * (`Dataset.observe` → `CollectMetrics`): the counters aggregate on
  * the executors as the rows stream through the plan, so a curation
  * write gets its row counts and null/violation rates WITHOUT a second
  * scan — the production alternative to `df.count()` bookkeeping,
  * which re-executes the whole lineage per metric at 100 TB.
  *
  * Batch: [[observed]] returns the instrumented frame plus the
  * [[org.apache.spark.sql.Observation]] handle; `get` blocks until the
  * first action finishes and returns the metric map. Streaming: attach
  * [[qualityMetrics]] via `df.observe(name, ...)` — every progress
  * event carries the batch's counters in `observedMetrics` (asserted
  * in StreamingSpec).
  *
  * PLACEMENT: attach the metrics where rows flow exactly ONCE. A
  * `repartitionByRange` boundary sampler re-executes everything below
  * its exchange, so counters placed under it double-count (measured in
  * TrainingExport — instrument ABOVE the exchange); the same applies
  * below any node whose child is executed more than once.
  */
object Audit {

  /** Instrument `df` with named metric columns (plain aggregate
    * expressions — count/sum/min/max/avg over the observed rows).
    */
  def observed(df: DataFrame, name: String,
               metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric expression")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The standard corpus-gate counter set: rows plus per-column null
    * counts — the numbers every daily curation job reports.
    */
  def qualityMetrics(cols: Seq[String]): Seq[Column] =
    count(lit(1)).as("rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
}
