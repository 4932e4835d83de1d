package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-pruned semi join — the runtime-filter pattern (Spark's own
  * `InjectRuntimeFilter`, here as an explicit operator the caller
  * controls): build a Bloom filter over the dimension keys, prune the
  * fact scan MAP-SIDE with `might_contain` before any exchange, then
  * make the result exact with a real semi join over the survivors.
  *
  * Why it matters at 100 TB: a plain semi join shuffles (or at best
  * scans and hashes) every fact row; with a selective dimension
  * predicate, almost all of those rows are discarded AT the join. The
  * Bloom filter moves that discard into the fact scan itself — the
  * shuffle/join input drops to (selectivity + false-positive rate) of
  * the fact table for the cost of one KB–MB-sized sketch broadcast.
  * The exactness contract is unconditional: false positives are
  * removed by the semi join; false negatives don't exist.
  *
  * Built from Spark's public sketch machinery (`BloomFilterAggregate`
  * / `BloomFilterMightContain`, the expressions behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`), surfaced
  * through a scalar subquery exactly as the injected form is — the
  * filter is planned as one driver-evaluated subquery, never a
  * per-row join.
  */
object BloomJoin {

  /** `fact` rows whose `factKey` appears in `dim`'s `dimKey` —
    * left-semi semantics, Bloom-pruned map-side. `expectedItems` sizes
    * the filter (Spark defaults the bit budget from it; ~1.2 MB at the
    * 1M default with the default 3% FPP).
    */
  def prunedSemiJoin(fact: DataFrame, factKey: Column,
                     dim: DataFrame, dimKey: Column,
                     expectedItems: Long = 1000000L): DataFrame =
    fact.filter(mightContain(fact, factKey, dim, dimKey, expectedItems))
      .join(dim, factKey === dimKey, "left_semi")

  /** The pruning predicate alone (no exactness join) — exposed so
    * callers and tests can measure the prefilter's selectivity.
    */
  def mightContain(fact: DataFrame, factKey: Column,
                   dim: DataFrame, dimKey: Column,
                   expectedItems: Long = 1000000L): Column = {
    val bfPlan = dim.select(
        GraftColumnBridge.column(
          new BloomFilterAggregate(
            GraftColumnBridge.expression(xxhash64(dimKey)), expectedItems)
            .toAggregateExpression())
          .as("graft_bf"))
      .queryExecution.analyzed
    GraftColumnBridge.column(
      BloomFilterMightContain(
        ScalarSubquery(bfPlan),
        GraftColumnBridge.expression(xxhash64(factKey))))
  }
}
