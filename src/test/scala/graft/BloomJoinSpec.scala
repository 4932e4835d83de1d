package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** BloomJoin: exactness (≡ plain semi join), measured map-side pruning,
  * and plan shape (the prefilter is a scalar-subquery `might_contain`
  * BEFORE the join, not a per-row join).
  */
class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("prunedSemiJoin ≡ plain left-semi join, row for row") {
    val fact = Tables.orders(spark, dir)
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    val pruned = BloomJoin.prunedSemiJoin(
      fact, col("o_custkey"), dim, col("c_custkey"))
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "bloom-pruned semi join diverged from the exact semi join")
    assert(pruned.count() > 0, "degenerate test: no matching orders")
  }

  test("the Bloom prefilter alone is a small superset of the exact match set") {
    val fact = Tables.orders(spark, dir)
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    val factN = fact.count()
    val exactN = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val bloomN = fact.filter(BloomJoin.mightContain(
      fact, col("o_custkey"), dim, col("c_custkey"))).count()
    // no false negatives: every exact match passes the filter
    assert(bloomN >= exactN, s"bloom passed $bloomN < exact $exactN")
    // and the filter genuinely prunes: with a selective dim (~7% of
    // customers), the surviving fact fraction must be far below 1 —
    // allow generous FPP slack
    assert(bloomN < factN / 2,
      s"bloom kept $bloomN of $factN fact rows - no real pruning")
  }

  test("empty dimension prunes everything; exactness holds") {
    val fact = Tables.orders(spark, dir)
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 999999)
    assert(dim.isEmpty)
    val r = BloomJoin.prunedSemiJoin(
      fact, col("o_custkey"), dim, col("c_custkey"))
    assert(r.isEmpty)
  }

  test("plan: might_contain rides a scalar subquery in a Filter above the fact scan") {
    val fact = Tables.orders(spark, dir)
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    val plan = BloomJoin.prunedSemiJoin(
        fact, col("o_custkey"), dim, col("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no might_contain in plan:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"bloom filter not planned as a subquery:\n$plan")
    // the prefilter must NOT have become a join: exactly one join
    // operator (the exactness semi join) in the plan
    val joins = ("(?i)(sortmergejoin|broadcasthashjoin|shuffledhashjoin|" +
      "broadcastnestedloopjoin|cartesianproduct)").r
      .findAllIn(plan.toLowerCase).size
    assert(joins == 1, s"expected exactly 1 join operator, saw $joins:\n$plan")
  }
}
