package graft

import org.apache.spark.sql.functions._

/** Integrity checks for the synthesized partsupp fixture behind the
  * Q2/Q9/Q11/Q16/Q20 classics (the queries themselves are covered by
  * the DuckDB oracle gate — this pins the generator's contract).
  */
class TpchFixtureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partsupp synthesis: 4 distinct suppliers per part, FK-valid, bounded, deterministic") {
    val ps = TpchQueries.partsupp(spark, dir)
    val nPart = Tables.part(spark, dir).count()
    assert(ps.count() == 4 * nPart, "exactly 4 supplier rows per part")
    assert(ps.groupBy(col("ps_partkey"))
      .agg(countDistinct(col("ps_suppkey")).as("n"))
      .filter(col("n") =!= 4).count() == 0,
      "the stride rule must never assign the same supplier twice to a part")
    assert(ps.join(Tables.supplier(spark, dir),
      col("ps_suppkey") === col("s_suppkey"), "left_anti").count() == 0,
      "every ps_suppkey must exist in supplier")
    assert(ps.filter(col("ps_availqty") < 1 || col("ps_availqty") > 9999)
      .count() == 0, "availqty in [1, 9999]")
    assert(ps.filter(col("ps_supplycost") < 1.0 || col("ps_supplycost") > 1000.0)
      .count() == 0, "supplycost in [1.00, 1000.00]")
    val again = TpchQueries.partsupp(spark, dir)
    assert(ps.exceptAll(again).isEmpty && again.exceptAll(ps).isEmpty,
      "regeneration must be bit-identical")
  }
}
