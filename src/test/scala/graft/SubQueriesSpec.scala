package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the correlated-subquery suite (q85–q88). The
  * DuckDB hash-match is the cross-engine gate; these tests pin the
  * SEMANTIC content — especially the NOT-IN three-valued-logic trap —
  * against independently computed DataFrame expectations, at a
  * different scale (sf0.001) than the oracle runs (sf0.01).
  */
class SubQueriesSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q85 EXISTS+predicate ≡ distinct custkeys of qualifying orders") {
    val got = SubQueries.q85ExistsCorrelated(spark, dir)
      .select("c_custkey").as[Long].collect().toSet
    val expected = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey")).distinct().as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q86 IN ≡ semi join on the filtered lineitem keys") {
    val got = SubQueries.q86InSubquery(spark, dir)
      .select("p_partkey").as[Long].collect().toSet
    val expected = Tables.part(spark, dir).join(
        Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49)
          .select(col("l_partkey")),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q87 NOT IN: null-free RHS = anti join count; one RHS NULL = zero rows") {
    val arms = SubQueries.q87NotInNull(spark, dir)
      .as[(String, Long)].collect().toMap
    val antiCount = Tables.customer(spark, dir).join(
        Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(arms("no_nulls") == antiCount && antiCount > 0,
      s"anti-join arm: ${arms("no_nulls")} vs $antiCount")
    // the planted NULL makes `x NOT IN (…)` UNKNOWN for every x
    assert(arms("with_nulls") == 0L)
  }

  test("q88 correlated avg ≡ hand-decorrelated aggregate-then-join") {
    val li = Tables.lineitem(spark, dir)
    val got = SubQueries.q88ScalarCorrelated(spark, dir)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    val expected = li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") > lit(1.5) * col("avg_qty"))
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }
}
