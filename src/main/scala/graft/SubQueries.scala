package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated-subquery suite (q85–q88) — the SQL shapes a user writes
  * the first week against [[Sql.run]]: EXISTS with correlated extra
  * predicates, IN / NOT-IN with the three-valued-logic null trap, and a
  * correlated scalar aggregate per key.
  *
  * These run as SQL TEXT on both engines — the Spark side goes through
  * `Sql.run` (temp views over the cached relations), the oracle runs
  * the identical string in DuckDB — so the suite pins the SQL surface,
  * not a hand-decorrelated DataFrame re-expression. Catalyst must do
  * the decorrelation itself; PlanQualitySpec asserts each plan landed
  * on a JOIN (semi / null-aware anti / aggregate-then-join), never a
  * per-row subquery execution, and SubQueriesSpec pins the semantics.
  *
  * Scale shape: every one of these decorrelates to one shuffle (or
  * broadcast) join keyed on the correlation column — the same physical
  * plan the hand-written forms in Queries.scala (q05 semi, q06 anti,
  * q56 aggregate-then-join) produce, so the 100 TB posture is identical.
  */
object SubQueries {

  // EXISTS + correlated extra predicate: decorrelates to a left-semi
  // join with the o_totalprice filter pushed below the join (and into
  // the parquet scan).
  private val q85Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  def q85ExistsCorrelated(spark: SparkSession, dir: String): DataFrame =
    Sql.run(spark, dir, q85Sql)

  // IN over a filtered subquery: left-semi join on the IN column.
  private val q86Sql =
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      |ORDER BY p_partkey""".stripMargin

  def q86InSubquery(spark: SparkSession, dir: String): DataFrame =
    Sql.run(spark, dir, q86Sql)

  // NOT IN and the classic null trap, both arms in one hash-checked
  // result: with a null-free RHS, NOT IN is an anti join (202 customers
  // at sf0.01 have no >400k order); one NULL in the RHS makes `x NOT IN
  // (…)` UNKNOWN for every x, so the with_nulls arm is provably 0 rows.
  // The NULL is planted scale-independently: nullif nulls out the
  // smallest qualifying custkey, so ≥1 NULL exists at every sf. Spark
  // plans the null-aware anti join as a broadcast hash join with
  // null-awareness, NOT a nested-loop — asserted in PlanQualitySpec.
  private val q87Sql =
    """SELECT 'no_nulls' AS arm, count(*) AS n FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |UNION ALL
      |SELECT 'with_nulls' AS arm, count(*) AS n FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM orders
      |                             WHERE o_totalprice > 400000))
      |   FROM orders WHERE o_totalprice > 400000)
      |ORDER BY arm""".stripMargin

  def q87NotInNull(spark: SparkSession, dir: String): DataFrame =
    Sql.run(spark, dir, q87Sql)

  // Correlated scalar aggregate per key: decorrelates to
  // aggregate-then-join on l_partkey (the q56 shape, derived by
  // Catalyst instead of by hand). avg is deterministic cross-engine
  // here: quantities are integral doubles, so every partial sum is an
  // exact integer and the final divide is the same IEEE operation in
  // both engines — no summation-order sensitivity.
  private val q88Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem l1
      |WHERE l_quantity > 1.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
      |                          WHERE l2.l_partkey = l1.l_partkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  def q88ScalarCorrelated(spark: SparkSession, dir: String): DataFrame =
    Sql.run(spark, dir, q88Sql)

  // NOT EXISTS + correlated compound predicate: decorrelates to a
  // left-ANTI join with both filters pushed below it — the complement
  // shape of q85 (1094 of 2000 parts at sf0.01 were never shipped as a
  // large 'A'-flag item).
  private val q92Sql =
    """SELECT p_partkey, p_name FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48
      |    AND l.l_returnflag = 'A')
      |ORDER BY p_partkey""".stripMargin

  def q92NotExistsCorrelated(spark: SparkSession, dir: String): DataFrame =
    Sql.run(spark, dir, q92Sql)

  // MULTI-column correlation (two equality predicates): the semi join
  // keys on BOTH correlation columns — the tuple-membership shape
  // (`(a,b) IN (…)`) expressed as EXISTS so the identical text binds in
  // both engines. Finds small line items in orders where the same
  // supplier also shipped a near-max item.
  private val q93Sql =
    """SELECT a.l_orderkey, a.l_linenumber, a.l_quantity FROM lineitem a
      |WHERE EXISTS (SELECT 1 FROM lineitem b
      |  WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey = a.l_suppkey
      |    AND b.l_quantity >= 49)
      |  AND a.l_quantity < 49
      |ORDER BY a.l_orderkey, a.l_linenumber""".stripMargin

  def q93MultiKeyExists(spark: SparkSession, dir: String): DataFrame =
    Sql.run(spark, dir, q93Sql)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_exists_correlated" -> (q85ExistsCorrelated _),
    "q86_in_subquery"       -> (q86InSubquery _),
    "q87_not_in_null"       -> (q87NotInNull _),
    "q88_scalar_correlated" -> (q88ScalarCorrelated _),
    "q92_not_exists"        -> (q92NotExistsCorrelated _),
    "q93_multikey_exists"   -> (q93MultiKeyExists _),
  )

  val oracle: Map[String, String] = Map(
    "q85_exists_correlated" -> q85Sql,
    "q86_in_subquery"       -> q86Sql,
    "q87_not_in_null"       -> q87Sql,
    "q88_scalar_correlated" -> q88Sql,
    "q92_not_exists"        -> q92Sql,
    "q93_multikey_exists"   -> q93Sql,
  )
}
