package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H queries over the testdata subset (q95–q96) — the
  * standard join-heavy analytics shapes a reference user brings along,
  * adapted only where the generator's schema lacks a column. Written
  * Spark-first: dimension chains (region→nation→supplier) broadcast,
  * the date filter lands on the orders scan BEFORE the fact join, and
  * the top-k ends in TakeOrderedAndProject, never a full sort.
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  private def revenue: Column =
    sum(dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
      .cast("double").as("revenue")

  // ---------------------------------------------------------------------
  // TPC-H Q5 — local supplier volume: revenue from lineitems where the
  // customer and supplier share a nation inside one region, one year.
  // 6-table join; region/nation/supplier collapse to one broadcast-able
  // dimension; the c_nationkey = s_nationkey equality rides the supplier
  // join as a second key.
  def q95TpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val asiaSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaSuppliers),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q95Sql =
    """SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q10 — returned-item reporting: top 20 customers by revenue
  // lost to returns in one quarter. The limit rides the sort
  // (TakeOrderedAndProject): no executor ever materializes the full
  // ranking.
  def q96TpchQ10(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1996-04-01").cast("date"))
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q96Sql =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_tpch_q5"  -> (q95TpchQ5 _),
    "q96_tpch_q10" -> (q96TpchQ10 _),
  )

  val oracle: Map[String, String] = Map(
    "q95_tpch_q5"  -> q95Sql,
    "q96_tpch_q10" -> q96Sql,
  )
}
