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

  // ---------------------------------------------------------------------
  // TPC-H Q6 — forecasting revenue change: one tight scan-agg, every
  // predicate pushed to parquet, zero joins. The canonical "is the scan
  // path clean" probe: the whole query is one codegen stage.
  def q101TpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  private val q101Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q13 — customer order-count distribution: LEFT join so
  // zero-order customers survive with c_count = 0, then a second agg
  // over the count itself. Two hash aggs; the histogram side is tiny.
  def q102TpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    counts.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q102Sql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q14 — promotion effect: share of one month's revenue from
  // PROMO-type parts. Part is the broadcast dim; the conditional sum
  // skips non-promo rows via null (no otherwise branch), and the ratio
  // divides DOUBLE casts of the two exact DECIMAL sums.
  def q103TpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("date") &&
        col("l_shipdate") < lit("1996-04-01").cast("date"))
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .agg(((lit(100.0) * sum(when(col("p_type") === "PROMO", rev)).cast("double"))
        / sum(rev).cast("double")).as("promo_revenue"))
  }

  private val q103Sql =
    """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q17 — small-quantity-order revenue: lineitems of one brand
  // below 20% of their part's average quantity. The correlated scalar
  // subquery decorrelates to a per-part aggregate joined back; the
  // brand filter shrinks the fact side FIRST, so the threshold agg runs
  // over the brand's lineitems only, then broadcasts.
  def q104TpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val thresh = li.groupBy(col("p_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_thresh"))
    li.join(broadcast(thresh), Seq("p_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  private val q104Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q18 — large-volume orders: orders whose lineitems sum past a
  // quantity threshold, with customer detail, top 100 by price. The
  // HAVING collapses lineitem FIRST (hash agg on orderkey), so the
  // 3-way join touches only qualifying orders; top-k rides the sort.
  def q105TpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q105Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q19 — discounted revenue under disjunctive brand/size/
  // quantity predicates (adapted: the generator has no container
  // column, p_size carries the second dimension). One broadcast join;
  // the OR-of-ANDs stays a single codegen'd filter, no union-of-scans.
  def q106TpchQ19(spark: SparkSession, dir: String): DataFrame = {
    def arm(brand: String, sizeMax: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand &&
        col("p_size").between(1, sizeMax) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#12", 15, 1, 11) || arm("Brand#23", 25, 10, 20) ||
        arm("Brand#34", 35, 20, 30))
      .agg(revenue)
  }

  private val q106Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q22 — global sales opportunity (adapted: c_nationkey stands
  // in for the phone country code): customers above the positive-
  // balance average with no orders at all, grouped by nation. Scalar
  // subquery = 1-row broadcast (threshold through an exact DECIMAL sum
  // so the double boundary is engine-identical); the no-orders arm is
  // a left-anti join, never per-row NOT EXISTS.
  def q107TpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val threshold = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    cust.filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  private val q107Sql =
    """SELECT c_nationkey AS cntrycode, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5, 7, 9)
      |  AND c_acctbal > (
      |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q12 (adapted — the generator has no ship mode or commit/
  // receipt dates): late-shipment accounting per order priority. A
  // lineitem is late when it ships 60+ days after the order date; one
  // fact-fact join, conditional sums ride the same hash agg.
  def q108TpchQ12(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS")
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(late, 1).otherwise(0)).as("late_count"),
        sum(when(late, 0).otherwise(1)).as("ontime_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q108Sql =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
      |  CAST(sum(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q7 — volume shipping between nations, by direction and year:
  // which direction of trade moved how much (the classic two-nation
  // pair widened to a five-nation trade bloc so every scale factor of
  // the synthetic data populates it). Both nation dims broadcast; the
  // cross-nation predicate rides the joined row, and the year comes
  // out of the shipdate AFTER the date-range filter pushed to the scan.
  def q113TpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val bloc = Seq(0, 1, 2, 3, 4)
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("s_nk").isin(bloc: _*) && col("c_nk").isin(bloc: _*) &&
        col("s_nk") =!= col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenue)
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q113Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND n1.n_nationkey IN (0, 1, 2, 3, 4) AND n2.n_nationkey IN (0, 1, 2, 3, 4)
      |  AND n1.n_nationkey <> n2.n_nationkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q8 — national market share: one supplier-nation's slice of a
  // region's ECONOMY-part revenue, by order year. The share divides two
  // conditional DECIMAL sums (cast to DOUBLE at the end), so the ratio
  // is engine-identical; the region chain collapses into the customer
  // dim before the fact join.
  def q114TpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val americaCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(americaCust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", vol)).cast("double") /
        sum(vol).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q114Sql =
    """SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q15 — top supplier(s) by quarterly revenue: the revenue CTE
  // aggregates lineitem once; the max is a 1-row broadcast compared
  // against EXACT DECIMAL revenues (equality on exact decimals is
  // engine-safe where double equality would not be); ties all surface,
  // ordered by suppkey.
  def q115TpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .as("rev_exact"))
    val top = rev.agg(max(col("rev_exact")).as("rev_max"))
    rev.crossJoin(broadcast(top))
      .filter(col("rev_exact") === col("rev_max"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_exact").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q115Sql =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev_exact
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev_exact AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_exact = (SELECT max(rev_exact) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q3 — shipping priority (adapted: o_orderpriority stands in
  // for the generator's missing o_shippriority): the 10 highest-revenue
  // unshipped orders of one market segment at a cutoff date. Both date
  // filters push to their scans before the joins; the segment filter
  // collapses customer to a broadcast-able key set; the top-10 rides
  // the sort (TakeOrderedAndProject) — no full ranking materializes.
  def q123TpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("date")
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .join(Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  private val q123Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1998-06-01' AND l_shipdate > DATE '1998-06-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q4 — order priority checking (adapted: "late" = shipped 60+
  // days after the order date, the q108 lateness rule, since the
  // generator has no commit/receipt dates): one quarter's orders with
  // at least one late lineitem, counted by priority. The EXISTS is a
  // LEFT SEMI join — the fact table never fans out, each order emits
  // at most once regardless of how many lineitems are late.
  def q124TpchQ4(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-04-01").cast("date"))
      .join(Tables.lineitem(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  private val q124Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q21 — suppliers who kept orders waiting (adapted to the q108
  // lateness rule; q113's five-nation bloc stands in for the single
  // nation so every scale factor populates it): late lineitems of
  // finished multi-supplier orders where the supplier was the ONLY
  // late one. The classic's two correlated subqueries (EXISTS another
  // supplier / NOT EXISTS another late supplier) collapse into one
  // (order, supplier)-grain aggregate off a SINGLE fact scan — the
  // only fact-sized shuffle; the order-level qualification and the
  // join back both ride the collapsed rows (per-supplier-per-order,
  // orders of magnitude smaller). No per-row subquery execution.
  def q125TpchQ21(spark: SparkSession, dir: String): DataFrame = {
    // one fact scan: collapse lineitems to (order, supplier) grain with
    // a late-row count — everything after this shuffle is order-grain
    val perOrderSupp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("l_shipdate") >=
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1).otherwise(0))
        .as("n_late_rows"))
      // two consumers (order-level qualification + join back): stage the
      // collapsed rows so the fact table is scanned exactly once
      .localCheckpoint()
    val waitingOrders = perOrderSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("n_late_rows") > 0, 1).otherwise(0)).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("wait_orderkey"))
    val blocSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_nationkey").isin(0, 1, 2, 3, 4))
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrderSupp.filter(col("n_late_rows") > 0)
      .join(waitingOrders, col("l_orderkey") === col("wait_orderkey"))
      .join(broadcast(blocSuppliers), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_late_rows")).cast("long").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val q125Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND n_nationkey IN (0, 1, 2, 3, 4)
      |  AND l1.l_shipdate >= o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate >= o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // Synthesized PARTSUPP — the driver testdata lacks TPC-H's fourth
  // base table, so the five classics that need it (Q2, Q9, Q11, Q16,
  // Q20) run over a DETERMINISTIC synthesis: each part gets 4 suppliers
  // by the TPC-H stride rule (suppkey = (partkey + i·⌊S/4⌋) mod S, keys
  // 0-based like the testdata), and availqty/supplycost are
  // md5-arithmetic on the (part, supplier) pair. Pure expressions over
  // part × the 1-row supplier count, so the DuckDB oracle regenerates
  // the IDENTICAL table from the same parquet and no fixture file is
  // ever written. 4·|part| rows; at 100 TB this is a derived dimension
  // you'd materialize once, bucketed by ps_partkey.
  private[graft] def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val md5i = (c: Column) => conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    val pair = (a: Column, b: Column) =>
      concat(a.cast("string"), lit("-"), b.cast("string"))
    val sCnt = Tables.supplier(spark, dir).agg(count(lit(1)).as("s_cnt"))
    Tables.part(spark, dir).select(col("p_partkey"))
      .crossJoin(broadcast(sCnt)) // 1-row broadcast, not a cross product
      .select(col("p_partkey").as("ps_partkey"),
        explode(sequence(lit(0L), lit(3L))).as("i"), col("s_cnt"))
      .select(col("ps_partkey"),
        ((col("ps_partkey") + col("i") * greatest(lit(1L), expr("s_cnt div 4")))
          % col("s_cnt")).as("ps_suppkey"))
      .select(col("ps_partkey"), col("ps_suppkey"),
        (md5i(pair(col("ps_partkey"), col("ps_suppkey"))) % 9999 + 1)
          .cast("int").as("ps_availqty"),
        ((md5i(pair(col("ps_suppkey"), col("ps_partkey"))) % 99901 + 100)
          .cast("double") / 100.0).as("ps_supplycost"))
  }

  /** The oracle-side twin: CTEs that rebuild [[partsupp]] in DuckDB
    * from the same parquet (open with `WITH `, then append the query).
    */
  private val partsuppCte =
    """scnt AS (SELECT count(*) AS s_cnt FROM supplier),
      |ps0 AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + i * greatest(1, s_cnt // 4)) % s_cnt AS ps_suppkey
      |  FROM part CROSS JOIN scnt CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
      |partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST(CAST(('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || '-' ||
      |      CAST(ps_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 9999 + 1 AS INTEGER)
      |      AS ps_availqty,
      |    CAST(CAST(('0x' || substr(md5(CAST(ps_suppkey AS VARCHAR) || '-' ||
      |      CAST(ps_partkey AS VARCHAR)), 1, 8)) AS BIGINT) % 99901 + 100 AS DOUBLE)
      |      / 100.0 AS ps_supplycost
      |  FROM ps0)""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q2 — minimum-cost supplier (adapted: the size predicate
  // alone selects the part subset — adding the classic's type filter
  // empties the answer at every testdata SF — and the output is
  // trimmed to the generator's columns): for each size-15 part, the
  // EUROPE suppliers
  // quoting its minimum supply cost. The min-per-part rides a window
  // over the ALREADY part-filtered candidate rows (partitioned by
  // ps_partkey — never an unpartitioned window, never a second
  // partsupp pass), ties keep every minimal supplier, exactly the
  // correlated-subquery semantics.
  def q137TpchQ2(spark: SparkSession, dir: String): DataFrame = {
    val eurSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val targetParts = Tables.part(spark, dir)
      .filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val cand = partsupp(spark, dir)
      .join(broadcast(targetParts), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(eurSupp), col("ps_suppkey") === col("s_suppkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ps_partkey"))
    cand
      .withColumn("min_cost", min(col("ps_supplycost")).over(w))
      .filter(col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"), col("p_brand"), col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val q137Sql =
    s"""WITH $partsuppCte
       |SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_brand,
       |  ps_supplycost
       |FROM partsupp ps
       |JOIN part ON p_partkey = ps.ps_partkey
       |JOIN supplier ON s_suppkey = ps.ps_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |WHERE p_size = 15 AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT min(ps2.ps_supplycost)
       |    FROM partsupp ps2
       |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
       |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
       |    WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q9 — product-type profit ('red' parts): revenue minus supply
  // cost by supplier nation and order year. The p_name filter prunes
  // the fact scan through a broadcast BEFORE the partsupp join; profit
  // stays DECIMAL until the final cast so the sum is order-insensitive.
  def q138TpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("%red%")).select(col("p_partkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val profit = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))) -
      dec(col("ps_supplycost")) * dec(col("l_quantity"))
    Tables.lineitem(spark, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(partsupp(spark, dir),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q138Sql =
    s"""WITH $partsuppCte
       |SELECT n_name AS nation,
       |  CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
       |    - CAST(ps_supplycost AS DECIMAL(18,2))
       |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q11 — important stock identification: one nation's share of
  // partsupp value, parts above 1/10000 of the total. The threshold is
  // a 1-row aggregate broadcast against the per-part sums (declared
  // 1-row cross join, the q53 scalar-subquery shape) — the nation's
  // partsupp slice is scanned once, reused for both aggregates via
  // localCheckpoint.
  def q139TpchQ11(spark: SparkSession, dir: String): DataFrame = {
    val nationSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_13").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val vals = partsupp(spark, dir)
      .join(broadcast(nationSupp), col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (dec(col("ps_supplycost")) * col("ps_availqty").cast("decimal(18,2)"))
          .as("v"))
      .localCheckpoint() // two consumers: per-part sums + the threshold
    val perPart = vals.groupBy(col("ps_partkey"))
      .agg(sum(col("v")).as("value_dec"))
    val threshold = vals.agg((sum(col("v")) * lit(0.0001).cast("decimal(6,4)"))
      .as("thr"))
    perPart.crossJoin(broadcast(threshold))
      .filter(col("value_dec") > col("thr"))
      .select(col("ps_partkey"), col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  private val q139Sql =
    s"""WITH $partsuppCte,
       |vals AS (
       |  SELECT ps_partkey,
       |    CAST(ps_supplycost AS DECIMAL(18,2))
       |      * CAST(ps_availqty AS DECIMAL(18,2)) AS v
       |  FROM partsupp
       |  JOIN supplier ON s_suppkey = ps_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = 'NATION_13')
       |SELECT ps_partkey, CAST(sum(v) AS DOUBLE) AS value
       |FROM vals
       |GROUP BY ps_partkey
       |HAVING sum(v) > (SELECT sum(v) * CAST(0.0001 AS DECIMAL(6,4)) FROM vals)
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q16 — parts/supplier relationship (adapted: the excluded
  // "complaints" suppliers become the negative-balance ones — the
  // generator has no s_comment): supplier counts per (brand, type,
  // size) over selected sizes, excluding one brand, one type family,
  // and the flagged suppliers. The NOT IN is a broadcast anti-join
  // (the excluded set is tiny and null-free by construction).
  def q140TpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" && !col("p_type").like("PROMO%") &&
        col("p_size").isin(1, 4, 9, 15, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    partsupp(spark, dir)
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q140Sql =
    s"""WITH $partsuppCte
       |SELECT p_brand, p_type, p_size,
       |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM partsupp
       |JOIN part ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
       |  AND p_size IN (1, 4, 9, 15, 23, 36, 45, 49)
       |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------------
  // TPC-H Q20 — potential part promotion: suppliers in one nation whose
  // stock of 'small…' parts exceeds half of what they actually shipped
  // in one year. The correlated per-(part, supplier) shipment sum is
  // ONE grouped aggregate off the date-pruned fact scan, joined back on
  // the pair key — pairs with no shipments drop, exactly the NULL
  // comparison semantics of the classic's scalar subquery.
  def q141TpchQ20(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val qualifying = partsupp(spark, dir)
      .join(broadcast(smallParts), col("ps_partkey") === col("p_partkey"))
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty").cast("double") > lit(0.5) * col("qty"))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_13").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q141Sql =
    s"""WITH $partsuppCte
       |SELECT s_name, s_acctbal
       |FROM supplier
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE n_name = 'NATION_13'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN
       |        (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
       |      AND CAST(ps_availqty AS DOUBLE) > 0.5 * (
       |        SELECT sum(l_quantity) FROM lineitem
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= DATE '1996-01-01'
       |          AND l_shipdate < DATE '1997-01-01'))
       |ORDER BY s_name""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_tpch_q5"   -> (q95TpchQ5 _),
    "q96_tpch_q10"  -> (q96TpchQ10 _),
    "q101_tpch_q6"  -> (q101TpchQ6 _),
    "q102_tpch_q13" -> (q102TpchQ13 _),
    "q103_tpch_q14" -> (q103TpchQ14 _),
    "q104_tpch_q17" -> (q104TpchQ17 _),
    "q105_tpch_q18" -> (q105TpchQ18 _),
    "q106_tpch_q19" -> (q106TpchQ19 _),
    "q107_tpch_q22" -> (q107TpchQ22 _),
    "q108_tpch_q12" -> (q108TpchQ12 _),
    "q113_tpch_q7"  -> (q113TpchQ7 _),
    "q114_tpch_q8"  -> (q114TpchQ8 _),
    "q115_tpch_q15" -> (q115TpchQ15 _),
    "q123_tpch_q3"  -> (q123TpchQ3 _),
    "q124_tpch_q4"  -> (q124TpchQ4 _),
    "q125_tpch_q21" -> (q125TpchQ21 _),
    "q137_tpch_q2"  -> (q137TpchQ2 _),
    "q138_tpch_q9"  -> (q138TpchQ9 _),
    "q139_tpch_q11" -> (q139TpchQ11 _),
    "q140_tpch_q16" -> (q140TpchQ16 _),
    "q141_tpch_q20" -> (q141TpchQ20 _),
  )

  val oracle: Map[String, String] = Map(
    "q95_tpch_q5"   -> q95Sql,
    "q96_tpch_q10"  -> q96Sql,
    "q101_tpch_q6"  -> q101Sql,
    "q102_tpch_q13" -> q102Sql,
    "q103_tpch_q14" -> q103Sql,
    "q104_tpch_q17" -> q104Sql,
    "q105_tpch_q18" -> q105Sql,
    "q106_tpch_q19" -> q106Sql,
    "q107_tpch_q22" -> q107Sql,
    "q108_tpch_q12" -> q108Sql,
    "q113_tpch_q7"  -> q113Sql,
    "q114_tpch_q8"  -> q114Sql,
    "q115_tpch_q15" -> q115Sql,
    "q123_tpch_q3"  -> q123Sql,
    "q124_tpch_q4"  -> q124Sql,
    "q125_tpch_q21" -> q125Sql,
    "q137_tpch_q2"  -> q137Sql,
    "q138_tpch_q9"  -> q138Sql,
    "q139_tpch_q11" -> q139Sql,
    "q140_tpch_q16" -> q140Sql,
    "q141_tpch_q20" -> q141Sql,
  )
}
