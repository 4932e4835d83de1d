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
  )
}
