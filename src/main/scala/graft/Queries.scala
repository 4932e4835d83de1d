package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared query surface: one named query per operator row of
  * SURVEY.md §2, each with its DuckDB oracle twin.
  *
  * Scale posture: filters/projections sit directly on the parquet scan
  * (pushdown + pruning), aggregations rely on Catalyst's partial+final
  * hash agg, small dimension tables are broadcast explicitly, and no
  * query collects to the driver.
  */
object Queries {

  /** Money column → exact decimal. Sums over DECIMAL are exact and
    * order-independent, so Spark and DuckDB agree bit-for-bit after the
    * final cast back to double — double summation order would not.
    */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------------
  // A1/A2/P4/P14 — pricing summary (TPC-H Q1 shape).
  // Reference evidence: groupBy+count/max README.md:456,460; computed
  // columns README.md:379-383.
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // P1/P14/O1 — projection + predicate pushdown + total-order sort.
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 45 && col("l_discount") > 0.07 &&
        col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_quantity >= 45 AND l_discount > 0.07 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------------
  // J1/A1 — inner equi-join + aggregation (pin⋈geo analog,
  // README.md:452,456). customer is the small side at any sf → broadcast
  // is wrong at 100 TB; keying both sides lets AQE pick BHJ/SMJ by size.
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_revenue"))
      .orderBy(col("c_mktsegment"))

  private val q03Sql =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // J2 — 3-way join chain (pin⋈geo⋈user analog, README.md:509-513). Key
  // list joins avoid the reference's manual duplicate-column .drop.
  def q04Join3Way(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"), "inner")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))

  private val q04Sql =
    """SELECT c_mktsegment, o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // J6 — left semi join (EXISTS).
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(
        Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  private val q05Sql =
    """SELECT o_orderstatus, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // J6 — left anti join (NOT EXISTS).
  def q06AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "P").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))
      .orderBy(col("c_mktsegment"))

  private val q06Sql =
    """SELECT c_mktsegment, count(*) AS n_customers, min(c_custkey) AS min_custkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // A3/W1 — deterministic per-group argmax (the reference's "most popular
  // category per country" pattern, README.md:449-467, with the declared
  // tie-break semantics). nation is a fixed-size dim → explicit broadcast.
  def q07ArgmaxGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("segment_count"))
    operators.Ranking
      .argmax(counts, Seq(col("c_nationkey")), col("segment_count"), col("c_mktsegment"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment").as("top_segment"), col("segment_count"))
      .orderBy(col("n_name"))
  }

  private val q07Sql =
    """SELECT n_name, c_mktsegment AS top_segment, segment_count
      |FROM (
      |  SELECT c_nationkey, c_mktsegment, segment_count,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY segment_count DESC, c_mktsegment ASC) AS rn
      |  FROM (SELECT c_nationkey, c_mktsegment, count(*) AS segment_count
      |        FROM customer GROUP BY c_nationkey, c_mktsegment)
      |) JOIN nation ON c_nationkey = n_nationkey
      |WHERE rn = 1
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // A4 — global deterministic argmax (overall top row, README.md:529-530).
  def q08ArgmaxGlobal(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
    operators.Ranking.argmaxGlobal(counts, col("n_customers"), col("c_mktsegment"))
  }

  private val q08Sql =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment
      |ORDER BY n_customers DESC, c_mktsegment ASC LIMIT 1""".stripMargin

  // ---------------------------------------------------------------------
  // W1 — ranking window: top-3 customers by balance per nation.
  def q09WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select(col("c_nationkey"), col("rank_in_nation"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rank_in_nation"))
  }

  private val q09Sql =
    """SELECT c_nationkey, rank_in_nation, c_custkey, c_acctbal
      |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
      |        row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
      |      FROM customer)
      |WHERE rank_in_nation <= 3
      |ORDER BY c_nationkey, rank_in_nation""".stripMargin

  // ---------------------------------------------------------------------
  // W2 — analytic window: per-user lag + running sum over event time.
  // Running sum goes through DECIMAL so the prefix sums are exact in both
  // engines regardless of accumulation strategy.
  def q10WindowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("running_value",
        sum(dec(col("value"))).over(w.rowsBetween(Long.MinValue, 0)).cast("double"))
      .select(col("user_id"), col("event_id"), col("value"), col("prev_value"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q10Sql =
    """SELECT user_id, event_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // O1/O3 — global top-k (TakeOrderedAndProject: no full sort at scale).
  def q11TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val q11Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // A5 — exact distinct counts (approx_count_distinct is bench-only; it
  // has no cross-engine oracle).
  def q12Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  private val q12Sql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // Set ops (§2.7): union-all, intersect (distinct), except (distinct).
  def q13Union(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  private val q13Sql =
    """SELECT nationkey, count(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey FROM supplier
      |) GROUP BY nationkey ORDER BY nationkey""".stripMargin

  def q14Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  private val q14Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  def q15Except(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ship_month"))
      .except(Tables.orders(spark, dir)
        .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long").as("ship_month")))
      .orderBy(col("ship_month"))

  private val q15Sql =
    """SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ship_month FROM lineitem
      |EXCEPT
      |SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ship_month FROM orders
      |ORDER BY ship_month""".stripMargin

  // ---------------------------------------------------------------------
  // P13/U1 — bucketing via when/otherwise (Catalyst-native, codegen-able;
  // the reference uses a Python UDF here, README.md:553-560, which forces
  // a per-row interpreter round-trip — the declared engine form is the
  // expression chain).
  def q16CaseBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("balance_bucket",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 1000, "low")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high"))
      .groupBy(col("balance_bucket"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_balance"))
      .orderBy(col("balance_bucket"))

  private val q16Sql =
    """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
      |            WHEN c_acctbal < 1000 THEN 'low'
      |            WHEN c_acctbal < 5000 THEN 'mid'
      |            ELSE 'high' END AS balance_bucket,
      |  count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
      |FROM customer GROUP BY 1 ORDER BY balance_bucket""".stripMargin

  // ---------------------------------------------------------------------
  // P12 — date-part extraction (year(timestamp), README.md:481,586).
  // DuckDB year() returns BIGINT → cast Spark's INT to LONG to agree.
  def q17DatePart(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .withColumn("order_month", month(col("o_orderdate")).cast("long"))
      .groupBy(col("order_year"), col("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("order_year"), col("order_month"))

  private val q17Sql =
    """SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY 1, 2 ORDER BY order_year, order_month""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] A5-adjacent — exact percentiles (interpolating, quantile_cont
  // semantics) over TWO value columns, on the DISTRIBUTED machinery
  // (operators.Stats.exactPercentilesWide, q94's path): collapse to
  // weighted distinct values, range placement, exact rank intervals.
  // This query previously rode Spark's one-buffer `percentile`
  // aggregate — per-group memory grows with the data, the documented
  // OOM-by-design at 100 TB and the suite's one real >2×-of-oracle
  // bench offender — kept only as an oracle-parity twin. No bench query
  // rides the one-buffer form anymore; the approximate 100 TB path
  // stays q80/q89 (rank sketches, constant memory).
  def q42Percentile(spark: SparkSession, dir: String): DataFrame = {
    // BOTH value columns ride ONE rank-interval pass: the measures
    // unpivot into a long form and the measure name joins the group key
    // (a struct group), so the collapse, range placement, and boundary
    // aggregation run once over 2N skinny rows instead of twice over N
    // (two full chains + a join measured ~0.5 s slower at sf0.1). The
    // unpivot is a map-side generator over ONE scan — the earlier
    // unionByName form scanned lineitem once per measure.
    val li = Tables.lineitem(spark, dir)
    val long = li.select(col("l_returnflag").as("rf"),
        explode(array(
          struct(lit("qty").as("m"), col("l_quantity").cast("double").as("v")),
          struct(lit("price").as("m"),
            col("l_extendedprice").cast("double").as("v")))).as("x"))
      .select(col("rf"), col("x")("m").as("m"), col("x")("v").as("v"))
    val wide = graft.operators.Stats.exactPercentilesWide(
      long, struct(col("rf"), col("m")), col("v"),
      Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"))
    wide.groupBy(col("g")("rf").as("l_returnflag"))
      .agg(
        max(when(col("g")("m") === "qty", col("p25"))).as("qty_p25"),
        max(when(col("g")("m") === "qty", col("p50"))).as("qty_p50"),
        max(when(col("g")("m") === "qty", col("p75"))).as("qty_p75"),
        max(when(col("g")("m") === "price", col("p50"))).as("price_median"))
      .orderBy(col("l_returnflag"))
  }

  private val q42Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS qty_p25,
      |  quantile_cont(l_quantity, 0.5) AS qty_p50,
      |  quantile_cont(l_quantity, 0.75) AS qty_p75,
      |  quantile_cont(l_extendedprice, 0.5) AS price_median
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] — set-valued aggregation: the distinct members per group,
  // rendered as a sorted joined string (deterministic and canon-safe;
  // raw collect_set order is undefined in both engines).
  def q45CollectSet(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy(col("o_orderstatus"))

  private val q45Sql =
    """SELECT o_orderstatus,
      |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
      |  count(DISTINCT o_orderpriority) AS n_priorities
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_join_agg"        -> (q03JoinAgg _),
    "q04_join_3way"       -> (q04Join3Way _),
    "q05_semi_join"       -> (q05SemiJoin _),
    "q06_anti_join"       -> (q06AntiJoin _),
    "q07_argmax_group"    -> (q07ArgmaxGroup _),
    "q08_argmax_global"   -> (q08ArgmaxGlobal _),
    "q09_window_rank"     -> (q09WindowRank _),
    "q10_window_analytic" -> (q10WindowAnalytic _),
    "q11_topk"            -> (q11TopK _),
    "q12_distinct"        -> (q12Distinct _),
    "q13_union"           -> (q13Union _),
    "q14_intersect"       -> (q14Intersect _),
    "q15_except"          -> (q15Except _),
    "q16_case_bucket"     -> (q16CaseBucket _),
    "q17_date_part"       -> (q17DatePart _),
    "q42_percentile"      -> (q42Percentile _),
    "q45_collect_set"     -> (q45CollectSet _),
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_join_agg"        -> q03Sql,
    "q04_join_3way"       -> q04Sql,
    "q05_semi_join"       -> q05Sql,
    "q06_anti_join"       -> q06Sql,
    "q07_argmax_group"    -> q07Sql,
    "q08_argmax_global"   -> q08Sql,
    "q09_window_rank"     -> q09Sql,
    "q10_window_analytic" -> q10Sql,
    "q11_topk"            -> q11Sql,
    "q12_distinct"        -> q12Sql,
    "q13_union"           -> q13Sql,
    "q14_intersect"       -> q14Sql,
    "q15_except"          -> q15Sql,
    "q16_case_bucket"     -> q16Sql,
    "q17_date_part"       -> q17Sql,
    "q42_percentile"      -> q42Sql,
    "q45_collect_set"     -> q45Sql,
  )
}
