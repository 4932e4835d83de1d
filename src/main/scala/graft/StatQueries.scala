package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical, multi-dimensional, and outer-join query surface —
  * widens SURVEY.md §2's *absent-in-reference* categories (A5/A6, W1/W2,
  * J-outer, §2.7) into oracle-checked operators so the engine covers the
  * full relational surface a user would expect, not just what the
  * reference's five queries touch.
  *
  * Scale posture mirrors Queries.scala: aggregates are partial+final
  * hash aggs; window functions shuffle once on the partition key; the
  * scalar subquery broadcasts its 1-row side rather than collecting;
  * exact sums go through DECIMAL(18,2) so both engines agree
  * bit-for-bit regardless of partition-level summation order.
  */
object StatQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------------
  // [EXT] statistical aggregates: avg / stddev / variance / corr / covar.
  // Inputs chosen for cross-engine determinism: l_quantity is a small
  // exact integer-valued double (sum of squares stays in the 2^53 exact
  // range) and corr/covar are scale-free, so 6dp canonicalization
  // absorbs summation-order noise.
  def q46StatsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        avg(col("l_quantity")).as("avg_qty"),
        stddev_samp(col("l_quantity")).as("sd_qty"),
        var_samp(col("l_quantity")).as("var_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr"),
        covar_samp(col("l_quantity"), col("l_discount")).as("qty_disc_covar"))
      .orderBy(col("l_returnflag"))

  private val q46Sql =
    """SELECT l_returnflag,
      |  avg(l_quantity) AS avg_qty,
      |  stddev_samp(l_quantity) AS sd_qty,
      |  var_samp(l_quantity) AS var_qty,
      |  corr(l_quantity, l_extendedprice) AS qty_price_corr,
      |  covar_samp(l_quantity, l_discount) AS qty_disc_covar
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // A6 — cube: all 4 grouping combinations in one pass (the rollup twin
  // q40 covers the hierarchical case). grouping() flags disambiguate
  // "NULL because rolled up" from a genuinely null key.
  def q47Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q47Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // W1/W2 — distribution window functions: ntile / percent_rank /
  // cume_dist / first_value / last_value. The order key includes the
  // unique o_orderkey so every rank is a total order (deterministic in
  // both engines). last_value needs the explicit full frame — the
  // default frame stops at CURRENT ROW in both engines.
  def q48WindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"),
        first_value(col("o_orderkey")).over(w).as("cheapest_key"),
        last_value(col("o_orderkey")).over(wFull).as("priciest_key"))
      .orderBy(col("o_orderkey"))
  }

  private val q48Sql =
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cum_dist,
      |  first_value(o_orderkey) OVER w AS cheapest_key,
      |  last_value(o_orderkey) OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // W2 — RANGE frame over event time: per-user rolling 10-minute sum.
  // The frame is value-based (all events within 600 s), not row-based —
  // the streaming-adjacent "rolling aggregate" shape. One shuffle on
  // user_id; the frame scan is a single ordered pass per partition.
  def q49RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-600, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"), col("sec"),
        sum(dec(col("value"))).over(w).cast("double").as("w_sum"),
        count(lit(1)).over(w).as("w_cnt"))
      .orderBy(col("event_id"))
  }

  private val q49Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |  FROM events
      |)
      |SELECT event_id, user_id, sec,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS w_sum,
      |  count(*) OVER w AS w_cnt
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] unpivot (wide → long): three measure columns melt into
  // (metric, val) rows, then aggregate per metric. Spark's native
  // Dataset.unpivot — no UDTF, stays in whole-stage codegen.
  def q50Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "val")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("val"))).cast("double").as("total"))
      .orderBy(col("l_returnflag"), col("metric"))

  private val q50Sql =
    """SELECT l_returnflag, metric, count(*) AS n,
      |  CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      |)
      |GROUP BY 1, 2 ORDER BY l_returnflag, metric""".stripMargin

  // ---------------------------------------------------------------------
  // P12 extended — datetime function battery: truncation, ISO weekday,
  // formatting, quarter, day arithmetic. Engine-mapping notes: Spark
  // weekday() is Monday=0 (ISO = +1); DuckDB isodow() is Monday=1.
  def q51DatetimeFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (expr("weekday(o_orderdate)") + 1).cast("long").as("dow_iso"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy(col("o_orderkey"))

  private val q51Sql =
    """SELECT o_orderkey,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  isodow(o_orderdate) AS dow_iso,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  quarter(o_orderdate) AS qtr,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] conditional aggregates: count_if / bool_or / bool_and /
  // median / max_by. max_by's ordering value is the unique o_orderkey,
  // so the argmax is deterministic (ties impossible) — same discipline
  // as A3/A4.
  // SCALE PATH: exact `median` buffers all group values in one
  // aggregation buffer — kept HERE for cross-engine oracle parity at
  // test scale only; the declared 100 TB form is q89's
  // percentile_approx (constant memory per group, error-bound-tested).
  def q52CondAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count_if(col("o_totalprice") > 300000).as("n_big"),
        bool_or(col("o_totalprice") > 450000).as("any_huge"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        median(col("o_totalprice")).as("med_price"),
        max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_priority"))
      .orderBy(col("o_orderstatus"))

  private val q52Sql =
    """SELECT o_orderstatus,
      |  CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big,
      |  bool_or(o_totalprice > 450000) AS any_huge,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  median(o_totalprice) AS med_price,
      |  arg_max(o_orderpriority, o_orderkey) AS latest_priority
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] scalar subquery: orders above the global average price. The
  // 1-row aggregate side is broadcast (never collected to the driver) —
  // the distributed form of `WHERE x > (SELECT avg(x) …)`.
  // The threshold test is exact on both engines: `price > sum/count` is
  // rewritten as `price * count > sum` over DECIMAL(18,2), so no
  // engine-specific float summation order or decimal division rounding
  // can flip a borderline row.
  def q53ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val tot = o.agg(sum(dec(col("o_totalprice"))).as("sum_price"),
      count(lit(1)).as("n_orders"))
    o.crossJoin(broadcast(tot))
      .filter(dec(col("o_totalprice")) * col("n_orders") > col("sum_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above"),
        min(col("o_totalprice")).as("min_above"))
      .orderBy(col("o_orderstatus"))
  }

  private val q53Sql =
    """WITH t AS (
      |  SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price,
      |         count(*) AS n_orders
      |  FROM orders
      |)
      |SELECT o_orderstatus, count(*) AS n_above, min(o_totalprice) AS min_above
      |FROM orders, t
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_orders > sum_price
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] array scalar functions over the embedding column: size,
  // element access, min/max. Float elements cast to double on BOTH
  // sides (exact widening) before comparison.
  def q54ArrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        array_max(col("embedding")).cast("double").as("vmax"),
        array_min(col("embedding")).cast("double").as("vmin"),
        element_at(col("embedding"), 1).cast("double").as("v_first"))
      .orderBy(col("vec_id"))

  private val q54Sql =
    """SELECT vec_id, len(embedding) AS dim,
      |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
      |  CAST(list_min(embedding) AS DOUBLE) AS vmin,
      |  CAST(embedding[1] AS DOUBLE) AS v_first
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // ST3 extended — sliding event-time windows (10-minute window, 5-minute
  // slide): each event lands in exactly 2 windows. The batch twin of the
  // streaming sliding-window aggregation; window starts are epoch-aligned
  // multiples of the slide in both engines.
  def q55SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("w_start"), col("event_type"))

  private val q55Sql =
    """WITH e AS (
      |  SELECT event_type, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
      |), x AS (
      |  SELECT event_type, value,
      |    epoch_ms(((sec // 300) * 300 - j * 300) * 1000) AS w_start
      |  FROM e CROSS JOIN (VALUES (0), (1)) AS o(j)
      |)
      |SELECT w_start, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM x GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // J-outer — left outer join: every customer, with their 1998 order
  // stats or NULLs (354 customers at sf0.01 have no 1998 orders).
  // Aggregate-then-join keeps the shuffled payload one row per customer
  // instead of one per order.
  def q56OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o98 = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1998)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_1998"),
        sum(dec(col("o_totalprice"))).cast("double").as("spend_1998"))
    Tables.customer(spark, dir)
      .join(o98, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"), col("n_1998"), col("spend_1998"))
      .orderBy(col("c_custkey"))
  }

  private val q56Sql =
    """SELECT c_custkey, c_mktsegment, o.n_1998, o.spend_1998
      |FROM customer c
      |LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_1998,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_1998
      |  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey
      |) o ON c.c_custkey = o.o_custkey
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // J-outer — full outer join: per-nation high-balance customer counts
  // vs supplier counts; nations present on only one side keep NULLs on
  // the other (10 nations at sf0.01 have no >7000-balance supplier).
  def q57FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 7000)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 7000)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy(col("nationkey"))
  }

  private val q57Sql =
    """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey, c.n_cust, s.n_supp
      |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
      |      WHERE c_acctbal > 7000 GROUP BY c_nationkey) c
      |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier
      |      WHERE s_acctbal > 7000 GROUP BY s_nationkey) s
      |  ON c.c_nationkey = s.s_nationkey
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // A5 — EXACT percentiles, distributed (operators.Stats): the same
  // interpolated values as q42's buffered `percentile`, computed with
  // ONE full pass (collapse to weighted distinct values), a range
  // placement of the collapsed table, and exact rank intervals from
  // slice offsets — no per-group window, no value buffer. This is the
  // declared 100 TB EXACT path; q42's one-buffer form stays for the
  // built-in-function surface, q80/q89 sketches cover the approximate
  // path.
  def q94PercentileDist(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.exactPercentilesWide(
        Tables.lineitem(spark, dir), col("l_returnflag"), col("l_quantity"),
        Seq(0.25, 0.5, 0.75), Seq("qty_p25", "qty_p50", "qty_p75"))
      .select(col("g").as("l_returnflag"),
        col("qty_p25"), col("qty_p50"), col("qty_p75"))
      .orderBy(col("l_returnflag"))

  private val q94Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS qty_p25,
      |  quantile_cont(l_quantity, 0.5) AS qty_p50,
      |  quantile_cont(l_quantity, 0.75) AS qty_p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // W1 scale path — top-k per group through the BOUNDED-BUFFER
  // aggregator (functions.TopKAggregator) instead of a window: the
  // window form shuffles every row of every group; the aggregator
  // map-side combines with O(k) state, so the shuffle carries k rows
  // per group per partition. Oracle: the window form in SQL — the two
  // must agree exactly (same measure-DESC, id-ASC tie-break).
  def q112TopkAgg(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(3))
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")))
      .select(col("c_mktsegment"), (col("pos") + 1).as("rank"),
        col("col")("_1").as("o_totalprice"), col("col")("_2").as("o_orderkey"))
      .orderBy(col("c_mktsegment"), col("rank"))
  }

  private val q112Sql =
    """SELECT c_mktsegment, CAST(rn AS INTEGER) AS rank, o_totalprice, o_orderkey
      |FROM (
      |  SELECT c_mktsegment, o_totalprice, o_orderkey,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, rank""".stripMargin


  // ---------------------------------------------------------------------
  // [EXT] U2/A5 — HEAVY HITTERS (Misra–Gries + exact recount): every
  // token whose true count exceeds n/(k+1), via the two-pass pattern —
  // a k-counter mergeable sketch surfaces the candidate set at bounded
  // memory (the MG inclusion guarantee holds under any merge order),
  // then ONLY those ≤ k candidates recount exactly over a broadcast
  // equality join. The corpus-wide groupBy over all distinct tokens
  // never happens, and the recount makes the answer DETERMINISTIC and
  // fully SQL-replayable — unlike the raw sketch (q80/q111's rows-only
  // carve-out does not apply here).
  def q160HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.heavyHitters(
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("tok")),
      col("tok"), k = 50)

  private val q160Sql =
    """WITH t AS (
      |  SELECT unnest(string_split(text, ' ')) AS item FROM documents),
      |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t),
      |c AS (SELECT item, CAST(count(*) AS BIGINT) AS n_occ FROM t GROUP BY 1)
      |SELECT item, n_occ FROM c CROSS JOIN tt
      |WHERE n_occ * 51 > n_total
      |ORDER BY n_occ DESC, item ASC""".stripMargin


  // ---------------------------------------------------------------------
  // [EXT] per-group heavy hitters — q160's two-pass composition grouped
  // by source (the per-domain top-token report a mixture designer
  // reads): pass 1 is ONE grouped MG aggregation whose buffers stay
  // k-bounded on every partial, pass 2 recounts the exploded (group,
  // candidate) pairs exactly and filters against per-group totals.
  // Deterministic ⇒ fully hash-checked, like q160.
  def q163HeavyHittersByGroup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.heavyHittersByGroup(
      Tables.documents(spark, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok")),
      col("source"), col("tok"), k = 50)

  private val q163Sql =
    """WITH t AS (
      |  SELECT source AS g, unnest(string_split(text, ' ')) AS item
      |  FROM documents),
      |tg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g FROM t GROUP BY 1),
      |c AS (SELECT g, item, CAST(count(*) AS BIGINT) AS n_occ
      |      FROM t GROUP BY 1, 2)
      |SELECT c.g, item, n_occ FROM c JOIN tg USING (g)
      |WHERE n_occ * 51 > n_g
      |ORDER BY g ASC, n_occ DESC, item ASC""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_stats_agg"       -> (q46StatsAgg _),
    "q47_cube"            -> (q47Cube _),
    "q48_window_dist"     -> (q48WindowDist _),
    "q49_range_frame"     -> (q49RangeFrame _),
    "q50_unpivot"         -> (q50Unpivot _),
    "q51_datetime_fns"    -> (q51DatetimeFns _),
    "q52_cond_agg"        -> (q52CondAgg _),
    "q53_scalar_subquery" -> (q53ScalarSubquery _),
    "q54_array_fns"       -> (q54ArrayFns _),
    "q55_sliding_window"  -> (q55SlidingWindow _),
    "q56_outer_join"      -> (q56OuterJoin _),
    "q57_full_outer"      -> (q57FullOuter _),
    "q94_percentile_dist" -> (q94PercentileDist _),
    "q112_topk_agg"       -> (q112TopkAgg _),
    "q160_heavy_hitters"  -> (q160HeavyHitters _),
    "q163_heavy_hitters_grouped" -> (q163HeavyHittersByGroup _),
  )

  val oracle: Map[String, String] = Map(
    "q46_stats_agg"       -> q46Sql,
    "q47_cube"            -> q47Sql,
    "q48_window_dist"     -> q48Sql,
    "q49_range_frame"     -> q49Sql,
    "q50_unpivot"         -> q50Sql,
    "q51_datetime_fns"    -> q51Sql,
    "q52_cond_agg"        -> q52Sql,
    "q53_scalar_subquery" -> q53Sql,
    "q54_array_fns"       -> q54Sql,
    "q55_sliding_window"  -> q55Sql,
    "q56_outer_join"      -> q56Sql,
    "q57_full_outer"      -> q57Sql,
    "q94_percentile_dist" -> q94Sql,
    "q112_topk_agg"       -> q112Sql,
    "q160_heavy_hitters"  -> q160Sql,
    "q163_heavy_hitters_grouped" -> q163Sql,
  )
}
