package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 widening of the declared query surface (SURVEY.md §2 [EXT]
  * rows + general-engine built-ins a reference user would expect,
  * q58–q68 + q77–q80 + q84): grouping sets, edit-distance fuzzy dedup,
  * regexp extraction, map functions, date/interval arithmetic,
  * positional explode, window/string/null batteries, a TPC-H-Q3-style
  * composite, deterministic hash split, calendar gap-fill, one-pass
  * profiling, bitwise and approximate aggregates, moving average.
  *
  * Same conventions as [[Queries]]: total-order sorts, DECIMAL(18,2)
  * money sums, aliases matching the DuckDB twin exactly.
  */
object WideQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------------
  // A6 — explicit GROUPING SETS (beyond rollup q40 / cube q47): two
  // single-column sets plus the grand total in one pass. Spark plans a
  // single Expand + hash agg — one shuffle for all three groupings, not
  // a union of three scans.
  def q58GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q58Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // A8 — edit-distance fuzzy dedup. Prefix blocking (first 16 chars of
  // the normalized text) keeps candidate generation an equality join —
  // the levenshtein DP (O(len²) per pair) only runs on same-block pairs,
  // never the O(n²) corpus square. At 100 TB the block key becomes the
  // shuffle key; skewed blocks would be salted or length-bucketed.
  def q59FuzzyLevenshtein(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(trim(col("text"))).as("norm"))
      .withColumn("blk", substring(col("norm"), 1, 16))
    val a = base.select(col("blk"), col("doc_id").as("doc_a"), col("norm").as("norm_a"))
    val b = base.select(col("blk"), col("doc_id").as("doc_b"), col("norm").as("norm_b"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      // bounded form: banded DP is O(len·k) not O(len²), and returns -1
      // beyond the bound — exactly the rows the filter drops anyway
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("norm_a"), col("norm_b"), 50).cast("long").as("edit_dist"))
      .filter(col("edit_dist").between(0, 50))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q59Sql =
    """WITH b AS (
      |  SELECT doc_id, lower(trim(text)) AS norm,
      |         substr(lower(trim(text)), 1, 16) AS blk
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
      |  CAST(levenshtein(a.norm, c.norm) AS BIGINT) AS edit_dist
      |FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
      |WHERE levenshtein(a.norm, c.norm) <= 50
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // P15 — regexp_extract_all: all matches per row as an array, counted
  // and probed. Non-overlapping leftmost matching agrees between Java
  // regex and DuckDB's RE2 for this pattern class.
  def q60RegexpExtractAll(spark: SparkSession, dir: String): DataFrame = {
    val matches = regexp_extract_all(col("text"), lit("[a-z]+e"), lit(0))
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        size(matches).cast("long").as("n_matches"),
        element_at(matches, 1).as("first_match"))
      .orderBy(col("doc_id"))
  }

  private val q60Sql =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z]+e')) AS BIGINT) AS n_matches,
      |  list_extract(regexp_extract_all(text, '[a-z]+e'), 1) AS first_match
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] MapType surface: per-user event-type histogram as a map,
  // probed with element_at. collect_list order is partition-dependent,
  // so entries are array_sort'ed before map_from_entries — the map is
  // deterministic, and only scalar probes reach the output.
  def q61MapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
      .select(col("user_id"),
        size(map_keys(col("m"))).cast("long").as("n_types"),
        coalesce(element_at(col("m"), lit("click")), lit(0L)).as("n_click"),
        coalesce(element_at(col("m"), lit("purchase")), lit(0L)).as("n_purchase"))
      .orderBy(col("user_id"))

  private val q61Sql =
    """SELECT user_id,
      |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
      |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // P12 — date/interval arithmetic battery: day difference, +INTERVAL,
  // last_day, conditional count on the derived interval.
  def q62DateArith(spark: SparkSession, dir: String): DataFrame = {
    val shipDays = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        shipDays.as("ship_days"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due"),
        last_day(to_date(col("o_orderdate"))).as("eom"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        avg(col("ship_days")).as("avg_ship_days"),
        sum(when(col("ship_days") <= 30, 1L).otherwise(0L)).as("n_within_30"),
        max(col("due")).as("max_due"),
        max(col("eom")).as("max_eom"))
      .orderBy(col("o_orderpriority"))
  }

  private val q62Sql =
    """SELECT o_orderpriority, count(*) AS n,
      |  avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS avg_ship_days,
      |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30,
      |  max(o_orderdate + INTERVAL 30 DAY) AS max_due,
      |  max(last_day(CAST(o_orderdate AS DATE))) AS max_eom
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // U3 — positional generator: posexplode carries the element index the
  // plain explode (q27) drops. 1-based to match generate_subscripts.
  def q63Posexplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("tok"))
      .orderBy(col("doc_id"), col("pos"))

  private val q63Sql =
    """SELECT doc_id, CAST(generate_subscripts(parts, 1) AS BIGINT) AS pos,
      |  unnest(parts) AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS parts
      |      FROM documents WHERE doc_id < 20)
      |ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------------------
  // W2 — second window battery: lead, nth_value over an explicit
  // full-partition ROWS frame, dense_rank under a total order.
  def q64WindowBattery(spark: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wv = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("value"),
        lead(col("value"), 1).over(w).as("next_value"),
        nth_value(col("value"), 2).over(wf).as("second_value"),
        dense_rank().over(wv).cast("long").as("value_rank"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q64Sql =
    """SELECT user_id, event_id, value,
      |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |  nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_value,
      |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_rank
      |FROM events WHERE user_id < 50
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // P15 — string-function battery: pad, reverse, locate, ascii, repeat,
  // translate, right. All codegen'd built-ins with exact DuckDB twins.
  def q65StringBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        lpad(col("c_name"), 25, "*").as("padded"),
        reverse(col("c_name")).as("rev"),
        instr(col("c_name"), "1").cast("long").as("pos1"),
        ascii(substring(col("c_name"), 1, 1)).cast("long").as("first_code"),
        repeat(substring(col("c_name"), 1, 2), 3).as("rep2"),
        translate(col("c_name"), "0123456789", "abcdefghij").as("translated"),
        expr("right(c_name, 3)").as("last3"))
      .orderBy(col("c_custkey"))

  private val q65Sql =
    """SELECT c_custkey,
      |  lpad(c_name, 25, '*') AS padded,
      |  reverse(c_name) AS rev,
      |  CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
      |  CAST(ascii(substr(c_name, 1, 1)) AS BIGINT) AS first_code,
      |  repeat(substr(c_name, 1, 2), 3) AS rep2,
      |  translate(c_name, '0123456789', 'abcdefghij') AS translated,
      |  right(c_name, 3) AS last3
      |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // Composite (TPC-H Q3 shape): selective filters on both fact sides,
  // broadcast dimension, agg, top-k. Filters reach the parquet scans
  // (PushedFilters); the customer side is explicitly broadcast; the
  // final top-10 plans as TakeOrderedAndProject — no global sort.
  def q66ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-01-01").cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q66Sql =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_shipdate > TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] deterministic hash split — the train/test partitioner a
  // training-data pipeline needs: md5(id) is stable across engines,
  // runs, and cluster sizes (unlike rand(seed), which is
  // partitioning-dependent). Pure map-side until the tiny final agg.
  def q67HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split", when(col("bucket") < 90, "train").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))

  private val q67Sql =
    """SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
      |            THEN 'train' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1 ORDER BY split""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] calendar gap-fill: dense date spine from the data's own span
  // (sequence + explode of a 1-row agg — broadcastable by construction),
  // left join of per-day counts, zeros for missing days.
  def q68CalendarFill(spark: SparkSession, dir: String): DataFrame = {
    val ev    = Tables.events(spark, dir).select(to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val span  = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("n_events"))
      .orderBy(col("day"))
  }

  private val q68Sql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS cnt FROM events GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS dts FROM daily)
      |SELECT CAST(s.dts AS DATE) AS day,
      |  CAST(coalesce(d.cnt, 0) AS BIGINT) AS n_events
      |FROM spine s LEFT JOIN daily d ON CAST(s.dts AS DATE) = d.day
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // null-handling battery: nullif / coalesce / nvl2 / conditional null
  // injection — ANSI-off null semantics pinned against the oracle.
  def q77NullFns(spark: SparkSession, dir: String): DataFrame = {
    val segOrNull = expr("nullif(c_mktsegment, 'BUILDING')")
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 150)
      .select(col("c_custkey"),
        segOrNull.as("seg_or_null"),
        coalesce(segOrNull, lit("FALLBACK")).as("seg_filled"),
        expr("nvl2(nullif(c_mktsegment, 'BUILDING'), 'has', 'none')").as("seg_flag"),
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal_pos"))
      .orderBy(col("c_custkey"))
  }

  private val q77Sql =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'FALLBACK') AS seg_filled,
      |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL THEN 'has' ELSE 'none' END AS seg_flag,
      |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos
      |FROM customer WHERE c_custkey <= 150 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] data profiling — per-column completeness/cardinality/range in
  // one scan (single hash agg for ALL columns, stack() to pivot).
  def q78Profile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.describe(
        Tables.customer(spark, dir),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
        decimalCols = Set("c_acctbal"))
      .orderBy(col("col_name"))

  private def profileArm(c: String, ranged: String) =
    s"""SELECT '$c' AS col_name, CAST(count($c) AS BIGINT) AS n_vals,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($ranged) AS VARCHAR) AS min_val,
       |  CAST(max($ranged) AS VARCHAR) AS max_val
       |FROM customer""".stripMargin

  private val q78Sql =
    Seq(
      profileArm("c_custkey", "c_custkey"),
      profileArm("c_name", "c_name"),
      profileArm("c_nationkey", "c_nationkey"),
      profileArm("c_acctbal", "CAST(c_acctbal AS DECIMAL(18,2))"),
      profileArm("c_mktsegment", "c_mktsegment"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // ---------------------------------------------------------------------
  // bitwise aggregates: bit_and / bit_or / bit_xor over the key space.
  def q79Bitwise(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bit_and(o_orderkey)").as("and_all"),
        expr("bit_or(o_orderkey)").as("or_all"),
        expr("bit_xor(o_orderkey)").as("xor_all"))
      .orderBy(col("o_orderstatus"))

  private val q79Sql =
    """SELECT o_orderstatus,
      |  CAST(bit_and(o_orderkey) AS BIGINT) AS and_all,
      |  CAST(bit_or(o_orderkey) AS BIGINT) AS or_all,
      |  CAST(bit_xor(o_orderkey) AS BIGINT) AS xor_all
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // A5 scale path — approximate aggregates: HLL++ distinct and quantile
  // sketch. These are the 100 TB substitutes for q12/q42's exact forms
  // (constant memory per group vs per-group sorted state). No cross-
  // engine oracle — sketch internals are engine-specific by design —
  // so this is a declared rows-only check; WideQueriesSpec bounds the
  // error against the exact answers instead.
  def q80ApproxAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("nd_orders_approx"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("qty_p50_approx"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------------
  // A5 scale path — approx median over a CONTINUOUS money column, the
  // declared 100 TB substitute for q52's exact `median` (which buffers
  // every group value in one aggregation buffer — an executor OOM by
  // design at scale; fine at oracle scale where it stays for parity).
  // percentile_approx is a fixed-size rank sketch: constant memory per
  // group at any row count. No cross-engine oracle (sketch internals
  // are engine-specific); WideQueriesSpec bounds the error against the
  // exact median instead — the same carve-out as q80.
  def q89ApproxMedian(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("med_price_approx"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  // ---------------------------------------------------------------------
  // A5 incremental rollup — MERGEABLE sketches (DataSketches HLL): the
  // per-day sketch is the artifact a daily job persists (a few KB); the
  // period-level distinct comes from MERGING sketches, never from
  // re-scanning history — a 3-year rollup reads ~1000 sketch rows
  // instead of the raw events. HLL register merges are max-merges, so
  // the estimate is identical for any partitioning or merge order.
  // Same rows-only carve-out as q80/q89 (sketch bytes are
  // engine-specific); WideQueriesSpec bounds the merged estimate
  // against the exact distinct and proves layout-independence.
  def q111SketchRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct"))

  // ---------------------------------------------------------------------
  // W2 — bounded ROWS frame: 4-row trailing moving average per user
  // (q10's running sum is unbounded-preceding; q49's frame is
  // value-RANGE — this pins the bounded physical-offset frame).
  def q84MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") < 100)
      .select(col("user_id"), col("event_id"),
        avg(col("value")).over(w).as("mavg4"),
        count(lit(1)).over(w).cast("long").as("n_in_frame"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q84Sql =
    """SELECT user_id, event_id,
      |  avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg4,
      |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_frame
      |FROM events WHERE user_id < 100
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // J6 scale path — Bloom-pruned semi join (operators.BloomJoin):
  // orders of top-balance customers, but the fact scan is prefiltered
  // MAP-SIDE by a Bloom filter over the dimension keys before the semi
  // join makes it exact. Same answer as the plain semi join (the
  // oracle), radically less join input at scale. Money through
  // DECIMAL(18,2) as everywhere.
  def q121BloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    graft.operators.BloomJoin.prunedSemiJoin(
        Tables.orders(spark, dir), col("o_custkey"), dim, col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val q121Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_price
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_grouping_sets"   -> (q58GroupingSets _),
    "q59_fuzzy_lev"       -> (q59FuzzyLevenshtein _),
    "q60_regexp_extract"  -> (q60RegexpExtractAll _),
    "q61_map_funcs"       -> (q61MapFuncs _),
    "q62_date_arith"      -> (q62DateArith _),
    "q63_posexplode"      -> (q63Posexplode _),
    "q64_window_battery"  -> (q64WindowBattery _),
    "q65_string_battery"  -> (q65StringBattery _),
    "q66_shipping_priority" -> (q66ShippingPriority _),
    "q67_hash_split"      -> (q67HashSplit _),
    "q68_calendar_fill"   -> (q68CalendarFill _),
    "q77_null_fns"        -> (q77NullFns _),
    "q78_profile"         -> (q78Profile _),
    "q79_bitwise"         -> (q79Bitwise _),
    "q80_approx_aggs"     -> (q80ApproxAggs _),
    "q84_moving_avg"      -> (q84MovingAvg _),
    "q89_approx_median"   -> (q89ApproxMedian _),
    "q111_sketch_rollup"  -> (q111SketchRollup _),
    "q121_bloom_semi_join" -> (q121BloomSemiJoin _))

  val oracle: Map[String, String] = Map(
    "q58_grouping_sets"   -> q58Sql,
    "q59_fuzzy_lev"       -> q59Sql,
    "q60_regexp_extract"  -> q60Sql,
    "q61_map_funcs"       -> q61Sql,
    "q62_date_arith"      -> q62Sql,
    "q63_posexplode"      -> q63Sql,
    "q64_window_battery"  -> q64Sql,
    "q65_string_battery"  -> q65Sql,
    "q66_shipping_priority" -> q66Sql,
    "q67_hash_split"      -> q67Sql,
    "q68_calendar_fill"   -> q68Sql,
    "q77_null_fns"        -> q77Sql,
    "q78_profile"         -> q78Sql,
    "q79_bitwise"         -> q79Sql,
    "q84_moving_avg"      -> q84Sql,
    "q121_bloom_semi_join" -> q121Sql)
}
