package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Dedup, Multimodal}

/** String/JSON scalar functions, text analysis, dedup, and multimodal
  * queries — SURVEY.md §2.2 P6–P8/P15/P16, §2.4 A7/A8, plus the
  * LLM-pipeline extension surface.
  */
object ExtQueries {

  // ---------------------------------------------------------------------
  // P6/P8/P11/P1 — string scalar functions (regexp_replace README.md:379-381,
  // split+getItem README.md:388-392, concat README.md:429-432).
  def q18StringFns(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        split(col("p_name"), " ").getItem(1).as("word2"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), "ECONOMY", "ECO").as("type_abbrev"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_name")).as("name_upper"))
      .orderBy(col("p_partkey"))

  private val q18Sql =
    """SELECT p_partkey, nullif(split_part(p_name, ' ', 2), '') AS word2,
      |  p_brand || '/' || p_type AS brand_type,
      |  regexp_replace(p_type, 'ECONOMY', 'ECO') AS type_abbrev,
      |  length(p_name) AS name_len, upper(p_name) AS name_upper
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // P16 — JSON scalar extraction from events.props.
  def q19Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val q19Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // P7 — null-on-bad-cast semantics (ANSI off; README.md:383 relies on
  // this). DuckDB needs TRY_CAST for the same behavior.
  def q20TryCast(spark: SparkSession, dir: String): DataFrame =
    // Declared P7 semantics: non-numeric cast → null (SURVEY.md §4.4).
    // try_cast gives that in ANY session — mutating
    // spark.sql.ansi.enabled here would change the semantics of every
    // query built after this one in a shared session.
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        expr("try_cast(split(p_brand, '#')[1] AS BIGINT)").as("brand_num"),
        expr("try_cast(p_type AS BIGINT)").as("bad_cast"))
      .orderBy(col("p_partkey"))

  private val q20Sql =
    """SELECT p_partkey, TRY_CAST(split_part(p_brand, '#', 2) AS BIGINT) AS brand_num,
      |  TRY_CAST(p_type AS BIGINT) AS bad_cast
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // A7 — deterministic key dedup: smallest doc_id survives per
  // (lang, source) group.
  def q21DedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactByKey(Tables.documents(spark, dir),
        Seq(col("lang"), col("source")), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("lang"), col("source"))

  private val q21Sql =
    """SELECT doc_id, lang, source FROM (
      |  SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id ASC) AS rn
      |  FROM documents)
      |WHERE rn = 1 ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------------
  // A8 — normalized-text dedup: group on canonical form, keep min id.
  def q22DedupNormalized(spark: SparkSession, dir: String): DataFrame =
    Dedup.normalizedText(Tables.documents(spark, dir), col("text"), col("doc_id"))
      .orderBy(col("keep_id"))

  private val q22Sql =
    """SELECT md5(lower(trim(text))) AS norm_fp, min(doc_id) AS keep_id,
      |  count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------------
  // P15 — corpus statistics per language.
  def q23TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextOps.tokenCount(col("text"))).as("total_tokens"))
      .withColumn("avg_tokens", col("total_tokens").cast("double") / col("n_docs"))
      .orderBy(col("lang"))

  private val q23Sql =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // P15 — rule-based language ID per document.
  def q24LangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        TextOps.stopwordHits(col("text")).as("stop_hits"),
        TextOps.langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  private val q24Sql =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is'))) AS stop_hits,
      |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |            / len(string_split(text, ' ')) >= 0.05
      |       THEN 'en' ELSE 'unknown' END AS predicted_lang
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // P15 — quality scoring (length/stopword/char-volume sub-scores).
  def q25Quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextOps.qualityScore(col("text"), col("n_chars")).as("quality"))
      .orderBy(col("doc_id"))

  private val q25Sql =
    """SELECT doc_id,
      |  (least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 200.0)
      |   + least(1.0, 10.0 * CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |              / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |   + least(1.0, CAST(n_chars AS DOUBLE) / 1000.0)) / 3.0 AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // P15 — document fingerprint (md5 of normalized text).
  def q26Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val q26Sql =
    """SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // U3/P15 — generator surface: explode tokens, global top-20.
  def q27TokenExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20)

  private val q27Sql =
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // P5 — sentinel→null replacement (README.md:371) + null-aware ordering.
  def q28SentinelNull(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .na.replace("source", Map("src0" -> null))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source").asc)  // Spark: nulls first on asc

  private val q28Sql =
    """SELECT CASE WHEN source = 'src0' THEN NULL ELSE source END AS source,
      |  count(*) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY source ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // ST3 (batch form) — tumbling event-time window; the streaming variant
  // in graft.streaming uses the identical expression over readStream.
  def q29TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  private val q29Sql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Multimodal — binary payload + stub metadata decode (plumbing is real,
  // codec is a deterministic fake; see operators.Multimodal).
  def q30MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    payloads
      .select(col("doc_id") +: Multimodal.imageMetaCols(col("payload")): _*)
      .orderBy(col("doc_id"))
  }

  private val q30Sql =
    """SELECT doc_id,
      |  64 + (octet_length(encode(text)) * 31) % 512 AS width,
      |  64 + (octet_length(encode(text)) * 17) % 512 AS height,
      |  3 AS channels,
      |  1 + octet_length(encode(text)) % 30 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Multimodal — deterministic frame sampling over binary payloads: the
  // explode/generator shape a video frame extractor produces. Offsets
  // are pure stride arithmetic → fully oracle-checked.
  def q82FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Tables.documents(spark, dir).filter(col("doc_id") < 30)
          .select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload", stride = 64)
      .orderBy(col("doc_id"), col("frame_offset"))

  private val q82Sql =
    """SELECT doc_id,
      |  CAST(unnest(range(0, octet_length(encode(text)), 64)) AS BIGINT) AS frame_offset
      |FROM documents WHERE doc_id < 30 ORDER BY doc_id, frame_offset""".stripMargin

  // ---------------------------------------------------------------------
  // Multimodal — the mapPartitions decode path (typed per-partition
  // loop, one codec context per partition): same stub arithmetic as the
  // expression form q30, so the oracle verifies the TYPED plumbing
  // (encoders, partition iteration, schema) end to end.
  def q83DecodePartitioned(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodePartitioned(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload")
      .orderBy(col("doc_id"))

  private val q83Sql =
    """SELECT doc_id,
      |  64 + (octet_length(encode(text)) * 31) % 512 AS width,
      |  64 + (octet_length(encode(text)) * 17) % 512 AS height,
      |  3 AS channels,
      |  1 + octet_length(encode(text)) % 30 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] J5 — as-of join: for each purchase, the most recent click
  // at-or-before it by the same user. Single-shuffle union+window form
  // (operators.AsOf); DuckDB verifies with its native ASOF JOIN.
  def q38AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // right side unique per (user_id, ts): keep the max event_id
    val clicks = operators.Ranking.topPerGroup(
      events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      Seq(col("user_id"), col("ts")), Seq(col("event_id").desc), 1)
      .withColumnRenamed("event_id", "click_id")
      .withColumnRenamed("value", "click_value")
    operators.AsOf.joinAsOf(purchases, clicks, "user_id", "ts",
        Seq("click_id", "click_value"))
      .select(col("event_id"), col("user_id"), col("click_id"), col("click_value"))
      .orderBy(col("event_id"))
  }

  private val q38Sql =
    """WITH purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |), clicks AS (
      |  SELECT user_id, ts, event_id AS click_id, value AS click_value FROM (
      |    SELECT user_id, ts, event_id, value,
      |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'click')
      |  WHERE rn = 1
      |)
      |SELECT p.event_id, p.user_id, c.click_id, c.click_value
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] — sessionization: 30-minute-gap sessions per user, one window
  // pass (no range join), aggregated to one row per session.
  def q39Sessionize(spark: SparkSession, dir: String): DataFrame =
    operators.AsOf.sessionize(Tables.events(spark, dir),
        col("user_id"), col("ts"), gapSeconds = 1800, tieBreak = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_seq"))

  private val q39Sql =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), sess AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM marked
      |)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] J5 — range join: clicks per user in the hour before each
  // purchase. Bucketed equality join, not an inequality cross product.
  def q44RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    operators.AsOf.rangeCountJoin(purchases, clicks, "user_id", "ts",
        windowSeconds = 3600, countAs = "clicks_before")
      .select(col("event_id"), col("user_id"), col("clicks_before"))
      .orderBy(col("event_id"))
  }

  private val q44Sql =
    """SELECT p.event_id, p.user_id, count(c.ts) AS clicks_before
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |GROUP BY p.event_id, p.user_id
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] A6 — rollup: order counts/revenue at (year, month), (year),
  // and grand-total levels in one pass.
  def q40Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .withColumn("order_month", month(col("o_orderdate")).cast("long"))
      .rollup(col("order_year"), col("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy(col("order_year").asc_nulls_first, col("order_month").asc_nulls_first)

  private val q40Sql =
    """SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (order_year, order_month)
      |ORDER BY order_year ASC NULLS FIRST, order_month ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // [EXT] — pivot: event counts per user spread across event-type
  // columns (Spark .pivot with explicit values ↔ DuckDB conditional
  // aggregation; explicit value list keeps the schema static, which a
  // 100 TB plan requires — dynamic pivot needs a pre-pass collect).
  def q41Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  private val q41Sql =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_string_fns"       -> (q18StringFns _),
    "q19_json"             -> (q19Json _),
    "q20_try_cast"         -> (q20TryCast _),
    "q21_dedup_exact"      -> (q21DedupExact _),
    "q22_dedup_normalized" -> (q22DedupNormalized _),
    "q23_text_stats"       -> (q23TextStats _),
    "q24_lang_id"          -> (q24LangId _),
    "q25_quality"          -> (q25Quality _),
    "q26_fingerprint"      -> (q26Fingerprint _),
    "q27_token_explode"    -> (q27TokenExplode _),
    "q28_sentinel_null"    -> (q28SentinelNull _),
    "q29_tumbling_window"  -> (q29TumblingWindow _),
    "q30_multimodal_meta"  -> (q30MultimodalMeta _),
    "q82_frame_sample"     -> (q82FrameSample _),
    "q83_decode_partitioned" -> (q83DecodePartitioned _),
    "q38_asof_join"        -> (q38AsofJoin _),
    "q39_sessionize"       -> (q39Sessionize _),
    "q40_rollup"           -> (q40Rollup _),
    "q41_pivot"            -> (q41Pivot _),
    "q44_range_join"       -> (q44RangeJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q18_string_fns"       -> q18Sql,
    "q19_json"             -> q19Sql,
    "q20_try_cast"         -> q20Sql,
    "q21_dedup_exact"      -> q21Sql,
    "q22_dedup_normalized" -> q22Sql,
    "q23_text_stats"       -> q23Sql,
    "q24_lang_id"          -> q24Sql,
    "q25_quality"          -> q25Sql,
    "q26_fingerprint"      -> q26Sql,
    "q27_token_explode"    -> q27Sql,
    "q28_sentinel_null"    -> q28Sql,
    "q29_tumbling_window"  -> q29Sql,
    "q30_multimodal_meta"  -> q30Sql,
    "q82_frame_sample"     -> q82Sql,
    "q83_decode_partitioned" -> q83Sql,
    "q38_asof_join"        -> q38Sql,
    "q39_sessionize"       -> q39Sql,
    "q40_rollup"           -> q40Sql,
    "q41_pivot"            -> q41Sql,
    "q44_range_join"       -> q44Sql,
  )
}
