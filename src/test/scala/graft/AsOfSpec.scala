package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** As-of join and sessionization semantics on hand-computed fixtures. */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("joinAsOf attaches the most recent right row at or before each left ts") {
    val left = Seq(
      (1L, 100L, t("2024-01-01 10:00:00")),
      (2L, 100L, t("2024-01-01 12:00:00")),
      (3L, 200L, t("2024-01-01 09:00:00"))) // user 200 has no click before
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, t("2024-01-01 09:30:00"), 11L, 1.5),
      (100L, t("2024-01-01 11:00:00"), 12L, 2.5),
      (200L, t("2024-01-01 09:30:00"), 13L, 3.5)) // after left's 09:00
      .toDF("user_id", "ts", "click_id", "click_value")
    val r = AsOf.joinAsOf(left, right, "user_id", "ts", Seq("click_id", "click_value"))
      .orderBy("event_id").collect()
    assert(r(0).getAs[Long]("click_id") == 11L)     // 10:00 → 09:30 click
    assert(r(1).getAs[Long]("click_id") == 12L)     // 12:00 → 11:00 click
    assert(r(2).isNullAt(r(2).fieldIndex("click_id"))) // nothing at/before 09:00
    assert(r(0).getAs[Double]("click_value") == 1.5)
  }

  test("joinAsOf includes a right row at exactly the left timestamp") {
    val left = Seq((1L, 7L, t("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, t("2024-01-01 10:00:00"), 99L, 1.0))
      .toDF("user_id", "ts", "click_id", "click_value")
    val r = AsOf.joinAsOf(left, right, "user_id", "ts", Seq("click_id", "click_value"))
      .collect()(0)
    assert(r.getAs[Long]("click_id") == 99L)
  }

  test("joinAsOf keeps value columns from ONE right row when some are null") {
    // most recent click has a null value: the result must be (12, null),
    // never a stitched (12, 1.5) from two different right rows
    val left = Seq((1L, 5L, t("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, t("2024-01-01 10:00:00"), Some(11L), Some(1.5)),
      (5L, t("2024-01-01 11:00:00"), Some(12L), Option.empty[Double]))
      .toDF("user_id", "ts", "click_id", "click_value")
    val r = AsOf.joinAsOf(left, right, "user_id", "ts", Seq("click_id", "click_value"))
      .collect()(0)
    assert(r.getAs[Long]("click_id") == 12L)
    assert(r.isNullAt(r.fieldIndex("click_value")),
      "click_value stitched from an older right row")
  }

  test("sessionize splits on gaps over the threshold only") {
    val df = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (2L, 10L, t("2024-01-01 10:10:00")),  // 10 min gap, same session
      (3L, 10L, t("2024-01-01 11:30:00")),  // 80 min gap → new session
      (4L, 10L, t("2024-01-01 11:40:00")),
      (5L, 20L, t("2024-01-01 10:00:00")))  // other user: own numbering
      .toDF("event_id", "user_id", "ts")
    val r = AsOf.sessionize(df, col("user_id"), col("ts"), gapSeconds = 1800,
        tieBreak = Seq(col("event_id")))
      .orderBy("event_id")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("rangeCountJoin counts rows in [ts-window, ts) with zero-match rows kept") {
    val purchases = Seq(
      (1L, 9L, t("2024-01-01 12:00:00")),
      (2L, 9L, t("2024-01-01 18:00:00")),   // no clicks near
      (3L, 8L, t("2024-01-01 12:00:00")))   // other user
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (9L, t("2024-01-01 11:00:00")),  // exactly window start → included
      (9L, t("2024-01-01 11:30:00")),  // in window
      (9L, t("2024-01-01 12:00:00")),  // at ts → excluded (half-open)
      (9L, t("2024-01-01 10:59:59")),  // before window
      (8L, t("2024-01-01 11:45:00")))
      .toDF("user_id", "ts")
    val r = AsOf.rangeCountJoin(purchases, clicks, "user_id", "ts", 3600)
      .orderBy("event_id")
      .select("event_id", "n_in_range").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 2L -> 0L, 3L -> 1L))
  }

  test("rangeCountJoin keeps duplicate left rows as separate output rows") {
    val left = Seq((9L, t("2024-01-01 12:00:00")), (9L, t("2024-01-01 12:00:00")))
      .toDF("user_id", "ts")
    val right = Seq((9L, t("2024-01-01 11:30:00"))).toDF("user_id", "ts")
    val r = AsOf.rangeCountJoin(left, right, "user_id", "ts", 3600)
      .select("n_in_range").as[Long].collect()
    assert(r.toSeq == Seq(1L, 1L)) // not one row with count 2
  }

  test("joinAsOf: null keys never match (SQL equality semantics)") {
    val left = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null, t("2024-01-01 12:00:00"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
    val right = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, t("2024-01-01 10:00:00"), 11L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("click_id", org.apache.spark.sql.types.LongType))))
    val r = AsOf.joinAsOf(left, right, "user_id", "ts", Seq("click_id")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("click_id")),
      "null-key left row received values from a null-key right row")
  }

  test("sessionize boundary: a gap of exactly the threshold stays in-session") {
    val df = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (2L, 1L, t("2024-01-01 10:30:00")))  // exactly 1800s
      .toDF("event_id", "user_id", "ts")
    val r = AsOf.sessionize(df, col("user_id"), col("ts"), 1800, Seq(col("event_id")))
      .select("session_seq").as[Long].collect()
    assert(r.toSeq == Seq(1L, 1L))
  }
}
