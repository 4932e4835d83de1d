package graft.clean

import org.apache.spark.sql.types._

/** Declared schemas for the three reference record streams (SURVEY.md
  * §1.2; raw field lists from the reference's
  * user_posting_emulation_streaming.py:77,86,95).
  *
  * The reference infers schemas from JSON (README.md:344-348); this
  * engine declares them — inference is an extra full pass over the data
  * and non-deterministic in type widths, both unacceptable at 100 TB.
  */
object Schemas {

  /** Raw pin record as it appears on the wire. */
  val rawPin: StructType = StructType(Seq(
    StructField("index", LongType),
    StructField("unique_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("poster_name", StringType),
    StructField("follower_count", StringType), // "142" | "25k" | "3M" | sentinel
    StructField("tag_list", StringType),
    StructField("is_image_or_video", StringType),
    StructField("image_src", StringType),
    StructField("downloaded", LongType),
    StructField("save_location", StringType),  // "Local save in /data/<cat>"
    StructField("category", StringType)))

  /** Raw geolocation record. */
  val rawGeo: StructType = StructType(Seq(
    StructField("ind", LongType),
    StructField("country", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timestamp", StringType)))     // "yyyy-MM-dd HH:mm:ss"

  /** Raw user record. */
  val rawUser: StructType = StructType(Seq(
    StructField("ind", LongType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("age", LongType),
    StructField("date_joined", StringType)))   // "yyyy-MM-dd HH:mm:ss"

  /** Cleaned pin schema (post-Cleaners.pin). */
  val pin: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("unique_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("poster_name", StringType),
    StructField("follower_count", IntegerType),
    StructField("tag_list", StringType),
    StructField("is_image_or_video", StringType),
    StructField("image_src", StringType),
    StructField("downloaded", IntegerType),
    StructField("save_location", StringType),
    StructField("category", StringType)))

  /** Cleaned geo schema. */
  val geo: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("country", StringType),
    StructField("coordinates", ArrayType(DoubleType)),
    StructField("timestamp", TimestampType)))

  /** Cleaned user schema. */
  val user: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("user_name", StringType),
    StructField("age", IntegerType),
    StructField("date_joined", TimestampType)))
}
