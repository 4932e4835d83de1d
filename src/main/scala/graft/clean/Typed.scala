package graft.clean

import org.apache.spark.sql.{DataFrame, Dataset}

/** Cleaned-record case classes + typed views (SURVEY.md §1.2
  * "Dataset[RawPin] → Dataset[Pin]"): the cleaning layer's output bound
  * to compile-time types. `.as[T]` is plan-level only — the Encoder
  * checks names/types at analysis and deserializes lazily — so the
  * typed view costs nothing until a typed lambda actually runs, and the
  * relational ops stay whole-stage-codegen'd.
  *
  * Nullable cleaned columns (sentinel → null, SURVEY.md §1.2) are
  * Options; a non-Option field on a nullable column would silently read
  * null as 0/"" under the encoder, so the types pin the null contract.
  */
case class Pin(
    ind: Int,
    unique_id: String,
    title: Option[String],
    description: Option[String],
    poster_name: Option[String],
    follower_count: Option[Int],
    tag_list: Option[String],
    is_image_or_video: String,
    image_src: Option[String],
    downloaded: Int,
    save_location: Option[String],
    category: String)

case class Geo(
    ind: Int,
    country: String,
    coordinates: Seq[Double],
    timestamp: java.sql.Timestamp)

case class User(
    ind: Int,
    user_name: Option[String],
    age: Int,
    date_joined: java.sql.Timestamp)

object Typed {

  def pin(cleaned: DataFrame): Dataset[Pin] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned.as[Pin]
  }

  def geo(cleaned: DataFrame): Dataset[Geo] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned.as[Geo]
  }

  def user(cleaned: DataFrame): Dataset[User] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned.as[User]
  }
}
