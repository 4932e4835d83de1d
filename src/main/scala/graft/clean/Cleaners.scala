package graft.clean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleaning layer: raw wire records → typed tables, reproducing the
  * reference's cleaning semantics exactly (SURVEY.md §1.2, §7.5).
  *
  * Each cleaner is a pure DataFrame => DataFrame so it composes
  * identically under batch (`spark.read`) and Structured Streaming
  * (`spark.readStream`) — the streaming path reuses these functions
  * unchanged.
  *
  * Preserved reference quirks (decision log SURVEY.md §7.5):
  *  - sentinel strings are replaced only on EXACT match (README.md:371),
  *    including the mangled `"N,o, ,T,a,g,s…"` value;
  *  - follower_count uses LITERAL substring replacement `k`→`000`,
  *    `M`→`000000` then int cast, so `"2.5k"` → `"2.5000"` → 2 (the
  *    non-ANSI decimal-string cast truncates toward zero,
  *    README.md:379-383) — wrong-looking but the reference's computable
  *    semantic;
  *  - user_name is null-propagating `concat` (one null name ⇒ null,
  *    README.md:429-432), NOT concat_ws.
  */
object Cleaners {

  /** Sentinel values the reference maps to null across all columns
    * (reference README.md:371).
    */
  val Sentinels: Seq[String] = Seq(
    "No Title Data Available",
    "No description available Story format",
    "User Info Error",
    "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
    "Image src error.")

  /** Raw pin → cleaned pin (SURVEY.md §1.2 table 1). */
  def pin(raw: DataFrame): DataFrame = {
    val stringCols = raw.schema.fields.filter(_.dataType.typeName == "string").map(_.name)
    raw
      .na.replace(stringCols, Sentinels.map(_ -> null).toMap[String, String])
      .withColumn("follower_count",
        regexp_replace(regexp_replace(col("follower_count"), "k", "000"), "M", "000000")
          .cast("int"))
      .withColumn("downloaded", col("downloaded").cast("int"))
      .withColumn("save_location", split(col("save_location"), " ").getItem(3))
      .withColumnRenamed("index", "ind")
      .withColumn("ind", col("ind").cast("int"))
      .select("ind", "unique_id", "title", "description", "poster_name",
        "follower_count", "tag_list", "is_image_or_video", "image_src",
        "downloaded", "save_location", "category")
  }

  /** Raw geo → cleaned geo: (latitude, longitude) → coordinates array,
    * string timestamp → TimestampType (UTC session).
    */
  def geo(raw: DataFrame): DataFrame =
    raw
      .withColumn("coordinates", array(col("latitude"), col("longitude")))
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
      .withColumn("ind", col("ind").cast("int"))
      .select("ind", "country", "coordinates", "timestamp")

  /** Raw user → cleaned user: first+last → user_name (null-propagating),
    * string date_joined → TimestampType.
    */
  def user(raw: DataFrame): DataFrame =
    raw
      .withColumn("user_name", concat(col("first_name"), col("last_name")))
      .withColumn("date_joined", col("date_joined").cast("timestamp"))
      .withColumn("ind", col("ind").cast("int"))
      .withColumn("age", col("age").cast("int"))
      .select("ind", "user_name", "age", "date_joined")
}
