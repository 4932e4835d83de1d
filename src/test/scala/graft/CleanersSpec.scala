package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.clean.{Cleaners, Schemas}

/** Cleaning-layer semantics pinned per SURVEY.md §5.2 layer 1: sentinel
  * replacement is exact-match only, follower_count literal k/M expansion
  * (including the "2.5k" → null quirk preserved from the reference),
  * save_location token extraction, null-propagating user_name concat.
  */
class CleanersSpec extends SparkSpec {

  private def rawPinRow(followerCount: String = "142",
                        title: String = "t",
                        saveLocation: String = "Local save in /data/art",
                        posterName: String = "Ada"): Row =
    Row(7L, "uid-7", title, "desc", posterName, followerCount, "a,b",
      "image", "http://x/1.jpg", 1L, saveLocation, "art")

  private def cleanOne(row: Row) = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row), Schemas.rawPin)
    Cleaners.pin(df).collect()(0)
  }

  test("follower_count: plain number casts") {
    assert(cleanOne(rawPinRow("142")).getAs[Int]("follower_count") == 142)
  }

  test("follower_count: k expands to thousands") {
    assert(cleanOne(rawPinRow("25k")).getAs[Int]("follower_count") == 25000)
  }

  test("follower_count: M expands to millions") {
    assert(cleanOne(rawPinRow("3M")).getAs[Int]("follower_count") == 3000000)
  }

  test("follower_count: decimal '2.5k' truncates to 2 (preserved reference quirk)") {
    // "2.5k" → "2.5000" → non-ANSI int cast truncates toward zero → 2,
    // NOT 2500: the literal k→"000" substitution plus Spark's
    // decimal-string truncation is the reference's computable semantic
    // (SURVEY.md §7.5) — wrong-looking but preserved exactly.
    assert(cleanOne(rawPinRow("2.5k")).getAs[Int]("follower_count") == 2)
  }

  test("follower_count: sentinel 'User Info Error' becomes null") {
    val r = cleanOne(rawPinRow("User Info Error"))
    assert(r.isNullAt(r.fieldIndex("follower_count")))
  }

  test("sentinels replaced only on exact match") {
    val exact = cleanOne(rawPinRow(title = "No Title Data Available"))
    assert(exact.isNullAt(exact.fieldIndex("title")))
    val partial = cleanOne(rawPinRow(title = "No Title Data Available!"))
    assert(partial.getAs[String]("title") == "No Title Data Available!")
  }

  test("mangled tag_list sentinel nulls out") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "u", "t", "d", "p", "1", "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
          "image", "i", 0L, "Local save in /data/x", "c")),
      Schemas.rawPin)
    val r = Cleaners.pin(df).collect()(0)
    assert(r.isNullAt(r.fieldIndex("tag_list")))
  }

  test("save_location keeps only the path token") {
    assert(cleanOne(rawPinRow()).getAs[String]("save_location") == "/data/art")
  }

  test("save_location with fewer than 4 tokens yields null") {
    val r = cleanOne(rawPinRow(saveLocation = "Local save"))
    assert(r.isNullAt(r.fieldIndex("save_location")))
  }

  test("index renamed to ind and cast to int") {
    val r = cleanOne(rawPinRow())
    assert(r.getAs[Int]("ind") == 7)
    assert(Cleaners.pin(spark.createDataFrame(
      java.util.Arrays.asList(rawPinRow()), Schemas.rawPin)).schema("ind").dataType == IntegerType)
  }

  test("geo: coordinates array of [latitude, longitude], timestamp cast") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, "Peru", -12.05, -77.04, "2021-06-01 10:30:00")),
      Schemas.rawGeo)
    val r = Cleaners.geo(df).collect()(0)
    assert(r.getSeq[Double](r.fieldIndex("coordinates")).toSeq == Seq(-12.05, -77.04))
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant ==
      java.time.Instant.parse("2021-06-01T10:30:00Z"))
  }

  test("geo: malformed timestamp string becomes null (ANSI off)") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, "Peru", 0.0, 0.0, "not-a-time")),
      Schemas.rawGeo)
    val r = Cleaners.geo(df).collect()(0)
    assert(r.isNullAt(r.fieldIndex("timestamp")))
  }

  test("user: user_name concatenates without separator") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "Dylan", "Holmes", 32L, "2016-10-23 14:06:51")),
      Schemas.rawUser)
    assert(Cleaners.user(df).collect()(0).getAs[String]("user_name") == "DylanHolmes")
  }

  test("user: null first_name propagates to null user_name (concat, not concat_ws)") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null, "Holmes", 32L, "2016-10-23 14:06:51")),
      Schemas.rawUser)
    val r = Cleaners.user(df).collect()(0)
    assert(r.isNullAt(r.fieldIndex("user_name")))
  }

  test("cleaned schemas match the declared StructTypes") {
    val pin = Cleaners.pin(spark.createDataFrame(
      java.util.Arrays.asList(rawPinRow()), Schemas.rawPin))
    assert(pin.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.pin.fields.map(f => (f.name, f.dataType)).toSeq)
    val geo = Cleaners.geo(spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "X", 0.0, 0.0, "2020-01-01 00:00:00")), Schemas.rawGeo))
    assert(geo.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.geo.fields.map(f => (f.name, f.dataType)).toSeq)
    val user = Cleaners.user(spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "A", "B", 20L, "2020-01-01 00:00:00")), Schemas.rawUser))
    assert(user.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.user.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("typed Dataset views bind cleaned output to case classes") {
    import graft.clean.{Typed, Pin}
    val work = java.nio.file.Files.createTempDirectory("graft-typed").toString
    graft.sources.Emulator.write(work, n = 200, seed = 61L)
    val pins = Typed.pin(Cleaners.pin(
      graft.sources.Sources.json(spark, s"$work/pin", Schemas.rawPin)))
    // typed lambdas compile against the case class and see real nulls
    // as None (Option fields pin the nullability contract)
    val noTitle = pins.filter((p: Pin) => p.title.isEmpty).count()
    val viaSql  = pins.toDF().filter(org.apache.spark.sql.functions.col("title").isNull).count()
    assert(noTitle == viaSql)
    val geos = Typed.geo(Cleaners.geo(
      graft.sources.Sources.json(spark, s"$work/geo", Schemas.rawGeo)))
    assert(geos.head().coordinates.length == 2)
    val users = Typed.user(Cleaners.user(
      graft.sources.Sources.json(spark, s"$work/user", Schemas.rawUser)))
    assert(users.count() == 200)
  }

  test("jsonInferred: the exploration opt-in reads the emulator output " +
      "with a usable inferred schema; declared-schema read stays the norm") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val work = java.nio.file.Files.createTempDirectory("graft-infer").toString
    graft.sources.Emulator.write(work, n = 50, seed = 19L)
    val inferred = graft.sources.Sources.jsonInferred(spark, s"$work/pin")
    assert(inferred.count() == 50)
    // inference finds the reference's columns (types are its guesses —
    // numbers widen to long/double, which is exactly why production
    // paths declare schemas instead)
    val cols = inferred.columns.toSet
    assert(Set("index", "unique_id", "title", "follower_count").subsetOf(cols),
      s"inferred columns missing expected fields: $cols")
    // the declared-schema read of the same files agrees on the row set
    val declared = graft.sources.Sources.json(spark, s"$work/pin", Schemas.rawPin)
    assert(declared.select("unique_id").as[String].collect().sorted.toSeq ==
      inferred.select(col("unique_id").cast("string")).as[String]
        .collect().sorted.toSeq)
  }
}
