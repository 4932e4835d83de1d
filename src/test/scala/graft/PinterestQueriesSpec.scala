package graft

import org.apache.spark.sql.Row
import graft.clean.{Cleaners, Schemas}
import graft.queries.PinterestQueries

/** Reference-parity golden tests (SURVEY.md §5.2 layer 4): the five
  * README queries over a hand-computed fixture in deterministic declared
  * form (§7.3).
  */
class PinterestQueriesSpec extends SparkSpec {

  // 6 pins: categories art(×3: us,us,pe), diy(×2: us,us), travel(×1: pe)
  private lazy val pin = Cleaners.pin(spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "u1", "t", "d", "Ada", "100", "x", "image", "i", 1L, "Local save in /data/art", "art"),
      Row(2L, "u2", "t", "d", "Ada", "250k", "x", "image", "i", 1L, "Local save in /data/art", "art"),
      Row(3L, "u3", "t", "d", "Bob", "2M", "x", "image", "i", 1L, "Local save in /data/art", "art"),
      Row(4L, "u4", "t", "d", "Bob", "50", "x", "image", "i", 1L, "Local save in /data/diy", "diy"),
      Row(5L, "u5", "t", "d", "Cyd", "75", "x", "image", "i", 1L, "Local save in /data/diy", "diy"),
      Row(6L, "u6", "t", "d", "Cyd", "9", "x", "image", "i", 1L, "Local save in /data/travel", "travel")),
    Schemas.rawPin))

  // us: pins 1,2,4,5 (2018); pe: pins 3,6 (2019)
  private lazy val geo = Cleaners.geo(spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "United States", 1.0, 2.0, "2018-01-01 00:00:00"),
      Row(2L, "United States", 1.0, 2.0, "2018-06-01 00:00:00"),
      Row(3L, "Peru", 1.0, 2.0, "2019-01-01 00:00:00"),
      Row(4L, "United States", 1.0, 2.0, "2018-01-01 00:00:00"),
      Row(5L, "United States", 1.0, 2.0, "2018-01-01 00:00:00"),
      Row(6L, "Peru", 1.0, 2.0, "2019-06-01 00:00:00")),
    Schemas.rawGeo))

  // ages: 20 (18-24, pins 1,2), 30 (25-35, pins 3,4), 40 (36-50, pins 5,6)
  private lazy val user = Cleaners.user(spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "Ann", "One", 20L, "2015-01-01 00:00:00"),
      Row(2L, "Ben", "Two", 20L, "2015-06-01 00:00:00"),
      Row(3L, "Cat", "Three", 30L, "2016-01-01 00:00:00"),
      Row(4L, "Dan", "Four", 30L, "2016-06-01 00:00:00"),
      Row(5L, "Eve", "Five", 40L, "2017-01-01 00:00:00"),
      Row(6L, "Fay", "Six", 40L, "2015-03-01 00:00:00")),
    Schemas.rawUser))

  test("Q1: top category per country, ties break lexicographically") {
    // us: art 2, diy 2 → tie → art; pe: art 1, travel 1 → tie → art
    val r = PinterestQueries.topCategoryByCountry(pin, geo)
      .orderBy("country").collect()
    assert(r.map(x => (x.getAs[String]("country"), x.getAs[String]("category"),
      x.getAs[Long]("category_count"))).toSeq ==
      Seq(("Peru", "art", 1L), ("United States", "art", 2L)))
  }

  test("Q2: top category per post year") {
    // 2018: art 2 vs diy 2 → art; 2019: art 1 vs travel 1 → art
    val r = PinterestQueries.topCategoryByYear(pin, geo)
      .orderBy("post_year").collect()
    assert(r.map(x => (x.getAs[Int]("post_year"), x.getAs[String]("category"))).toSeq ==
      Seq((2018, "art"), (2019, "art")))
  }

  test("Q3a: top follower USER (user_name, not pin poster_name) per country") {
    // The fixture's pin poster_names (Ada/Bob/Cyd) DIVERGE from the
    // cleaned user_names (AnnOne..FaySix), so this proves the USER
    // column drives the answer (reference README.md:517).
    // us: AnnOne 100, BenTwo 250000, DanFour 50, EveFive 75 → BenTwo
    // pe: CatThree 2000000, FaySix 9 → CatThree
    val r = PinterestQueries.topFollowersByCountry(pin, geo, user)
      .orderBy("country").collect()
    assert(r.map(x => (x.getAs[String]("country"), x.getAs[String]("poster_name"),
      x.getAs[Int]("follower_count"))).toSeq ==
      Seq(("Peru", "CatThree", 2000000), ("United States", "BenTwo", 250000)))
  }

  test("Q3a: ties break to the smallest user_name") {
    // Two US users (AnnOne, BenTwo) with the same max follower count
    // (100) → AnnOne wins, independent of input order.
    val tiedPin = Cleaners.pin(spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "u1", "t", "d", "Zed", "100", "x", "image", "i", 1L, "Local save in /data/art", "art"),
        Row(2L, "u2", "t", "d", "Abe", "100", "x", "image", "i", 1L, "Local save in /data/art", "art")),
      Schemas.rawPin))
    val tiedGeo = Cleaners.geo(spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "United States", 1.0, 2.0, "2018-01-01 00:00:00"),
        Row(2L, "United States", 1.0, 2.0, "2018-06-01 00:00:00")),
      Schemas.rawGeo))
    val r = PinterestQueries.topFollowersByCountry(tiedPin, tiedGeo, user).collect()
    assert(r.map(x => (x.getAs[String]("country"), x.getAs[String]("poster_name"),
      x.getAs[Int]("follower_count"))).toSeq ==
      Seq(("United States", "AnnOne", 100)))
  }

  test("Q3b: overall top country by its best poster") {
    val r = PinterestQueries.topFollowersOverall(pin, geo, user).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("country") == "Peru")
    assert(r(0).getAs[Int]("follower_count") == 2000000)
  }

  test("Q4: top category per age range") {
    // 18-24 (pins 1,2): art 2 → art
    // 25-35 (pins 3,4): art 1, diy 1 → tie → art
    // 36-50 (pins 5,6): diy 1, travel 1 → tie → diy
    val r = PinterestQueries.topCategoryByAgeRange(pin, user)
      .orderBy("age_group").collect()
    assert(r.map(x => (x.getAs[String]("age_group"), x.getAs[String]("category"))).toSeq ==
      Seq(("18-24", "art"), ("25-35", "art"), ("36-50", "diy")))
  }

  test("Q5: users joined per year over the user table alone") {
    val r = PinterestQueries.usersJoinedPerYear(user).collect()
    assert(r.map(x => (x.getAs[Int]("join_year"), x.getAs[Long]("number_users_joined"))).toSeq ==
      Seq((2015, 3L), (2016, 2L), (2017, 1L)))
  }
}
