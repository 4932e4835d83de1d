package graft

import org.apache.spark.sql.functions._

/** Spot-check specs for the battery queries whose primary verification
  * is the DuckDB oracle hash-match (q60/q62/q65/q66/q77/q78/q79): each
  * asserts the semantic core against an independently computed value,
  * so a regression fails fast in sbt test without the oracle harness.
  */
class BatterySpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q60 regexp counts match a driver-side regex over the same docs") {
    val got = WideQueries.q60RegexpExtractAll(spark, dir)
      .select("doc_id", "n_matches").as[(Long, Long)].collect().toMap
    val texts = Tables.documents(spark, dir).filter(col("doc_id") < 100)
      .select("doc_id", "text").as[(Long, String)].collect()
    val re = "[a-z]+e".r
    texts.foreach { case (id, t) =>
      assert(got(id) == re.findAllIn(t).length.toLong, s"doc $id")
    }
  }

  test("q62 date arithmetic reconciles: n_within_30 <= n and due > order date range") {
    val r = WideQueries.q62DateArith(spark, dir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_within_30") <= row.getAs[Long]("n"))
      assert(row.getAs[Double]("avg_ship_days") >= 0.0)
    }
    assert(r.map(_.getAs[Long]("n")).sum == Tables.lineitem(spark, dir).count())
  }

  test("q65 string battery agrees with JVM string ops") {
    val r = WideQueries.q65StringBattery(spark, dir).collect()
    val names = Tables.customer(spark, dir).filter(col("c_custkey") <= 200)
      .select("c_custkey", "c_name").as[(Long, String)].collect().toMap
    r.foreach { row =>
      val name = names(row.getAs[Long]("c_custkey"))
      assert(row.getAs[String]("padded") ==
        ("*" * math.max(0, 25 - name.length)) + name.takeRight(25))
      assert(row.getAs[String]("rev") == name.reverse)
      assert(row.getAs[Long]("pos1") == (name.indexOf('1') + 1).toLong)
      assert(row.getAs[Long]("first_code") == name.head.toLong)
      assert(row.getAs[String]("last3") == name.takeRight(3))
    }
  }

  test("q66 top-10 revenues are the global maxima of the filtered join") {
    val r = WideQueries.q66ShippingPriority(spark, dir)
      .select("revenue").as[Double].collect()
    assert(r.length <= 10)
    assert(r.sorted.reverse.toSeq == r.toSeq, "rows must arrive revenue-desc")
    // recompute the same aggregate without the limit; top-10 must match
    val cutoff = lit("1997-01-01").cast("timestamp")
    val full = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .select("revenue").as[Double].collect().sorted.reverse.take(r.length)
    assert(r.toSeq == full.toSeq)
  }

  test("q77 null semantics: nullif hits exactly the BUILDING rows") {
    val r = WideQueries.q77NullFns(spark, dir).collect()
    r.foreach { row =>
      val isNullSeg = row.isNullAt(row.fieldIndex("seg_or_null"))
      assert(isNullSeg == (row.getAs[String]("seg_filled") == "FALLBACK"))
      assert((row.getAs[String]("seg_flag") == "none") == isNullSeg)
    }
    assert(r.exists(_.isNullAt(1)), "fixture must contain BUILDING customers")
  }

  test("q78 profile reconciles with direct per-column aggregates") {
    val r = WideQueries.q78Profile(spark, dir).collect()
      .map(x => x.getAs[String]("col_name") -> x).toMap
    val customer = Tables.customer(spark, dir)
    val n = customer.count()
    assert(r("c_custkey").getAs[Long]("n_vals") == n)
    assert(r("c_custkey").getAs[Long]("n_nulls") == 0L)
    assert(r("c_custkey").getAs[Long]("n_distinct") == n)
    assert(r("c_mktsegment").getAs[Long]("n_distinct") ==
      customer.select("c_mktsegment").distinct().count())
    assert(r("c_custkey").getAs[String]("min_val") == "0")
  }

  test("q79 bitwise aggregates match a driver-side fold") {
    val r = WideQueries.q79Bitwise(spark, dir).collect()
      .map(x => x.getAs[String]("o_orderstatus") ->
        (x.getAs[Long]("and_all"), x.getAs[Long]("or_all"), x.getAs[Long]("xor_all"))).toMap
    val keys = Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderkey").as[(String, Long)].collect()
    keys.groupBy(_._1).foreach { case (status, rows) =>
      val ks = rows.map(_._2)
      assert(r(status) == (ks.reduce(_ & _), ks.reduce(_ | _), ks.reduce(_ ^ _)), status)
    }
  }
}
