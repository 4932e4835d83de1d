package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAggregator
import graft.operators.{NearDup, Skew}

/** Skew utilities and the typed MinHash Aggregator (SURVEY.md §2.9 U2,
  * §7.4 skew posture).
  */
class SkewAggSpec extends SparkSpec {

  import spark.implicits._

  private def skewed = {
    // key "hot" carries 90% of rows
    (1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k${i % 10}", i))
  }.toDF("k", "v")

  test("saltedJoin returns exactly the rows of the plain inner join") {
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "Z"))
      .toDF("k", "tag")
    val plain = skewed.join(small, Seq("k"), "inner")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(skewed, small, "k", nSalts = 8)
      .select("k", "v", "tag")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("count"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedCount(skewed, Seq(col("k")), nSalts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == plain)
  }

  test("saltedCount supports expression keys with matching output names") {
    val df = Seq(("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 2),
      ("2024-01-02 10:00:00", 3)).toDF("ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val plain = df.groupBy(col("ts").cast("date")).count()
      .orderBy(col("count")).collect().map(_.toSeq).toSeq
    val salted = Skew.saltedCount(df, Seq(col("ts").cast("date")), nSalts = 4)
      .orderBy(col("count")).collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(Skew.saltedCount(df, Seq(col("ts").cast("date")), 4).columns.toSeq ==
      df.groupBy(col("ts").cast("date")).count().columns.toSeq)
  }

  test("salt operators reject non-positive nSalts") {
    intercept[IllegalArgumentException] {
      Skew.saltedCount(skewed, Seq(col("k")), 0)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, skewed, "k", -1)
    }
  }

  test("MinHashAggregator over exploded hashes equals the expression signature") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "a b")) // < 3 tokens → no shingles → no exploded rows
      .toDF("doc_id", "text")

    val nPerms = 16
    val viaExpr = docs
      .select(col("doc_id"), NearDup.shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        NearDup.minhashSignature(col("sh"), nPerms).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    val minhashUdaf = udaf(new MinHashAggregator(nPerms))
    val viaAgg = docs
      .select(col("doc_id"), explode(NearDup.shingles3(col("text"))).as("s"))
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(NearDup.P)).as("h"))
      .groupBy("doc_id")
      .agg(minhashUdaf(col("h")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(viaAgg.keySet == Set(1L, 2L)) // doc 3 has no shingles
    assert(viaAgg(1L) == viaExpr(1L))
    assert(viaAgg(2L) == viaExpr(2L))
  }

  test("MinHashAggregator merge is order-insensitive (partial aggregation safe)") {
    val agg = new MinHashAggregator(8)
    val hashes = Seq(17L, 993L, 5L, 123456L, 42L)
    val all = hashes.foldLeft(agg.zero)(agg.reduce)
    val (h1, h2) = hashes.splitAt(2)
    val merged = agg.merge(h1.foldLeft(agg.zero)(agg.reduce),
                           h2.foldLeft(agg.zero)(agg.reduce))
    assert(all.toSeq == merged.toSeq)
  }
}
