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

  test("TopKAggregator equals the window top-k, with duplicate measures tie-broken") {
    val rnd = new scala.util.Random(7)
    // duplicate measures on purpose: the id tie-break must decide
    val rows = (0 until 300).map(i =>
      (s"g${i % 5}", (rnd.nextInt(40) * 0.5), i.toLong))
    val df = rows.toDF("g", "m", "id").repartition(13)
    val viaWindow = graft.operators.Ranking
      .topPerGroup(df, Seq(col("g")), Seq(col("m").desc, col("id").asc), 4)
      .select("g", "m", "id").as[(String, Double, Long)].collect().toSet
    val topk = udaf(new graft.functions.TopKAggregator(4))
    val viaAgg = df.groupBy(col("g"))
      .agg(topk(col("m"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t")("_1").as("m"), col("t")("_2").as("id"))
      .as[(String, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow,
      s"aggregator diverged: ${viaAgg.diff(viaWindow)} / ${viaWindow.diff(viaAgg)}")
    // buffer bound holds at every stage by construction: reduce and
    // merge both trim to k — a buffer can never exceed k entries
    val a = new graft.functions.TopKAggregator(4)
    val big = (0 until 100).foldLeft(a.zero)((b, i) => a.reduce(b, (i * 1.0, i.toLong)))
    assert(big.size == 4)
    assert(a.merge(big, big).size == 4)
    // k larger than the group: every row surfaces, still rank-ordered
    val tiny = Seq(("g", 1.0, 1L), ("g", 3.0, 2L)).toDF("g", "m", "id")
    val wide = udaf(new graft.functions.TopKAggregator(10))
    val all10 = tiny.groupBy(col("g"))
      .agg(wide(col("m"), col("id")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t")("_1")).as[Double].collect().toSeq
    assert(all10 == Seq(3.0, 1.0))
  }

  test("TopKAggregator at k=1000: binary insert, no quadratic blowup, exact result") {
    // 50k driver-side reduces at k=1000 in ascending order — the worst
    // case for the insert path (every row displaces the buffer head).
    // The sortWith-per-row form re-sorted 1000 entries 50k times; the
    // binary-insert form must stay well under a second.
    val a = new graft.functions.TopKAggregator(1000)
    val n = 50000
    val t0 = System.nanoTime()
    val buf = (0 until n).foldLeft(a.zero)((b, i) => a.reduce(b, (i.toDouble, i.toLong)))
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(buf.size == 1000)
    // exact: top 1000 of ascending measures = n-1 down to n-1000
    assert(buf.head == ((n - 1).toDouble, (n - 1).toLong))
    assert(buf.last == ((n - 1000).toDouble, (n - 1000).toLong))
    assert(buf == buf.sortBy(p => (-p._1, p._2)), "buffer lost its sort invariant")
    assert(elapsed < 5.0, s"k=1000 insert path took ${elapsed}s — quadratic regression")
    // merge of two disjoint sorted runs interleaves exactly
    val odd = (1 until 4001 by 2).map(i => (i.toDouble, i.toLong)).reverse
    val even = (0 until 4000 by 2).map(i => (i.toDouble, i.toLong)).reverse
    val m = a.merge(odd, even)
    assert(m.size == 1000)
    assert(m == (3000 until 4000).map(i => (i.toDouble, i.toLong)).reverse)
  }
}
