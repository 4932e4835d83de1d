package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Text-analysis scalar functions (SURVEY.md §2.2 P15). */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("tokenCount counts whitespace tokens") {
    val r = Seq("one two three", "solo").toDF("text")
      .select(TextOps.tokenCount(col("text"))).as[Long].collect()
    assert(r.toSeq == Seq(3L, 1L))
  }

  test("bpeishTokenCount splits on non-alphanumeric runs") {
    val r = Seq("don't stop-me now2day", "  ").toDF("text")
      .select(TextOps.bpeishTokenCount(col("text"))).as[Long].collect()
    assert(r.toSeq == Seq(5L, 0L)) // don, t, stop, me, now2day
  }

  test("stopwordHits counts exact stopword tokens") {
    val r = Seq("the cat of the hat", "no stop words here").toDF("text")
      .select(TextOps.stopwordHits(col("text"))).as[Long].collect()
    assert(r.toSeq == Seq(3L, 0L))
  }

  test("langId thresholds on stopword ratio") {
    val en = "the cat sat on the mat and the dog barked in the yard"
    val other = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val r = Seq(en, other).toDF("text")
      .select(TextOps.langId(col("text"))).as[String].collect()
    assert(r.toSeq == Seq("en", "unknown"))
  }

  test("qualityScore is in [0,1] and rewards longer stopword-bearing text") {
    val good = ("the quick brown fox of the meadow " * 40).trim
    val bad = "x"
    val df = Seq((good, good.length), (bad, bad.length)).toDF("text", "n_chars")
    val r = df.select(TextOps.qualityScore(col("text"), col("n_chars")))
      .as[Double].collect()
    assert(r.forall(s => s >= 0.0 && s <= 1.0))
    assert(r(0) > r(1))
  }

  test("rollingFingerprint: deterministic, order-sensitive, normalization-invariant") {
    val df = Seq("alpha beta gamma", "gamma beta alpha", "Alpha Beta Gamma  ")
      .toDF("text")
    val r = df.select(TextOps.rollingFingerprint(col("text"))).as[Long].collect()
    assert(r(0) != r(1))   // order matters (unlike a set hash)
    assert(r(0) == r(2))   // case/trim-normalized
    val again = df.select(TextOps.rollingFingerprint(col("text"))).as[Long].collect()
    assert(r.toSeq == again.toSeq)
  }

  test("fingerprint: 16 hex chars, normalization-invariant, content-sensitive") {
    val r = Seq("Hello World", "  hello world ", "different").toDF("text")
      .select(TextOps.fingerprint(col("text"))).as[String].collect()
    assert(r(0).matches("[0-9a-f]{16}"))
    assert(r(0) == r(1))
    assert(r(0) != r(2))
  }
}
