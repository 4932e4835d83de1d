package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** Near-duplicate machinery: shingles, MinHash signatures + LSH
  * candidates, SimHash, and the exact-Jaccard scorer (SURVEY.md §5.2;
  * sketch paths have no SQL oracle so their invariants are pinned here).
  */
class NearDupSpec extends SparkSpec {

  import spark.implicits._

  test("shingles3 emits distinct consecutive 3-grams") {
    val df = Seq("a b c d", "x y", "a b c a b c a b c a b").toDF("text")
    val r = df.select(NearDup.shingles3(col("text")).as("sh"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq.empty)           // < 3 tokens
    assert(r(2).sorted == Seq("a b c", "b c a", "c a b")) // distinct
  }

  test("minhash signature has nPerms entries, stable across evaluations") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    def sig() = df.select(
      NearDup.minhashSignature(NearDup.shingles3(col("text")), 32).as("sig"))
      .as[Seq[Long]].collect()(0)
    val s1 = sig(); val s2 = sig()
    assert(s1.length == 32)
    assert(s1 == s2)
    assert(s1.forall(v => v >= 0L && v < 2147483647L))
  }

  test("native minhash signature equals the HOF fold on random hash sets") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(40)(Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong()))
    val df = rows.toDF("h")
    val r = df.select(
      NearDup.minhashSignatureFromHashes(col("h"), 32).as("native"),
      NearDup.minhashSignatureFromHashesHof(col("h"), 32).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(r.forall { case (n, h) => n == h })
  }

  test("identical docs agree on every minhash permutation") {
    val df = Seq((1L, "one two three four five six"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val sigs = df.select(
      NearDup.minhashSignature(NearDup.shingles3(col("text")), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("minhashNearDup finds exact duplicates with jaccard 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val r = NearDup.minhashNearDup(docs, col("doc_id"), col("text")).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("doc_a") == 1L && row.getAs[Long]("doc_b") == 2L)
    assert(row.getAs[Double]("jaccard") == 1.0)
    assert(row.getAs[Double]("est_jaccard") == 1.0)
  }

  test("est_jaccard reflects partial signature agreement (not always 1.0)") {
    // two near-dup docs sharing most shingles plus one unrelated: the
    // near-dup pair must surface with 0 < est_jaccard < 1 strictly —
    // a size()-based count of the zipped array would report exactly 1.0
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra trailing words here"),
      (3L, (100 to 130).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = NearDup.minhashNearDup(docs, col("doc_id"), col("text"), rowsPerBand = 4)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .collect()
    assert(r.length == 1, "near-dup pair not surfaced")
    val est = r(0).getAs[Double]("est_jaccard")
    val exact = r(0).getAs[Double]("jaccard")
    assert(est > 0.0 && est < 1.0, s"est_jaccard=$est should be strictly between 0 and 1")
    assert(exact > 0.5 && exact < 1.0)
    assert(math.abs(est - exact) < 0.35, s"sketch estimate $est too far from exact $exact")
  }

  test("ngramJaccardPairs scores overlap exactly and skips disjoint docs") {
    // doc1 shingles: {a b c, b c d}; doc2: {a b c, b c x} → jaccard 1/3.
    val docs = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val r = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text")).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("doc_a") == 1L && r(0).getAs[Long]("doc_b") == 2L)
    assert(r(0).getAs[Long]("n_shared") == 1L)
    assert(math.abs(r(0).getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-12)
  }

  test("native simhash64 equals the HOF fold") {
    val texts = Seq("the quick brown fox", "a", "", "lorem ipsum dolor sit amet " * 10)
    val df = texts.toDF("text")
    val r = df.select(NearDup.simhash64(col("text")).as("native"),
        NearDup.simhash64Hof(col("text")).as("hof"))
      .as[(Long, Long)].collect()
    assert(r.forall { case (n, h) => n == h })
  }

  test("simhash64 is deterministic; identical docs have hamming 0") {
    val df = Seq((1L, "some sample document text"), (2L, "some sample document text"),
      (3L, "completely different content"))
      .toDF("id", "text")
    val sigs = df.select(col("id"), NearDup.simhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val df2 = Seq((sigs(1L), sigs(2L)), (sigs(1L), sigs(3L))).toDF("a", "b")
    val hs = df2.select(NearDup.hamming64(col("a"), col("b"))).as[Long].collect()
    assert(hs(0) == 0L)
    assert(hs(1) > 0L)
  }

  test("near-identical docs have small hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again every day"
    val df = Seq((1L, base), (2L, base + " tail")).toDF("id", "text")
    val sigs = df.select(col("id"), NearDup.simhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    val d = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    assert(d <= 16, s"hamming distance $d too large for near-identical docs")
  }

  test("simhashNearDup surfaces identical and near-identical docs, skips unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val docs = Seq(
      (1L, base),
      (2L, base),                       // identical → hamming 0
      (3L, (1 to 20).map(i => s"unrelated$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = NearDup.simhashNearDup(docs, col("doc_id"), col("text"))
      .collect().map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"),
        x.getAs[Long]("hamming")))
    assert(r.contains((1L, 2L, 0L)))
    assert(!r.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embeddingPairs scores same-block pairs only") {
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f), "A"), (2L, Seq(1.0f, 0.0f), "A"),
      (3L, Seq(0.0f, 1.0f), "B"))
      .toDF("id", "vec", "label")
    val r = NearDup.embeddingPairs(docs, col("id"), col("vec"), col("label")).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("id_a") == 1L && r(0).getAs[Long]("id_b") == 2L)
    assert(math.abs(r(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("native hash expressions equal the HOF pipelines element-for-element") {
    // adversarial corpus: unicode, punctuation, repeats, <3 tokens, empty
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "naïve café déjà-vu ünïcode ascii mixed tokens here"),
      (3L, "a b"), (4L, ""), (5L, "x y z"),
      (6L, "dup dup dup dup dup dup"),
      (7L, "punct! marks? and, some; extras: 123 456 789"))
      .toDF("doc_id", "text")
    val cmp = docs.select(
      NearDup.shingleHashes3(col("text")).as("xx_native"),
      NearDup.shingleHashes3Hof(col("text")).as("xx_hof"),
      NearDup.shingleHashes3Md5(col("text")).as("md5_native"),
      NearDup.shingleHashes3Md5Hof(col("text")).as("md5_hof"),
      NearDup.simhash64(col("text")).as("sim_native"),
      NearDup.simhash64Hof(col("text")).as("sim_hof"),
      org.apache.spark.sql.GraftColumnBridge.column(graft.plans.Md5TokenHashesExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(
          graft.functions.TextOps.tokens(col("text"))), NearDup.P, mod63 = true))
        .as("h63_native"),
      transform(graft.functions.TextOps.tokens(col("text")),
        t => NearDup.tokenHash63(t)).as("h63_hof"),
      org.apache.spark.sql.GraftColumnBridge.column(graft.plans.PairRollExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.plans.Md5TokenHashesExpr(
              org.apache.spark.sql.GraftColumnBridge.expression(
                graft.functions.TextOps.tokens(col("text"))),
              NearDup.P, mod63 = false))),
        NearDup.P, NearDup.K)).as("pair_native"),
      {
        val th = transform(graft.functions.TextOps.tokens(col("text")),
          t => pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(NearDup.P)))
        val m = size(th) - 1
        when(size(th) >= 2,
          zip_with(slice(th, lit(1), m), slice(th, lit(2), m),
            (a, b) => pmod(a * lit(NearDup.K) + b, lit(NearDup.P))))
          .otherwise(array().cast("array<bigint>")).as("pair_hof")
      })
      .collect()
    cmp.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "xx shingles diverge")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "md5 shingles diverge")
      assert(r.getLong(4) == r.getLong(5), "simhash diverges")
      assert(r.getSeq[Long](6) == r.getSeq[Long](7), "hash63 diverges")
      assert(r.getSeq[Long](8) == r.getSeq[Long](9), "bigram pair-roll diverges")
    }
  }

  test("frequency cap bounds candidate pairs under adversarial skew, keeps true pairs") {
    // Adversarial corpus: a 60-doc boilerplate cluster (identical text —
    // every band key collides → 60²/2 candidate pairs per band uncapped)
    // plus two true near-dup pairs with distinct content. The cap must
    // (a) bound the candidate space, (b) not lose the true pairs.
    val boiler = (1 to 60).map(i =>
      (i.toLong, "all work and no play makes jack a dull boy every single day"))
    val trueA = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (102L, "the quick brown fox jumps over the lazy dog near the river bend"))
    val trueB = Seq(
      (201L, "spark partitions shuffle data across executors during wide operations"),
      (202L, "spark partitions shuffle data across executors during wide transformations"))
    val docs = (boiler ++ trueA ++ trueB).toDF("doc_id", "text")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def boilerOnly(p: (Long, Long)): Boolean = p._1 <= 60 && p._2 <= 60

    // in this corpus the ONLY >10-frequency keys are the boilerplate
    // cluster's, so the cap must remove exactly its internal pairs and
    // nothing else — for all three candidate generators
    val uncapped = pairs(NearDup.minhashNearDup(docs, col("doc_id"), col("text")))
    val capped = pairs(NearDup.minhashNearDup(docs, col("doc_id"), col("text"),
      maxBandFreq = Some(10)))
    assert(uncapped.size >= 60 * 59 / 2, "uncapped boilerplate must explode quadratically")
    assert(capped == uncapped.filterNot(boilerOnly),
      "cap must drop exactly the heavy cluster's pairs")
    assert(capped.contains((101L, 102L)) && capped.contains((201L, 202L)),
      "true near-dup pairs must survive the cap")

    val simUncapped = pairs(NearDup.simhashNearDup(docs, col("doc_id"), col("text")))
    val simCapped = pairs(NearDup.simhashNearDup(docs, col("doc_id"), col("text"),
      maxBandFreq = Some(10)))
    assert(simUncapped.count(boilerOnly) == 60 * 59 / 2)
    assert(simCapped == simUncapped.filterNot(boilerOnly))

    // one stop-shingle in >half the corpus: jaccard blocking explodes
    // without the cap, stays exact on everything else with it
    val jacUncapped = pairs(NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text")))
    val jacCapped = pairs(NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      maxShingleFreq = Some(10)))
    assert(jacUncapped.count(boilerOnly) == 60 * 59 / 2)
    assert(jacCapped == jacUncapped.filterNot(boilerOnly))
    assert(jacCapped.contains((101L, 102L)) && jacCapped.contains((201L, 202L)))
  }

  test("near-dup operators leave nothing behind in the session cache manager") {
    // The staged intermediates (shingle/signature tables) are owned by
    // the operator via localCheckpoint — NOT registered with the cache
    // manager for callers to clean up. A persist() regression here
    // would strand an entry per corpus until someone clearCache()s.
    spark.sharedState.cacheManager.clearCache()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, (1 to 20).map(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "text")
    NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text")).collect()
    NearDup.minhashNearDup(docs, col("doc_id"), col("text")).collect()
    NearDup.simhashNearDup(docs, col("doc_id"), col("text")).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "operators must own their staged blocks — no cache-manager entries may remain")
  }

  test("contaminationPairs flags planted train→test leakage, not clean docs") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training material body here")).toDF("doc_id", "text")
    val test = Seq(
      // test 10 embeds train 1's full text — the classic leaked-eval doc
      (10L, "intro words the quick brown fox jumps over the lazy dog outro"),
      (11L, "nothing in common with anything at all truly")).toDF("doc_id", "text")
    val r = NearDup.contaminationPairs(train, test, col("doc_id"), col("text"),
        minShared = 2)
      .collect()
      .map(x => (x.getAs[Long]("right_id"), x.getAs[Long]("left_id"),
        x.getAs[Long]("n_shared")))
    assert(r.map(_._1).toSet == Set(10L), s"only the leaked doc flags: ${r.toSeq}")
    assert(r.forall(_._2 == 1L), s"only train 1 is the source: ${r.toSeq}")
    // train 1 has 9 tokens → 7 shingles, all contained in test 10
    assert(r.head._3 == 7L, s"all 7 shingles shared: ${r.toSeq}")
  }

  test("contaminationReport: exact per-test-doc overlap fractions, " +
      "zero-overlap docs included, sub-3-token docs absent") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training material body here")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "intro words the quick brown fox jumps over the lazy dog outro"),
      (11L, "nothing in common with anything at all truly"),
      (12L, "two tokens")).toDF("doc_id", "text")
    val r = NearDup.contaminationReport(train, test, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 10: 12 tokens → 10 shingles, 7 of them are train-1 shingles
    // (its full 9-token text is embedded); doc 11: 8 tokens → 6
    // shingles, zero shared; doc 12: 2 tokens → no shingles, absent
    assert(r.map(_._1) == Seq(10L, 11L))
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(10L) == ((10L, 10L, 7L, 0.7)))
    assert(byId(11L) == ((11L, 6L, 0L, 0.0)),
      "clean docs must still report a zero-overlap row")
  }

  test("minhashCandidateAudit: uncapped counts grow quadratically on a " +
      "power-law cluster; the cap bounds them; audit covers the real join") {
    def corpus(n: Int) = (1 to n).map { i =>
      (i.toLong, if (i % 2 == 0)
        "all work and no play makes jack a dull boy every single day"
      else s"unique text number $i carrying its own distinct words token$i")
    }.toDF("doc_id", "text")
    def audit(df: org.apache.spark.sql.DataFrame, cap: Option[Int]) =
      NearDup.minhashCandidateAudit(df, col("doc_id"), col("text"),
        maxBandFreq = cap).collect()(0).getLong(1)

    // doubling the corpus doubles the boilerplate cluster → uncapped
    // candidates ~quadruple (the (n/2)² term dominates)
    val nocap1 = audit(corpus(200), None)
    val nocap2 = audit(corpus(400), None)
    assert(nocap2 > 3.5 * nocap1,
      s"expected ~4x growth, got $nocap1 -> $nocap2")
    // the cap drops the heavy keys: counts stay small and ~linear
    val cap1 = audit(corpus(200), Some(20))
    val cap2 = audit(corpus(400), Some(20))
    assert(cap1 < nocap1 / 10, s"cap did not bound: $cap1 vs $nocap1")
    assert(cap2 <= 3 * cap1 + 100, s"capped growth not linear: $cap1 -> $cap2")

    // the audit is an upper bound on the capped join's REAL distinct
    // pair count (per-band contributions count multi-band collisions)
    val realPairs = NearDup.minhashNearDup(corpus(200), col("doc_id"),
      col("text"), maxBandFreq = Some(20)).count()
    assert(realPairs <= cap1,
      s"audit $cap1 must bound the materialized pair count $realPairs")
  }
}
