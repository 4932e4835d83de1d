package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE training/encoding vs a plain-Scala reference implementation that
  * operates on symbol LISTS (no string tricks) — the differential that
  * catches any boundary bug in the delimited-replace encoding.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // Reference BPE: symbol vectors, greedy left-to-right non-overlapping
  // merge, argmax (count desc, lhs asc, rhs asc).
  private def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var segs = words.keysIterator.map(w => w -> w.split("").toVector).toMap
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- segs; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + words(w)
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        merges += ((step, l, r, n))
        segs = segs.map { case (w, s) => w -> mergeOnce(s, l, r) }
      }
    }
    (merges.toSeq, segs)
  }

  private def gotMerges(docs: org.apache.spark.sql.DataFrame, k: Int) =
    Bpe.train(docs, col("text"), k).orderBy(col("step"))
      .as[(Int, String, String, Long)].collect().toSeq

  test("train reproduces the hand-computed merge sequence") {
    // words: abc ×3, abd ×1 → (a,b):4 wins, then (ab,c):3, then (ab,d):1
    val docs = Seq((1L, "abc abc abc abd")).toDF("doc_id", "text")
    assert(gotMerges(docs, 3) == Seq(
      (1, "a", "b", 4L), (2, "ab", "c", 3L), (3, "ab", "d", 1L)))
  }

  test("a merged pair chains like the reference: aaaa → aa·aa, aaa → aa·a") {
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    // step 1: (a,a) appears 3+2 = 5 times (overlapping counts)
    val m = gotMerges(docs, 2)
    assert(m.head == ((1, "a", "a", 5L)))
    // after the merge: aaaa = [aa, aa] (pair (aa,aa) ×1), aaa = [aa, a]
    // (pair (aa,a) ×1) → tie broken lexicographically: (aa,a) < (aa,aa)
    assert(m(1) == ((2, "aa", "a", 1L)))
  }

  test("boundary anchors: a symbol ENDING in the pair's lhs is never split") {
    // Train on a corpus where the naive "l␁r" replace corrupts: after
    // (a,b) and (x,ab), the word xabc is [xab, c]; when (ab,c) merges
    // (learned from abc words) the substring "ab␁c" occurs inside
    // "xab␁c" but must NOT fire — [xab, c] has no (ab, c) pair.
    val docs = Seq((1L,
      ("ab " * 10) + ("xab " * 6) + ("abc " * 4) + "xabc")).toDF("doc_id", "text")
    val words = Map("ab" -> 10L, "xab" -> 6L, "abc" -> 4L, "xabc" -> 1L)
    val (refM, refSegs) = refTrain(words, 4)
    assert(gotMerges(docs, 4) == refM)
    // and the encoded token counts agree with the reference segmentation
    val counts = Bpe.tokenCounts(docs, col("doc_id"), col("text"),
        Bpe.train(docs, col("text"), 4))
      .as[(Long, Long, Long)].collect().head
    val refTok = words.map { case (w, n) => refSegs(w).size * n }.sum
    assert(counts == ((1L, 21L, refTok)))
  }

  test("train + encode ≡ the reference implementation on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val (refM, refSegs) = refTrain(words, 8)
    val merges = Bpe.train(docs, col("text"), 8)
    assert(gotMerges(docs, 8) == refM)
    val got = Bpe.encodeTypes(Bpe.wordTypes(docs, col("text")), merges)
      .select(col("word"), col("n_sym"))
      .as[(String, Long)].collect().toMap
    assert(got == refSegs.map { case (w, s) => w -> s.size.toLong })
  }

  test("vocab: deterministic ids, occurrence counts conserve the token total") {
    // abc ×3 + abd: after (a,b) and (ab,c), segs are [abc]×3, [ab, d]
    val docs = Seq((1L, "abc abc abc abd")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, col("text"), 2)
    val v = Bpe.vocab(docs, col("text"), merges)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(v == Seq(("abc", 3L, 0), ("ab", 1L, 1), ("d", 1L, 2)))

    // on the real corpus: Σ n_occ over the vocab = Σ n_tok over docs
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val m8 = Bpe.train(corpus, col("text"), 8)
    val vocabTotal = Bpe.vocab(corpus, col("text"), m8)
      .agg(sum(col("n_occ"))).as[Long].collect().head
    val docTotal = Bpe.tokenCounts(corpus, col("doc_id"), col("text"), m8)
      .agg(sum(col("n_tok"))).as[Long].collect().head
    assert(vocabTotal == docTotal, "vocab counts must conserve the corpus token total")
  }

  test("encodeIds: subwords partition each word; the id stream covers every token") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, col("text"), 6)
    val vocab = Bpe.vocab(docs, col("text"), merges)
    val sample = docs.filter(col("doc_id") < 5)
    val ids = Bpe.encodeIds(sample, col("doc_id"), col("text"), merges, vocab)
      .as[(Long, Int, Int, String, Int)].collect()

    // subwords concatenate back to the original word at every position
    val byWordPos = ids.groupBy(r => (r._1, r._2))
    val texts = sample.select("doc_id", "text").as[(Long, String)].collect().toMap
    byWordPos.foreach { case ((doc, wp), rows) =>
      val word = texts(doc).split(" ")(wp)
      val joined = rows.sortBy(_._3).map(_._4).mkString
      assert(joined == word, s"doc $doc word $wp: '$joined' != '$word'")
    }
    // one id per BPE token: stream length per doc = tokenCounts' n_tok
    val nTok = Bpe.tokenCounts(sample, col("doc_id"), col("text"), merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    ids.groupBy(_._1).foreach { case (doc, rows) =>
      assert(rows.length.toLong == nTok(doc))
    }
    // ids are exactly the vocab's (no unknown-token gaps on the
    // training corpus itself)
    val vmap = vocab.as[(String, Long, Int)].collect()
      .map(v => v._1 -> v._3).toMap
    assert(ids.forall(r => vmap(r._4) == r._5))
  }

  test("a corpus word carrying U+0001 (the segmentation delimiter) is " +
      "dropped instead of corrupting merges") {
    val clean = Seq((1L, "abc abc abc abd")).toDF("doc_id", "text")
    // doc 2 words each contain the raw delimiter byte; letting one
    // through would hand the win to a phantom high-count pair
    val dirty = Seq((1L, "abc abc abc abd"),
      (2L, ("a\u0001b " * 5).trim)).toDF("doc_id", "text")
    assert(gotMerges(dirty, 3) == gotMerges(clean, 3),
      "control-byte words must not reach the pair counts")
  }

  test("vocabulary exhaustion: train returns fewer than k merges") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // step 1 merges (a,b); afterwards every word is one symbol — no
    // pair left, steps 2..4 yield nothing
    assert(gotMerges(docs, 4) == Seq((1, "a", "b", 2L)))
  }

  test("training is layout-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(gotMerges(docs, 5) == gotMerges(docs.repartition(7), 5))
  }

  test("byte-level BPE: non-ASCII and control bytes segment with no OOV; " +
      "merges match the symbol-list reference over byte symbols") {
    // café (é = 2 bytes), a snowman (3 bytes), and a word CARRYING the
    // U+0001 delimiter — char-level wordTypes drops the last one;
    // byte-level represents all three
    val docs = Seq((1L,
      "caf\u00e9 caf\u00e9 caf\u00e9 \u2603x \u2603x a\u0001b")).toDF("doc_id", "text")
    def toSyms(w: String): String =
      w.getBytes("UTF-8").map(b => Bpe.ByteToUnicode(b & 0xff).toChar).mkString
    // every word survives into the byte-level type table, mapped
    val types = Bpe.wordTypesByteLevel(docs, col("text"))
      .as[(String, Long)].collect().toMap
    assert(types == Map(toSyms("caf\u00e9") -> 3L, toSyms("\u2603x") -> 2L,
      toSyms("a\u0001b") -> 1L), s"got $types")
    // the merge sequence equals the plain-Scala reference run over the
    // byte-symbol words (same refTrain as the char-level differential)
    val words = Map(toSyms("caf\u00e9") -> 3L, toSyms("\u2603x") -> 2L,
      toSyms("a\u0001b") -> 1L)
    val (refM, refSegs) = refTrain(words, 5)
    assert(Bpe.trainByteLevel(docs, col("text"), 5).orderBy(col("step"))
      .as[(Int, String, String, Long)].collect().toSeq == refM)
    // encoding the byte-level types with the learned merges reproduces
    // the reference segmentation sizes — nothing is unrepresentable
    val enc = Bpe.encodeTypes(Bpe.wordTypesByteLevel(docs, col("text")),
        Bpe.trainByteLevel(docs, col("text"), 5))
      .select(col("word"), col("n_sym")).as[(String, Long)].collect().toMap
    assert(enc == refSegs.map { case (w, segs) => w -> segs.size.toLong })

    // the whole trainer surface runs in byte mode: vocab counts conserve
    // the corpus token total, and the id streams partition every word
    val merges = Bpe.trainByteLevel(docs, col("text"), 5)
    val vocabB = Bpe.vocab(docs, col("text"), merges, byteLevel = true)
    val vocabTotal = vocabB.agg(sum(col("n_occ"))).as[Long].head()
    val counts = Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges,
      byteLevel = true).as[(Long, Long, Long)].collect().head
    assert(counts._2 == 6L, "all six words must join the byte-level types")
    assert(vocabTotal == counts._3,
      s"vocab occurrences $vocabTotal != doc token total ${counts._3}")
    val ids = Bpe.encodeIds(docs, col("doc_id"), col("text"), merges,
      vocabB, byteLevel = true)
      .as[(Long, Int, Int, String, Int)].collect()
    assert(ids.length.toLong == counts._3)
    // subwords concatenate back to the byte-symbol word at each position
    val wordsInDoc = "caf\u00e9 caf\u00e9 caf\u00e9 \u2603x \u2603x a\u0001b"
      .split(" ").map(toSyms)
    ids.groupBy(_._2).foreach { case (wp, rows) =>
      assert(rows.sortBy(_._3).map(_._4).mkString == wordsInDoc(wp),
        s"word $wp subwords do not reassemble")
    }
  }

  test("persisted BPE model: probe ≡ inline, retrain bumps the version " +
      "and asOf pins the old tokenizer, wedged model refuses") {
    val docs = Seq((1L, "abc abc abc abd abd ax")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    val v0 = Bpe.buildBpeModel(docs, col("text"), k = 2, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "word_pos", "sym_pos", "tok", "tok_id")
        .as[(Long, Int, Int, String, Int)].collect().sortBy(r => (r._2, r._3)).toSeq
    val inline = {
      val m = Bpe.train(docs, col("text"), 2)
      rows(Bpe.encodeIds(docs, col("doc_id"), col("text"), m,
        Bpe.vocab(docs, col("text"), m)))
    }
    assert(rows(Bpe.encodeIdsWithModel(spark, dir, docs, col("doc_id"),
      col("text"))) == inline, "model probe must equal the inline pipeline")

    // retrain on a grown corpus: new version, different merges; the old
    // tokenizer stays reproducible under asOf (id streams pinned)
    val grown = docs.unionByName(
      Seq((2L, "zz zz zz zz zz zz zz zz")).toDF("doc_id", "text"))
    val v1 = Bpe.buildBpeModel(grown, col("text"), k = 2, dir)
    assert(v1 == v0 + 1)
    assert(rows(Bpe.encodeIdsWithModel(spark, dir, docs, col("doc_id"),
      col("text"), asOf = Some(v0))) == inline)
    assert(rows(Bpe.encodeIdsWithModel(spark, dir, docs, col("doc_id"),
      col("text"))) != inline, "the retrained tokenizer must differ")
    // counts agree with the encode stream under the same model
    val nTok = Bpe.tokenCountsWithModel(spark, dir, docs, col("doc_id"),
      col("text"), asOf = Some(v0)).select("n_tok").as[Long].head()
    assert(nTok == inline.size.toLong)

    // a crash between the two commits wedges loudly; asOf still reads
    graft.sources.Versioned.overwrite(
      graft.sources.Versioned.read(spark, s"$dir/merges").localCheckpoint(),
      s"$dir/merges"): Unit
    val ex = intercept[IllegalArgumentException] {
      Bpe.encodeIdsWithModel(spark, dir, docs, col("doc_id"), col("text"))
    }
    assert(ex.getMessage.contains("out of lockstep"))
    assert(rows(Bpe.encodeIdsWithModel(spark, dir, docs, col("doc_id"),
      col("text"), asOf = Some(v0))) == inline)
  }

  test("persisted byte_level flag guards the encode alphabet: mismatch " +
      "fails loudly both directions; a pre-flag model reads char-level " +
      "only") {
    val docs = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    def causes(e: Throwable) = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")

    // char-level model probed as byte-level → loud failure, and the
    // reverse — silent acceptance would apply merges to the wrong
    // alphabet and drop unknown toks in the vocab join
    val charDir = java.nio.file.Files.createTempDirectory("bpe_flag_c").toString
    Bpe.buildBpeModel(docs, col("text"), k = 2, charDir): Unit
    val exC = intercept[Exception] {
      Bpe.encodeIdsWithModel(spark, charDir, docs, col("doc_id"),
        col("text"), byteLevel = true).collect()
    }
    assert(causes(exC).contains("byte_level"))

    val byteDir = java.nio.file.Files.createTempDirectory("bpe_flag_b").toString
    Bpe.buildBpeModel(docs, col("text"), k = 2, byteDir, byteLevel = true): Unit
    val exB = intercept[Exception] {
      Bpe.tokenCountsWithModel(spark, byteDir, docs, col("doc_id"),
        col("text"), byteLevel = false).collect()
    }
    assert(causes(exB).contains("byte_level"))
    // matching flag reads fine
    assert(Bpe.tokenCountsWithModel(spark, byteDir, docs, col("doc_id"),
      col("text"), byteLevel = true).count() == 1)

    // legacy model (persisted before the flag): char-level reads work,
    // byte-level gets a rebuild message instead of unverifiable output
    val legacy = java.nio.file.Files.createTempDirectory("bpe_flag_l").toString
    Bpe.buildBpeModel(docs, col("text"), k = 2, legacy): Unit
    val stripped = graft.sources.Versioned.read(spark, s"$legacy/merges")
      .drop("byte_level").localCheckpoint()
    graft.sources.Versioned.overwrite(stripped, s"$legacy/merges"): Unit
    graft.sources.Versioned.overwrite(
      graft.sources.Versioned.read(spark, s"$legacy/vocab").localCheckpoint(),
      s"$legacy/vocab"): Unit
    assert(Bpe.tokenCountsWithModel(spark, legacy, docs, col("doc_id"),
      col("text")).count() == 1)
    val exL = intercept[IllegalArgumentException] {
      Bpe.tokenCountsWithModel(spark, legacy, docs, col("doc_id"),
        col("text"), byteLevel = true)
    }
    assert(exL.getMessage.contains("predates"))
  }

  test("decodeIds inverts encodeIds exactly — repeated words, repeated " +
      "symbols, single chars; a byteLevel flag mismatch fails loudly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "lower lowest low low"),
      (2L, "a bb a bb ccc"),
      (3L, "x"),
      (4L, "newer newest new lower"))
      .toDF("doc_id", "text")
    val mdl = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    Bpe.buildBpeModel(docs, col("text"), k = 5, mdl): Unit
    val ids = Bpe.encodeIdsWithModel(spark, mdl, docs, col("doc_id"),
      col("text"))
    val got = Bpe.decodeIdsWithModel(spark, mdl, ids)
      .as[(Long, String)].collect().toMap
    val want = docs.as[(Long, String)].collect().toMap
    assert(got == want, "decode(encode(x)) must equal x")
    // the round-trip survives a retrain when the encode is pinned
    Bpe.buildBpeModel(docs.limit(2), col("text"), k = 2, mdl): Unit
    val pinnedIds = Bpe.encodeIdsWithModel(spark, mdl, docs, col("doc_id"),
      col("text"), asOf = Some(0L))
    assert(Bpe.decodeIdsWithModel(spark, mdl, pinnedIds, asOf = Some(0L))
      .as[(Long, String)].collect().toMap == want)
    // decoding a char-level model with byteLevel = true must fail via
    // the persisted-flag guard (silent acceptance would run the byte
    // inverse over char symbols and emit garbage)
    def causes(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    val ex = intercept[Exception] {
      Bpe.decodeIdsWithModel(spark, mdl, ids, byteLevel = true).collect()
    }
    assert(causes(ex).contains("byte_level"))
  }

  test("byte-level decode inverts byte-level encode exactly — non-ASCII, " +
      "emoji, control bytes, inputs the char-level table must drop") {
    import spark.implicits._
    // U+0001 in a word is unrepresentable char-level (it IS the
    // segmentation delimiter — wordTypes drops it); byte-level must
    // round-trip it byte-identically, along with multi-byte codepoints
    // (é = 2 bytes, 日 = 3, 🦓 = 4 incl. surrogates) and mixes
    val ctrl = "a\u0001b"
    val docs = Seq(
      (1L, "café résumé café"),
      (2L, "日本語 データ 日本語"),
      (3L, "zebra 🦓 emoji 🦓🦓 mix"),
      (4L, ctrl + " plain " + ctrl),
      (5L, "ascii only words here"))
      .toDF("doc_id", "text")
    val mdl = java.nio.file.Files.createTempDirectory("bpe_brt").toString
    Bpe.buildBpeModel(docs, col("text"), k = 6, mdl, byteLevel = true): Unit
    val ids = Bpe.encodeIdsWithModel(spark, mdl, docs, col("doc_id"),
      col("text"), byteLevel = true)
    val got = Bpe.decodeIdsWithModel(spark, mdl, ids, byteLevel = true)
      .as[(Long, String)].collect().toMap
    val want = docs.as[(Long, String)].collect().toMap
    assert(got == want, "byte-level decode(encode(x)) must equal x " +
      "byte-for-byte on every alphabet")
    // and the char-level model genuinely DISAGREES on this corpus: the
    // control-byte word never makes it into its type table, so the two
    // alphabets are not interchangeable here
    val charMdl = java.nio.file.Files.createTempDirectory("bpe_crt").toString
    Bpe.buildBpeModel(docs, col("text"), k = 6, charMdl): Unit
    val charIds = Bpe.encodeIdsWithModel(spark, charMdl, docs,
      col("doc_id"), col("text"))
    val charGot = Bpe.decodeIdsWithModel(spark, charMdl, charIds)
      .as[(Long, String)].collect().toMap
    assert(charGot(4L) != want(4L),
      "char-level must lose the control-byte word (else this test is vacuous)")
    assert(charGot(1L) == want(1L), "plain non-ASCII still round-trips char-level")
  }
}
