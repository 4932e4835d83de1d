package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}
import Stage.StagedOps

/** Near-duplicate detection for large text corpora — the LLM-pipeline
  * dedup family: token-shingle Jaccard (exact, blocked join), MinHash +
  * LSH banding (sketch, sub-quadratic), SimHash (single 64-bit
  * signature), and embedding-cosine pairs (blocked).
  *
  * Everything is expression-level (no UDFs): shingles via
  * transform/sequence, hashes via xxhash64, sketches via array folds.
  * Candidate generation never materializes the O(n²) pair space —
  * pairs only form through equality joins on shingles / band keys /
  * block keys, which shuffle-partition cleanly at 100 TB.
  */
object NearDup {

  /** Large prime < 2^31 for MinHash permutation arithmetic; keeps
    * a·h+b within Long range (2^31·2^31 < 2^63).
    */
  private[graft] val P = 2147483647L

  /** Fixed-seed universal-hash coefficients shared by the expression and
    * Aggregator forms of the MinHash signature — both must agree so
    * either can produce/verify the other's sketches.
    */
  private[graft] def permCoefs(nPerms: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPerms)((1L + rnd.nextLong().abs % (P - 1), rnd.nextLong().abs % P))
  }

  /** Distinct 3-gram token shingles of a text column (docs with <3
    * tokens yield an empty set).
    */
  def shingles3(text: Column): Column = {
    val t = TextOps.tokens(text)
    val m = size(t) - 2
    // zip_with over three shifted slices, NOT transform+element_at: a
    // subexpression referenced inside a lambda body is re-evaluated per
    // array element, so the element_at form re-runs split(text) for every
    // shingle (O(tokens²) per doc — measured 6× slower at sf0.1). Slice
    // arguments evaluate once per row.
    array_distinct(
      when(size(t) >= 3,
        zip_with(
          zip_with(slice(t, lit(1), m), slice(t, lit(2), m), (x, y) => concat(x, lit(" "), y)),
          slice(t, lit(3), m), (x, y) => concat(x, lit(" "), y)))
        .otherwise(array()))
  }

  /** Distinct 3-gram shingles in HASH SPACE: tokens are xxhash64'd once,
    * then each shingle hash combines three consecutive token hashes with
    * nested xxhash64 — no shingle string is ever built. Set operations
    * (distinct/intersect/union) and joins downstream run over longs
    * instead of strings. Distinctness matches [[shingles3]] up to
    * 64-bit collisions (~n²/2⁶⁵ per document — below any oracle's
    * resolution).
    *
    * Native codegen'd form ([[graft.plans.XxTokenHashesExpr]] +
    * [[graft.plans.XxShingle3Expr]]): the HOF pipeline it replaces
    * (transform + two zip_with folds + array_distinct) runs interpreted
    * per element; the fused loops cut corpus staging time ~3×
    * (differential-tested against [[shingleHashes3Hof]]).
    */
  def shingleHashes3(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.XxShingle3Expr(
      GraftColumnBridge.expression(GraftColumnBridge.column(
        graft.plans.XxTokenHashesExpr(
          GraftColumnBridge.expression(TextOps.tokens(text)))))))
  }

  /** The pre-native HOF pipeline, kept for differential testing. */
  private[graft] def shingleHashes3Hof(text: Column): Column = {
    val h = transform(TextOps.tokens(text), t => xxhash64(t))
    val m = size(h) - 2
    array_distinct(
      when(size(h) >= 3,
        zip_with(
          zip_with(slice(h, lit(1), m), slice(h, lit(2), m), (x, y) => xxhash64(x, y)),
          slice(h, lit(3), m), (x, y) => xxhash64(x, y)))
        .otherwise(array().cast("array<bigint>")))
  }

  /** Polynomial-roll constant for the cross-engine hash family. */
  private[graft] val K = 1000003L

  /** Cross-engine 3-gram shingle hashes in [0, P): md5-derived token
    * hashes combined with a polynomial roll. Every intermediate stays
    * under 2⁵² (h < P ≈ 2³¹, K ≈ 2²⁰), so strict-BIGINT engines
    * evaluate it without overflow — the property that lets a DuckDB
    * oracle replay the whole MinHash pipeline. xxhash64-based
    * [[shingleHashes3]] remains the Spark-only fast path.
    */
  def shingleHashes3Md5(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.ShingleRoll3Expr(
      GraftColumnBridge.expression(GraftColumnBridge.column(
        graft.plans.Md5TokenHashesExpr(
          GraftColumnBridge.expression(TextOps.tokens(text)), P, mod63 = false))),
      P, K))
  }

  /** The pre-native HOF pipeline, kept for differential testing: the
    * native form above replaces the per-token
    * `conv(substring(md5(t), 1, 8), 16, 10)` hex round-trip (an
    * interpreted lambda plus two string allocations per token) with one
    * fused digest loop.
    */
  private[graft] def shingleHashes3Md5Hof(text: Column): Column = {
    val th = transform(TextOps.tokens(text), t =>
      pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(P)))
    val m = size(th) - 2
    array_distinct(
      when(size(th) >= 3,
        zip_with(
          zip_with(slice(th, lit(1), m), slice(th, lit(2), m),
            (x, y) => pmod(x * lit(K) + y, lit(P))),
          slice(th, lit(3), m), (x, y) => pmod(x * lit(K) + y, lit(P))))
        .otherwise(array().cast("array<bigint>")))
  }

  /** 3-gram shingle-hash INSTANCES in token order (element i = the
    * shingle starting at token i; no distinct) — the join key the
    * span-level dup signals ([[Corpus.dupNgramStats]] /
    * [[Corpus.dupSpanStats]]) carry corpus-wide instead of n-gram
    * strings: 8 bytes/row on the wide join at 100 TB, and positions
    * survive a `posexplode`. xxhash64 family — Spark-only fast path;
    * 64-bit space, so collisions are below any oracle's resolution.
    */
  def shingleHashes3Inst(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.XxShingle3Expr(
      GraftColumnBridge.expression(GraftColumnBridge.column(
        graft.plans.XxTokenHashesExpr(
          GraftColumnBridge.expression(TextOps.tokens(text))))),
      distinct = false))
  }

  /** Cross-engine twin of [[shingleHashes3Inst]] (md5 token hashes +
    * polynomial roll in [0, P), instances in order) — the family a
    * DuckDB oracle replays. P ≈ 2³¹, so two distinct n-grams collide
    * with probability ~n²/2³² per corpus; both engines compute the
    * SAME hash, so oracle comparison is unaffected — only the signal
    * itself blurs, and only at that rate.
    */
  def shingleHashes3Md5Inst(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.ShingleRoll3Expr(
      GraftColumnBridge.expression(GraftColumnBridge.column(
        graft.plans.Md5TokenHashesExpr(
          GraftColumnBridge.expression(TextOps.tokens(text)), P, mod63 = false))),
      P, K, distinct = false))
  }

  /** Per-token md5 hashes in [0, P), in token order — the cross-engine
    * token key ([[Corpus.lmScore]]'s model space; bigram keys roll two
    * adjacent elements with K mod P). One fused digest loop
    * ([[graft.plans.Md5TokenHashesExpr]]).
    */
  private[graft] def tokenHashesMd5(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.Md5TokenHashesExpr(
      GraftColumnBridge.expression(TextOps.tokens(text)), P, mod63 = false))
  }

  /** 3-gram STRING instances in token order — the legacy text-carrying
    * key, kept for differential testing against the hash families
    * (string ≡ hashed up to hash collisions).
    */
  private[graft] def shingles3Inst(text: Column): Column = {
    val t = TextOps.tokens(text)
    val m = size(t) - 2
    when(size(t) >= 3,
      zip_with(
        zip_with(slice(t, lit(1), m), slice(t, lit(2), m),
          (x, y) => concat(x, lit(" "), y)),
        slice(t, lit(3), m),
        (x, y) => concat(x, lit(" "), y)))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact pairwise Jaccard over 3-gram shingles, blocked by shared
    * shingle: a pair is only scored if it shares ≥1 shingle, and the
    * shared-count comes out of the same equality join — no cross
    * product anywhere.
    *
    * Output: doc_a, doc_b, n_shared, n_a, n_b, jaccard.
    *
    * `maxShingleFreq`: drop blocking shingles shared by more than that
    * many docs (see [[dropHeavyKeys]]) — one stop-shingle in half the
    * corpus otherwise generates |corpus|²/8 candidate pairs on its own.
    * CHANGES SEMANTICS when set: n_shared/jaccard then count
    * non-stop-shingles only, and pairs sharing nothing else disappear
    * (the skew-safe production posture; None preserves exact Jaccard).
    */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        maxShingleFreq: Option[Int] = None): DataFrame = {
    // Shingles live in hash space end-to-end (shingleHashes3): the
    // shuffle moves 8-byte keys, the join compares longs, and no shingle
    // string is ever materialized. Collision risk at 2^-64 per pair is
    // below the oracle's resolution.
    // Staged at the ARRAY grain: the exploded join feed AND both n_sh
    // side tables derive from this one checkpoint, so the corpus is
    // tokenized+md5-shingled exactly ONCE (r17 — previously the sizes
    // broadcast re-evaluated shingleHashes3 over the whole corpus: one
    // full redundant hashing pass, 2× the map-side cost at any scale).
    val withShingles = docs
      .select(id.as("doc_id"), shingleHashes3(text).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .staged
    // Stage the exploded shingle table: it feeds BOTH sides of the
    // self-join, and without materialization each side re-tokenizes and
    // re-hashes the full corpus. ~16 bytes/shingle; at larger scale this
    // stage would be written to storage between jobs instead.
    // localCheckpoint (not persist) so the OPERATOR owns the staged
    // blocks: nothing is registered in the session cache manager for
    // callers to clean up, and the blocks free when the plan is GC'd.
    // Lazy (eager = false): MEMORY_AND_DISK blocks materialize inside
    // the first consuming action — no separate staging job, and plan
    // construction (explain/audit) stays computation-free.
    //
    // The self-join carries ONLY (doc_id, s): shingle-set sizes rejoin
    // AFTER pair counting from the doc-sized (not token-sized) side
    // table via broadcast, so the big shuffle moves two longs per row
    // and the pair aggregation groups on two keys, not four.
    val staged = withShingles
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .staged
    val exploded = maxShingleFreq.fold(staged)(dropHeavyKeys(staged, Seq("s"), _))
    val sizes = withShingles.select(col("doc_id"), col("n_sh"))
    val a = exploded.select(col("doc_id").as("doc_a"), col("s"))
    val b = exploded.select(col("doc_id").as("doc_b"), col("s"))
    a.join(b, Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("n_shared").cast("long").as("n_shared"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard pairs BETWEEN two DISJOINT corpora — the
    * incremental-curation join: an appended batch (`left`) against the
    * accumulated candidate state (`right`), never state×state (those
    * pairs are already known) and never a rescan of the old corpus
    * text pipeline beyond its shingles. Same blocked-equality shape and
    * output schema as [[ngramJaccardPairs]]; ids normalize to
    * doc_a < doc_b so downstream union with the within-batch pairs is
    * seamless. Caller guarantees disjoint id sets (asserted per pair).
    */
  def ngramJaccardPairsAcross(left: DataFrame, right: DataFrame,
                              id: Column, text: Column): DataFrame =
    ngramJaccardPairsAcrossHashed(
      left.select(id.as("id"), shingleHashes3(text).as("sh")),
      right.select(id.as("id"), shingleHashes3(text).as("sh")))

  /** [[ngramJaccardPairsAcross]] over PRE-SHINGLED sides — (id, sh)
    * with sh = the distinct shingle-hash array. The incremental-
    * curation hot path: the accumulated state stores its shingle
    * hashes, so a daily batch joins against stored 8-byte keys and
    * NEVER re-tokenizes/re-hashes the historical corpus text.
    */
  def ngramJaccardPairsAcrossHashed(left: DataFrame, right: DataFrame): DataFrame = {
    def base(df: DataFrame, n: String) = df
      .select(col("id").as(n), col("sh"))
      .withColumn(s"n_$n", size(col("sh")))
    val l = base(left, "lid")
    val r = base(right, "rid")
    // size rejoin: LEFT (the batch) broadcasts — it is the bounded
    // side; RIGHT is the accumulated state and grows without bound
    // under the daily cadence, so its sizes stay a shuffle join (AQE
    // still broadcasts it at runtime while it is actually small)
    l.select(col("lid"), explode(col("sh")).as("s"))
      .join(r.select(col("rid"), explode(col("sh")).as("s")), Seq("s"))
      .filter(col("lid") =!= col("rid"))
      .groupBy(col("lid"), col("rid"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(l.select(col("lid"), col("n_lid"))), Seq("lid"))
      .join(r.select(col("rid"), col("n_rid")), Seq("rid"))
      .select(
        least(col("lid"), col("rid")).as("doc_a"),
        greatest(col("lid"), col("rid")).as("doc_b"),
        col("n_shared").cast("long").as("n_shared"),
        when(col("lid") < col("rid"), col("n_lid")).otherwise(col("n_rid"))
          .cast("long").as("n_a"),
        when(col("lid") < col("rid"), col("n_rid")).otherwise(col("n_lid"))
          .cast("long").as("n_b"),
        (col("n_shared").cast("double") /
          (col("n_lid") + col("n_rid") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** Cross-corpus contamination pairs — the train/test DECONTAMINATION
    * primitive: for each doc in `right` (the eval/test corpus), every
    * doc in `left` (the training corpus) sharing at least `minShared`
    * distinct 3-gram shingles. Same blocked-equality-join shape as
    * [[ngramJaccardPairs]] — shingles stay in hash space end-to-end,
    * the join key is a long, and the pair space is shared-shingle pairs
    * only, never |left|·|right|. `maxShingleFreq` drops stop-shingle
    * blocks on the LEFT (big) side before the join, the same skew guard
    * with the same semantics note: capped runs count rare shared
    * shingles only.
    *
    * Output: right_id, left_id, n_shared (distinct shared shingles).
    */
  def contaminationPairs(left: DataFrame, right: DataFrame,
                         id: Column, text: Column, minShared: Int = 2,
                         maxShingleFreq: Option[Int] = None): DataFrame = {
    def shingled(df: DataFrame, n: String) = df
      .select(id.as(n), explode(shingleHashes3(text)).as("s"))
    val l = shingled(left, "left_id")
    val lf = maxShingleFreq.fold(l)(dropHeavyKeys(l, Seq("s"), _))
    shingled(right, "right_id")
      .join(lf, Seq("s"))
      .groupBy(col("right_id"), col("left_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Decontamination REPORT — the per-test-document eval-overlap number
    * papers actually cite ("x% of the doc's 3-grams were seen in
    * train"): for each test document, its distinct-shingle count, how
    * many of those shingles occur in ANY training document, and the
    * overlap fraction. Complements [[contaminationPairs]] (which names
    * the leaking train docs): this is the summary an eval gate
    * thresholds on.
    *
    * Scale shape: the train side collapses to its DISTINCT shingle-hash
    * set (8-byte keys, one hash agg — never text) and the test side
    * left-semi-joins it; no doc×doc pair space exists. Test docs with
    * zero overlap still report (n_shared = 0, pct = 0.0); docs under 3
    * tokens carry no shingles and are absent — they cannot leak an
    * n-gram. Output: (test_id, n_shingles, n_shared, overlap_pct).
    */
  def contaminationReport(train: DataFrame, test: DataFrame,
                          id: Column, text: Column): DataFrame = {
    // distinct per doc already (shingleHashes3 array_distincts); staged
    // once for its two consumers (totals + the semi-join)
    val te = test.select(id.as("test_id"),
        explode(shingleHashes3(text)).as("s"))
      .staged
    val trSet = train.select(explode(shingleHashes3(text)).as("s")).distinct()
    val shared = te.join(trSet, Seq("s"), "left_semi")
      .groupBy(col("test_id")).agg(count(lit(1)).as("n_shared"))
    te.groupBy(col("test_id")).agg(count(lit(1)).as("n_shingles"))
      .join(shared, Seq("test_id"), "left")
      .select(col("test_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("overlap_pct"))
      .orderBy(col("test_id"))
  }

  /** MinHash signature: `nPerms` universal-hash permutations
    * h_i(x) = (a_i·x + b_i) mod P over xxhash64 shingle hashes, each
    * taking the min across the doc's shingle set. Deterministic: a_i,
    * b_i derive from the fixed seed.
    */
  def minhashSignature(shingleCol: Column, nPerms: Int): Column =
    signatureFromModHashes(
      transform(shingleCol, s => pmod(xxhash64(s), lit(P))), nPerms)

  /** Signature over already-hashed shingles (the [[shingleHashes3]]
    * layout) — the codegen'd native expression
    * ([[graft.plans.MinHashSignatureExpr]]): one fused loop pair, no
    * per-element allocation, inside whole-stage codegen.
    */
  def minhashSignatureFromHashes(hashCol: Column, nPerms: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val coefs = permCoefs(nPerms)
    GraftColumnBridge.column(graft.plans.MinHashSignatureExpr(
      GraftColumnBridge.expression(hashCol),
      coefs.map(_._1).toSeq, coefs.map(_._2).toSeq))
  }

  /** The pre-native HOF fold, kept for differential testing. */
  private[graft] def minhashSignatureFromHashesHof(hashCol: Column, nPerms: Int): Column =
    signatureFromModHashes(transform(hashCol, h => pmod(h, lit(P))), nPerms)

  /** One pass over the mod-P hash set: each value folds into all nPerms
    * running minima, instead of nPerms separate transform+array_min
    * traversals (which re-hash every shingle per permutation and
    * allocate nPerms intermediate arrays per row).
    */
  private def signatureFromModHashes(modHashed: Column, nPerms: Int): Column = {
    val coefs = permCoefs(nPerms)
    val aArr = array(coefs.map(c => lit(c._1)): _*)
    val bArr = array(coefs.map(c => lit(c._2)): _*)
    val init = transform(sequence(lit(0), lit(nPerms - 1)), _ => lit(P))
    aggregate(modHashed, init, (acc, h) =>
      zip_with(acc, sequence(lit(1), lit(nPerms)), (m, i) =>
        least(m, pmod(h * element_at(aArr, i) + element_at(bArr, i), lit(P)))))
  }

  /** MinHash + LSH banding near-dup candidates, verified with exact
    * Jaccard. Bands of `rowsPerBand` signature rows hash to a band key;
    * docs sharing any band key become candidates (sub-quadratic: only
    * same-band-key pairs join). Candidates are then scored with the
    * exact shingle Jaccard.
    *
    * Output: doc_a, doc_b, est_jaccard (signature agreement), jaccard.
    */
  /** Drop band/block keys shared by more than `cap` rows — the skew
    * guard for candidate generation. A heavy key (boilerplate shared by
    * k docs) generates k²/2 candidate pairs while carrying almost no
    * signal; at 100 TB one viral template would pin the whole job on a
    * single quadratic bucket. Salting does NOT fix this — it only
    * spreads the shuffle, the pair count stays k²/2 — so the guard
    * drops the key: true near-dups of any doc in a heavy bucket still
    * meet in their other, non-degenerate keys. The heavy-key table has
    * one row per HEAVY key (tiny by construction), so the anti-join
    * broadcasts.
    */
  private def dropHeavyKeys(rows: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val heavy = rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
      .select(keys.map(col): _*)
    rows.join(broadcast(heavy), keys, "left_anti")
  }

  /** Band-key candidate ACCOUNTING — the pair count the LSH band join
    * WOULD produce, computed analytically as Σ f·(f−1)/2 over band-key
    * frequencies: an O(corpus) aggregation that never materializes a
    * pair, so it is safe to run on an adversarial corpus whose uncapped
    * candidate count is quadratic (exactly the input you need to AUDIT
    * before running the join). The optional cap drops heavy keys with
    * the same predicate [[minhashNearDup]] applies, so capped counts
    * here are the join's real candidate volume. Output: one row
    * (n_band_keys, n_candidate_pairs).
    */
  def minhashCandidateAudit(docs: DataFrame, id: Column, text: Column,
                            nPerms: Int = 32, rowsPerBand: Int = 2,
                            shingler: Column => Column = shingleHashes3,
                            maxBandFreq: Option[Int] = None): DataFrame = {
    require(nPerms % rowsPerBand == 0)
    val nBands = nPerms / rowsPerBand
    val bandSlice = slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))
    val freqs = docs
      .select(id.as("doc_id"), shingler(text).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignatureFromHashes(col("sh"), nPerms))
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_key", xxhash64(col("band"), concat_ws(",", bandSlice)))
      .groupBy(col("band_key")).agg(count(lit(1)).as("f"))
    val kept = maxBandFreq.fold(freqs)(cap => freqs.filter(col("f") <= cap))
    kept.agg(count(lit(1)).as("n_band_keys"),
      coalesce(sum((col("f") * (col("f") - 1) / 2).cast("long")), lit(0L))
        .as("n_candidate_pairs"))
  }

  def minhashNearDup(docs: DataFrame, id: Column, text: Column,
                     nPerms: Int = 32, rowsPerBand: Int = 2,
                     shingler: Column => Column = shingleHashes3,
                     portableKeys: Boolean = false,
                     maxBandFreq: Option[Int] = None): DataFrame = {
    require(nPerms % rowsPerBand == 0)
    val nBands = nPerms / rowsPerBand
    // Stage (doc_id, shingle-hash set, signature) once: it feeds the two
    // sides of the band self-join AND the two exact-Jaccard scoring
    // joins — four consumers that would otherwise each re-shingle and
    // re-sketch the full corpus. At production scale this is the
    // signature table a dedup pipeline writes to storage.
    // localCheckpoint, not persist: the operator owns the staged blocks
    // (nothing registered in the cache manager, freed on GC).
    val withSig = docs
      .select(id.as("doc_id"), shingler(text).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignatureFromHashes(col("sh"), nPerms))
      .staged
    val base = withSig.select(col("doc_id"), col("sh"))
    // Band join carries only (doc_id, sig): the shingle arrays — the wide
    // payload — never enter the nBands-way explode or the shuffle. The
    // (small) candidate pair set joins back to the shingle sets afterwards
    // for the exact Jaccard; at scale those two joins touch |pairs| rows,
    // not |corpus|·nBands.
    //
    // Band key: xxhash64 over the band's signature slice by default; the
    // portable form folds the slice arithmetically ((acc·K + v) mod P —
    // overflow-free) and joins on (band, band_key), so an external
    // oracle can reproduce the candidate set.
    val bandSlice = slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))
    val banded = withSig
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_key",
        if (portableKeys)
          aggregate(bandSlice, lit(0L), (acc, v) => pmod(acc * lit(K) + v, lit(P)))
        else
          xxhash64(col("band"), concat_ws(",", bandSlice)))
    val joinKeys = if (portableKeys) Seq("band", "band_key") else Seq("band_key")
    val capped = maxBandFreq.fold(banded)(dropHeavyKeys(banded, joinKeys, _))
    val b = capped.select((joinKeys.map(col) :+
      col("doc_id").as("doc_b")) :+ col("sig").as("sig_b"): _*)
    val cand = capped.select((joinKeys.map(col) :+
        col("doc_id").as("doc_a")) :+ col("sig").as("sig_a"): _*)
      .join(b, joinKeys)
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("doc_a", "doc_b") // collisions in several bands
      .withColumn("est_jaccard",
        // count TRUE positions: size() alone would count the whole
        // zipped array (nulls included) and always return nPerms
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / lit(nPerms.toDouble))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))
  }

  /** 64-bit SimHash over token xxhash64 values: bit k of the signature
    * is the sign of Σ_tokens (±1 by bit k of the token hash). Single
    * array fold per document.
    */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.SimHash64Expr(
      GraftColumnBridge.expression(GraftColumnBridge.column(
        graft.plans.XxTokenHashesExpr(
          GraftColumnBridge.expression(TextOps.tokens(text)))))))
  }

  /** Cross-engine 63-bit token hash: md5's first two 32-bit halves
    * packed as (A mod 2³¹)·2³² + B ∈ [0, 2⁶³) — never overflows
    * strict-BIGINT engines, so an external oracle can recompute it
    * (xxhash64 exists only in Spark).
    */
  def tokenHash63(t: Column): Column =
    pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(2147483648L)) *
      lit(4294967296L) +
      conv(substring(md5(t), 9, 8), 16, 10).cast("long")

  /** SimHash over the cross-engine [[tokenHash63]] family — same native
    * [[graft.plans.SimHash64Expr]] fold, oracle-checkable end to end.
    * Bit 63 of every token hash is 0, so signature bit 63 is always 0
    * (effective width 63 bits; the hamming/banding math is unchanged).
    */
  def simhash64Md5(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.SimHash64Expr(
      GraftColumnBridge.expression(GraftColumnBridge.column(
        graft.plans.Md5TokenHashesExpr(
          GraftColumnBridge.expression(TextOps.tokens(text)), P, mod63 = true)))))
  }

  /** The pre-native HOF fold, kept for differential testing. Note the
    * token hash is bound per token (an expression referenced in a
    * lambda body re-evaluates per element — putting xxhash64(tok)
    * inside the bit loop would hash every token 64 times).
    */
  private[graft] def simhash64Hof(text: Column): Column = {
    val th = transform(TextOps.tokens(text), t => xxhash64(t))
    val votes = aggregate(
      th,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)), (a, k) =>
        a + when(call_function("shiftright", h, k).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, k) =>
        when(v > 0, call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dup pairs: band each 64-bit signature into `nBands`
    * equal-width keys; by pigeonhole, any pair within hamming distance
    * nBands−1 of each other shares at least one exact band, so the
    * equality join on (band, key) finds all such pairs without a cross
    * product. Pairs are then filtered to `maxHamming` (≤ nBands−1
    * keeps the pigeonhole guarantee; larger values trade recall).
    * More bands widen the guarantee but narrow the keys (64/nBands
    * bits), so collision-driven candidate volume grows — 4×16-bit fits
    * text SimHash (hamming ≤ 3), 8×8-bit fits perceptual image hashes
    * (hamming ≤ 7, [[Multimodal.imageNearDup]]).
    *
    * Output: doc_a, doc_b, hamming.
    */
  def simhashNearDup(docs: DataFrame, id: Column, text: Column,
                     maxHamming: Int = 3,
                     signature: Column => Column = simhash64,
                     maxBandFreq: Option[Int] = None,
                     nBands: Int = 4): DataFrame = {
    require(nBands > 0 && 64 % nBands == 0, "nBands must divide 64")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val signed = docs
      .select(id.as("doc_id"), signature(text).as("sig"))
      // feeds both sides of the band self-join; localCheckpoint so the
      // operator owns the blocks (no cache-manager entry to clean up)
      .staged
    val banded = signed
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_key",
        call_function("shiftright", col("sig"), col("band") * width)
          .bitwiseAND(lit(mask)))
    // NOTE: capping trades the pigeonhole guarantee for skew safety on
    // the heavy keys only — a pair whose every shared band is heavy is
    // missed, which for hamming ≤ 3 requires the pair to sit inside a
    // >cap-sized near-identical cluster (boilerplate by definition).
    val capped = maxBandFreq.fold(banded)(
      dropHeavyKeys(banded, Seq("band", "band_key"), _))
    val b = capped.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    capped.select(col("band"), col("band_key"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      .join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs, blocked by a coarse key (e.g. a
    * label or an LSH bucket) so only same-block pairs are scored.
    * Output: id_a, id_b, sim.
    */
  def embeddingPairs(embs: DataFrame, id: Column, vec: Column, block: Column): DataFrame = {
    val base = embs.select(id.as("vid"), VectorOps.toDoubleArray(vec).as("v"), block.as("blk"))
      .withColumn("nsq", VectorOps.normSq(col("v")))
    val a = base.select(col("blk"), col("vid").as("id_a"), col("v").as("va"), col("nsq").as("na"))
    val b = base.select(col("blk"), col("vid").as("id_b"), col("v").as("vb"), col("nsq").as("nb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", VectorOps.cosineWithNorms(col("va"), col("vb"), col("na"), col("nb")))
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
