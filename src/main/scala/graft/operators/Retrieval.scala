package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Versioned

/** Okapi BM25 full-text retrieval — the lexical half of a retrieval
  * stack (the embedding half is [[Similarity]]). Classic search-engine
  * ranking (Robertson & Spärck Jones's probabilistic relevance
  * framework; the BM25 form from TREC-3, 1994): for query terms T and
  * document d,
  *
  *   score(d) = Σ_{t∈T} idf(t) · tf(t,d)·(k1+1) /
  *                       (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *
  * with the standard smoothed idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
  * (always positive, unlike the raw log-odds form). k1 = 1.2, b = 0.75
  * are the published defaults.
  *
  * Everything here is deterministic and SQL-replayable: tf/df/dl/N are
  * exact integers off hash aggregations, the per-term score is one fixed
  * double expression over them, and the per-document sum rides
  * DECIMAL(27,10) so it is order-independent (the [[Corpus.lmScore]]
  * discipline — a plain double sum would depend on partitioning).
  *
  * Scale shape (100 TB corpus, ad-hoc query): the inline form
  * ([[bm25TopK]]) pays one corpus pass — tokens explode map-side and the
  * non-query tokens are FILTERED INSIDE the same codegen stage, so the
  * only shuffle carries (doc_id, dl, tok, tf) for the query terms alone;
  * df is |T| rows; the final ranking is TakeOrderedAndProject. The
  * query-many path is the persisted inverted index
  * ([[buildBm25Index]] / [[queryBm25Index]]): build once, and each query
  * touches only the postings rows of its terms (predicate pushdown on
  * the token column; bucket the postings by token on a real cluster) —
  * document length is DENORMALIZED INTO the postings row exactly so a
  * probe never joins a corpus-sized doc-length table.
  */
object Retrieval {

  /** Published Okapi defaults. */
  val K1: Double = 1.2
  val B: Double  = 0.75

  /** (doc_id, dl, tok, tf) for the query terms only, plus the 1-row
    * corpus stats (n_docs, sum_dl). The stats ride a broadcast cross
    * join; the token filter runs inside the scan's codegen stage.
    */
  private def tfAndStats(docs: DataFrame, id: Column, text: Column,
                         terms: Seq[String]): (DataFrame, DataFrame) = {
    val base = docs.select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isInCollection(terms))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    (tf, stats)
  }

  /** The per-(doc, term) BM25 contribution over columns tf, dl, df,
    * n_docs, sum_dl — ONE formula shared by every scoring path (inline,
    * single-query index, multi-query index), so the paths provably
    * score identically. */
  private def bmTermExpr(k1: Double, b: Double): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    idf * (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * dld / avgdl))
  }

  private def scoreDocs(tf: DataFrame, stats: DataFrame,
                        k1: Double, b: Double): DataFrame = {
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(dfTab, Seq("tok"))
      .crossJoin(stats) // 1 row — broadcast nested loop by construction
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
           sum(bmTermExpr(k1, b).cast("decimal(27,10)")).as("s"))
      .select(col("doc_id"), col("n_terms"), col("s").cast("double").as("score"))
  }

  /** BM25 scores for every document matching ≥1 query term.
    * Output: doc_id, n_terms (distinct query terms present), score.
    */
  def bm25Scores(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
                 k1: Double = K1, b: Double = B): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val (tf, stats) = tfAndStats(docs, id, text, terms)
    // tf feeds BOTH the scoring join and the df derivation — stage it
    // (it is query-term-sized: ≤ |T| rows per matching doc) so the
    // second consumer does not replay the corpus explode lineage. The
    // index path passes its tf through UNstaged: there the input is
    // already a token-pruned postings scan, and re-reading that beats
    // hiding the parquet pushdown behind a checkpoint.
    scoreDocs(tf.localCheckpoint(eager = false), stats, k1, b)
  }

  /** Top-k BM25 search (score desc, doc_id asc — a total order). */
  def bm25TopK(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
               k: Int, k1: Double = K1, b: Double = B): DataFrame =
    bm25Scores(docs, id, text, terms, k1, b)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  // -------------------------------------------------------------------
  // Persisted inverted index — build once, query many (the persisted-
  // ANN-index / NB-model discipline applied to lexical search).

  /** POSITIONAL postings off a (doc_id, dl, toks) base: one row per
    * (tok, doc) with tf, the denormalized doc length, and the sorted
    * 1-based position list — the Lucene posting shape that makes
    * phrase queries index-only. Shared by build and append.
    */
  private def postingsOf(base: DataFrame): DataFrame = base
    .select(col("doc_id"), col("dl"), posexplode(col("toks")))
    .groupBy(col("col").as("tok"), col("doc_id"), col("dl"))
    .agg(count(lit(1)).as("tf"),
         sort_array(collect_list(col("pos") + 1)).as("positions"))
    .select(col("tok"), col("doc_id"), col("tf"), col("dl"), col("positions"))

  /** Build the inverted index: `postings` (tok, doc_id, tf, dl,
    * positions — doc length denormalized into the row, 1-based sorted
    * position list for phrase queries) + 1-row `stats` (n_docs,
    * sum_dl), two lockstep [[Versioned]] tables. One corpus pass.
    *
    * Postings commit BUCKETED BY TOKEN ([[Versioned.overwriteBucketed]])
    * — the layout half of the index: a probe's literal term filter
    * prunes whole buckets at the scan (it reads |terms| buckets' bytes,
    * not the postings table), and the df-per-token aggregation inside
    * [[queryBm25Index]] needs no Exchange because the scan already
    * arrives hash-partitioned on `tok`. `nBuckets` sizes bucket files:
    * at 100 TB pick corpus_postings_bytes / ~256 MB.
    */
  def buildBm25Index(docs: DataFrame, id: Column, text: Column,
                     indexDir: String, nBuckets: Int = 8): Long = {
    val base = docs.select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val postings = postingsOf(base)
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val vp = Versioned.overwriteBucketed(postings, s"$indexDir/postings",
      "tok", nBuckets)
    val vs = Versioned.overwrite(stats, s"$indexDir/stats")
    require(vp == vs, s"BM25 index tables diverged: postings v$vp vs stats " +
      s"v$vs (was $indexDir written by something other than buildBm25Index?)")
    vp
  }

  /** Add a batch of NEW documents to an existing index (FAISS-add /
    * daily-cadence semantics; doc_ids must be previously unseen — the
    * same append-only invariant as `Corpus.appendSignalState`). Postings
    * rows append; the 1-row stats table merges additively and commits at
    * the EXPECTED version, so a concurrent append loses cleanly and
    * retries instead of silently dropping counts.
    */
  def appendToBm25Index(batch: DataFrame, id: Column, text: Column,
                        indexDir: String): Long = {
    val spark = batch.sparkSession
    val vStats = Versioned.latestVersion(spark, s"$indexDir/stats")
    val vPost  = Versioned.latestVersion(spark, s"$indexDir/postings")
    require(vPost == vStats, s"BM25 index tables out of lockstep (postings " +
      s"v$vPost, stats v$vStats) — a build or append crashed between " +
      "commits; rebuild into a fresh directory")
    val base = batch.select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val postings = postingsOf(base)
    val delta = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val merged = Versioned.read(spark, s"$indexDir/stats", Some(vStats))
      .unionByName(delta)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    // CAS-guarded stats FIRST: of two racing appenders, the loser aborts
    // here with NOTHING committed and can genuinely re-read + retry; only
    // a crash between the two commits wedges the index (postings-first
    // would advance postings before losing the stats race — unwedgeable).
    val vs = Versioned.overwriteExpecting(merged, s"$indexDir/stats", vStats + 1)
    val vp = Versioned.append(postings, s"$indexDir/postings")
    require(vp == vs, s"BM25 append left tables out of lockstep (postings " +
      s"v$vp, stats v$vs) — rebuild into a fresh directory")
    vp
  }

  /** Compact the index after a run of appends (the daily-add cadence):
    * re-establishes the postings' bucketed-by-token layout — appends
    * demote reads to plain unbucketed files, costing probes their
    * bucket pruning and shuffle-free token aggregation until this runs
    * ([[graft.sources.Versioned.compact]] re-buckets per the table's
    * last declared layout). BOTH tables compact so versions stay in
    * lockstep; a crash between the two commits wedges the index exactly
    * like a crashed append (consumers refuse; rebuild recovers).
    */
  def compactBm25Index(spark: SparkSession, indexDir: String): Long = {
    val vs = Versioned.compact(spark, s"$indexDir/stats")
    val vp = Versioned.compact(spark, s"$indexDir/postings")
    require(vp == vs, s"BM25 compaction left tables out of lockstep " +
      s"(postings v$vp, stats v$vs) — rebuild into a fresh directory")
    vp
  }

  /** Query the persisted index: touches only the query terms' postings
    * (token filter pushed into the parquet scan) + the 1-row stats;
    * `asOf` time-travels to any historical index version. Scores are
    * IDENTICAL to the inline [[bm25TopK]] over the same corpus — same
    * formula over the same exact integers.
    */
  def queryBm25Index(spark: SparkSession, indexDir: String,
                     terms: Seq[String], k: Int,
                     k1: Double = K1, b: Double = B,
                     asOf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — a build crashed between commits; rebuild into a " +
        "fresh directory or pin an intact version with asOf")
    }
    val tf = Versioned.read(spark, s"$indexDir/postings", asOf)
      .filter(col("tok").isInCollection(terms))
      .select(col("doc_id"), col("dl"), col("tok"), col("tf"))
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    scoreDocs(tf, stats, k1, b)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** MANY queries against the persisted index in ONE postings pass —
    * the batch-serving shape (and what [[graft.streaming.StreamJobs]]'s
    * search stream runs per micro-batch): `queries` is (query_id,
    * terms array); the term sets broadcast onto the postings scan as an
    * equality join, df/tf derive per query from the joined slice, and
    * ranking is a bounded top-k per query. Scoring is the SAME formula
    * as [[queryBm25Index]] — a 1-query input returns identical rows.
    * Unlike the single-query path the term set is not a literal, so
    * nothing pushes into the parquet scan — non-matching postings rows
    * die map-side at the broadcast-hash probe in the scan's own stage,
    * and pruning the scan BYTES is the bucketing-by-token layout's job
    * (amortized across the batch, this is the right trade for serving).
    * Output: (query_id, doc_id, n_terms, score).
    */
  def queryBm25IndexMany(spark: SparkSession, indexDir: String,
                         queries: DataFrame, k: Int,
                         k1: Double = K1, b: Double = B,
                         asOf: Option[Long] = None): DataFrame = {
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — a build crashed between commits; rebuild into a " +
        "fresh directory or pin an intact version with asOf")
    }
    val posts = Versioned.read(spark, s"$indexDir/postings", asOf)
      .select(col("doc_id"), col("dl"), col("tok"), col("tf"))
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    val qt = queries
      .select(col("query_id"), explode(col("terms")).as("tok")).distinct()
    // the pruned (query, posting) slice feeds BOTH df and scoring —
    // stage it (bounded by Σ per-query postings, not the corpus)
    val hits = posts.join(broadcast(qt), Seq("tok"))
      .localCheckpoint(eager = false)
    val dfTab = hits.groupBy(col("query_id"), col("tok"))
      .agg(count(lit(1)).as("df"))
    val scored = hits.join(dfTab, Seq("query_id", "tok"))
      .crossJoin(stats)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
           sum(bmTermExpr(k1, b).cast("decimal(27,10)")).as("s"))
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("s").cast("double").as("score"))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("query_id"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  /** Exact-phrase search from the positional index: documents
    * containing the phrase as ADJACENT tokens in order, with occurrence
    * counts, ranked (n_occur desc, doc_id asc). Index-only — touches
    * the phrase terms' postings rows alone (token filter pushed to the
    * scan) and never re-reads text. Occurrence detection is the classic
    * positional intersection: positions(t₁) ∩ (positions(t₂) − 1) ∩ …
    * ∩ (positions(tₘ) − (m−1)) per document, m−1 equality joins on
    * doc_id over the pruned slices.
    */
  def phraseSearch(spark: SparkSession, indexDir: String,
                   phrase: Seq[String], k: Int,
                   asOf: Option[Long] = None): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — a build crashed between commits; rebuild into a " +
        "fresh directory or pin an intact version with asOf")
    }
    val posts = Versioned.read(spark, s"$indexDir/postings", asOf)
    val slices = phrase.zipWithIndex.map { case (t, j) =>
      posts.filter(col("tok") === lit(t))
        .select(col("doc_id"),
          transform(col("positions"), p => p - j).as(s"p$j"))
    }
    val joined = slices.reduce((a, b) => a.join(b, Seq("doc_id")))
    val inter = (1 until phrase.length).foldLeft(col("p0"))((acc, j) =>
      array_intersect(acc, col(s"p$j")))
    joined.select(col("doc_id"), size(inter).cast("long").as("n_occur"))
      .filter(col("n_occur") > 0)
      .orderBy(col("n_occur").desc, col("doc_id").asc)
      .limit(k)
  }

  // ------------------------------------------------- chunk-grain (RAG)

  /** Chunk-grain BM25 — the RAG retrieval unit: documents are chunked
    * into size/stride token windows ([[Corpus.chunk]] — map-side only)
    * and ranked at CHUNK grain, so a hit is a context-window-sized
    * span with doc attribution, not a whole document whose relevant
    * paragraph is buried in unrelated length. This is a GRAIN change,
    * not new machinery: chunks are short documents whose key encodes
    * (doc_id, chunk_start); dl = chunk length, idf = chunk frequency —
    * the convention RAG stacks score under. stride &lt; size gives
    * overlapping windows (adjacent spans may co-rank; dedup downstream
    * if the consumer needs disjoint context).
    *
    * The composite key is doc_id·2³² + chunk_start, decoded by bit
    * ops (not double division — a key near 2⁶³ would lose precision);
    * an in-plan guard refuses doc_id ≥ 2³¹ or a chunk_start ≥ 2³²
    * loudly instead of silently mis-attributing spans.
    *
    * Output: (doc_id, chunk_start 1-based, n_terms, score), top-k by
    * (score desc, doc_id asc, chunk_start asc).
    */
  private val ChunkKeyBase = 1L << 32

  /** Chunk windows keyed for retrieval: ck = doc_id·2³² + chunk_start,
    * guarded in-plan against the overflow range. Shared by the inline
    * ranker and the persisted-index builder.
    */
  private def chunkKeyed(docs: DataFrame, id: Column, text: Column,
                         size: Int, stride: Int): DataFrame =
    Corpus.chunk(docs, id, text, size, stride)
      .filter(assert_true(
        col("doc_id") >= 0 && col("doc_id") < lit(1L << 31) &&
          col("chunk_start") < lit(ChunkKeyBase),
        lit(s"chunk key overflow: need 0 <= doc_id < 2^31 and chunk_start " +
          "< 2^32 for span-exact attribution (negative ids would decode " +
          "to the wrong span)")).isNull)
      .select((col("doc_id") * lit(ChunkKeyBase) + col("chunk_start")).as("ck"),
        col("chunk_text"))

  /** Decode (doc_id, chunk_start) off a ranking whose doc_id column
    * carries the composite ck — bit ops, not double division (a key
    * near 2⁶³ would round).
    */
  private def decodeChunkKey(ranked: DataFrame): DataFrame =
    ranked.select(shiftright(col("doc_id"), 32).as("doc_id"),
      col("doc_id").bitwiseAND(lit(ChunkKeyBase - 1)).as("chunk_start"),
      col("n_terms"), col("score"))

  def chunkBm25TopK(docs: DataFrame, id: Column, text: Column,
                    terms: Seq[String], k: Int, size: Int, stride: Int,
                    k1: Double = K1, b: Double = B): DataFrame =
    decodeChunkKey(bm25TopK(chunkKeyed(docs, id, text, size, stride),
      col("ck"), col("chunk_text"), terms, k, k1, b))

  /** The serve-many RAG path — the persisted-index machinery is
    * grain-agnostic, so the chunk index IS [[buildBm25Index]] over the
    * keyed windows: postings at chunk grain (dl = chunk length, df =
    * chunk frequency), bucketed by token, FAISS-add appends and
    * time travel included. A probe reads its terms' buckets' bytes,
    * never the chunk corpus.
    *
    * The window GRID (size, stride) is persisted beside the index and
    * appends derive it from there (the pqResGuard discipline — a
    * caller-supplied grid that disagreed with the build's would
    * interleave incompatible spans silently). The grid is immutable
    * for an index's lifetime: changing it is a rebuild, not an append.
    */
  def buildChunkBm25Index(docs: DataFrame, id: Column, text: Column,
                          indexDir: String, size: Int, stride: Int,
                          nBuckets: Int = 8): Long = {
    require(size > 0 && stride > 0)
    val v = buildBm25Index(chunkKeyed(docs, id, text, size, stride),
      col("ck"), col("chunk_text"), indexDir, nBuckets)
    // sidecar AFTER the build commits, stamped with the overwrite
    // version it describes: a rebuild that dies between the two writes
    // leaves a version mismatch chunkGrid() refuses loudly, instead of
    // a stale grid silently mis-chunking the next append
    writeChunkGrid(docs.sparkSession, indexDir, size, stride, v)
    v
  }

  private def chunkGridPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(indexDir, "chunk_grid")

  private def writeChunkGrid(spark: SparkSession, indexDir: String,
                             size: Int, stride: Int, version: Long): Unit = {
    val p = chunkGridPath(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(s"$size $stride $version".getBytes("UTF-8")) finally out.close()
  }

  /** Last "overwrite" version of the postings table — the snapshot a
    * grid stamp must match (appends keep it; builds and compactions
    * move it).
    */
  private def lastPostingsOverwrite(spark: SparkSession,
                                    indexDir: String): Long =
    Versioned.history(spark, s"$indexDir/postings")
      .collect { case (v, "overwrite", _) => v }.lastOption
      .getOrElse(sys.error(s"$indexDir/postings has no overwrite commit"))

  /** The build-time window grid of a chunk-grain index, trusted ONLY
    * when its stamp matches the postings' current overwrite snapshot.
    * Fails loudly on: a plain BM25 index (no sidecar — appending
    * document text to a chunk index or vice versa is the
    * silent-corruption path this closes), a sidecar truncated by a
    * crashed write, or a stamp from a superseded build/compaction (a
    * rebuild or compact died between its two writes) — each with the
    * recovery spelled out instead of mis-chunked spans.
    */
  def chunkGrid(spark: SparkSession, indexDir: String): (Int, Int) = {
    val p = chunkGridPath(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p), s"$indexDir carries no chunk_grid sidecar — " +
      "not a chunk-grain index (or a pre-grid build); rebuild with " +
      "buildChunkBm25Index")
    val in = f.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    raw.trim.split(" ") match {
      case Array(s, st, v) if Seq(s, st, v).forall(_.forall(_.isDigit)) =>
        require(v.toLong == lastPostingsOverwrite(spark, indexDir),
          s"$indexDir chunk_grid stamp v$v does not match the postings' " +
            "current overwrite snapshot — a rebuild or compaction died " +
            "between its index commit and the grid stamp, so the " +
            "recorded grid cannot be trusted to describe the current " +
            "build; rebuild with buildChunkBm25Index")
        (s.toInt, st.toInt)
      case _ => sys.error(s"$indexDir chunk_grid sidecar is corrupt " +
        s"('${raw.take(40)}') — a crashed write; rebuild with " +
        "buildChunkBm25Index")
    }
  }

  /** Compact the chunk index ([[compactBm25Index]] — re-establishes
    * the bucketed layout in lockstep) and RE-STAMP the grid sidecar at
    * the new overwrite version. Use this, not the raw compactor, on
    * chunk indexes. The grid is validated BEFORE compacting; a death
    * between the compaction commit and the re-stamp leaves every
    * consumer refusing loudly (stale stamp) — recovery is a rebuild,
    * the same fail-safe as a crashed grid-changing rebuild, because
    * nothing on disk can prove the recorded grid describes the
    * current snapshot.
    */
  def compactChunkBm25Index(spark: SparkSession, indexDir: String): Long = {
    val (size, stride) = chunkGrid(spark, indexDir)
    val v = compactBm25Index(spark, indexDir)
    writeChunkGrid(spark, indexDir, size, stride, v)
    v
  }

  /** Probe the chunk-grain index; output matches [[chunkBm25TopK]]:
    * (doc_id, chunk_start, n_terms, score) by (score desc, doc asc,
    * chunk asc) — the composite key's asc order IS (doc, chunk) asc.
    */
  def queryChunkBm25Index(spark: SparkSession, indexDir: String,
                          terms: Seq[String], k: Int,
                          asOf: Option[Long] = None): DataFrame =
    decodeChunkKey(queryBm25Index(spark, indexDir, terms, k, asOf = asOf))

  /** Append a document batch's chunks to the chunk-grain index —
    * [[appendToBm25Index]] semantics (new keys only, stats merge under
    * CAS). The window grid comes from the index's own sidecar, never
    * from the caller: there is no way to append a mismatched grid.
    */
  def appendToChunkBm25Index(batch: DataFrame, id: Column, text: Column,
                             indexDir: String): Long = {
    val (size, stride) = chunkGrid(batch.sparkSession, indexDir)
    appendToBm25Index(chunkKeyed(batch, id, text, size, stride),
      col("ck"), col("chunk_text"), indexDir)
  }

  // ------------------------------------------------------------ fusion

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N per-query rankings into one by score(q,d) =
    * Σ_rankers 1/(c + rank_r(q,d)), summing over the rankers that
    * returned d for q (c = 60, the published constant). RRF is the
    * standard way to combine rankers whose scores are NOT commensurate
    * — BM25 log-odds sums vs cosine similarities — because only ranks
    * enter the formula.
    *
    * Determinism: within each input ranking, ranks are row_number over
    * (score desc, doc_id asc); the fused sum rides DECIMAL(27,10)
    * (order-independent — each term 1/(c+r) is one double division,
    * identical cross-engine); fused ties break doc_id asc. So the
    * fusion replays exactly in SQL whenever its input rankings do.
    *
    * Scale shape: every input is already a per-query top-k (k rows per
    * query per ranker, NOT corpus-sized), so the windows, the union,
    * and the (query_id, doc_id) aggregation all move O(|Q|·k·N) rows —
    * fusion cost is independent of corpus size by construction.
    *
    * Input rankings: (query_id, doc_id, score). Output:
    * (query_id, doc_id, n_rankers, rrf), top-k per query.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(c >= 0, s"rrf constant must be non-negative, got $c")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val contribs = rankings.map { r =>
      r.select(col("query_id"), col("doc_id"), col("score"))
        .withColumn("rn", row_number().over(w))
        .select(col("query_id"), col("doc_id"),
          (lit(1.0) / (lit(c) + col("rn"))).cast("decimal(27,10)").as("rw"))
    }.reduce(_.unionByName(_))
    val fused = contribs.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_rankers"),
        sum(col("rw")).cast("double").as("rrf"))
    Ranking.topPerGroup(fused, Seq(col("query_id")),
        Seq(col("rrf").desc, col("doc_id").asc), k)
      .select(col("query_id"), col("doc_id"), col("n_rankers"), col("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
  }

  /** HYBRID retrieval over the two persisted indexes — the lexical
    * inverted index ([[queryBm25IndexMany]]) and the semantic IVF ANN
    * index ([[Similarity.queryIvfIndex]]) answer the same query batch
    * independently, then [[rrfFuse]] combines the two top-`kEach`
    * rankings. Queries: (query_id, terms array<string>, vec
    * array<float|double>). Each index pins its own version (`bm25AsOf`
    * / `ivfAsOf`) — a fused result is reproducible against any
    * historical (lexical, semantic) index pair even after appends or
    * rebuilds on either side.
    *
    * Scale shape: each arm pays only its own probe cost (postings
    * pruned by token / buckets pruned by centroid); fusion adds
    * O(|Q|·kEach) — nothing corpus-sized beyond the two probes.
    */
  def hybridSearch(spark: SparkSession, bm25Dir: String, ivfDir: String,
                   queries: DataFrame, k: Int, kEach: Int = 20,
                   nProbes: Int = 4, c: Int = 60,
                   bm25AsOf: Option[Long] = None,
                   ivfAsOf: Option[Long] = None): DataFrame = {
    val lex = queryBm25IndexMany(spark, bm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val sem = Similarity.queryIvfIndex(spark, ivfDir,
        queries.select(col("query_id").as("id"), col("vec")), kEach,
        nProbes, asOf = ivfAsOf)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("sim").as("score"))
    rrfFuse(Seq(lex, sem), k, c)
  }
}
