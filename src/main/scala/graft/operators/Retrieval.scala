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
  private def postingsOf(base: DataFrame,
                         metaCols: Seq[String] = Nil): DataFrame = base
    .select((col("doc_id") +: col("dl") +: metaCols.map(col) :+
      posexplode(col("toks"))): _*)
    // metadata gate columns ride the grouping keys (functionally
    // dependent on doc_id — the dl denormalization discipline applied
    // to filtered search: a probe's predicate then runs INSIDE the
    // token-pruned scan, no doc-meta join per query)
    .groupBy((col("col").as("tok") +: col("doc_id") +: col("dl") +:
      metaCols.map(col)): _*)
    .agg(count(lit(1)).as("tf"),
         sort_array(collect_list(col("pos") + 1)).as("positions"))
    .select((col("tok") +: col("doc_id") +: col("tf") +: col("dl") +:
      col("positions") +: metaCols.map(col)): _*)

  /** Deterministic token shard in [0, nParts): md5-derived, the
    * engine's cross-run/cross-engine-stable hash family (the
    * `Corpus.hashBucket` discipline — Spark's own hash() would differ
    * per engine). The partition column of the "partition" postings
    * layout; [[tokPartOf]] is its exact Scala twin for literal terms.
    */
  private def tokPartExpr(tok: Column, nParts: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % nParts

  private[graft] def tokPartOf(term: String, nParts: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % nParts
  }

  /** Build the inverted index: `postings` (tok, doc_id, tf, dl,
    * positions — doc length denormalized into the row, 1-based sorted
    * position list for phrase queries) + 1-row `stats` (n_docs,
    * sum_dl), two lockstep [[Versioned]] tables. One corpus pass.
    *
    * Two physical layouts, the Similarity-assignment dichotomy:
    *
    *  - `layout = "bucket"` (default): postings BUCKETED BY TOKEN
    *    ([[Versioned.overwriteBucketed]]) — a probe's literal term
    *    filter prunes whole buckets at the scan (it reads |terms|
    *    buckets' bytes, not the postings table), and the df-per-token
    *    aggregation inside [[queryBm25Index]] needs no Exchange because
    *    the scan already arrives hash-partitioned on `tok`. `nBuckets`
    *    sizes bucket files: at 100 TB pick postings_bytes / ~256 MB.
    *  - `layout = "partition"`: postings land in `nPartDirs` token-shard
    *    DIRECTORIES (partition column `tok_part` = md5(tok) mod
    *    nPartDirs). This is the layout for DYNAMIC term sets
    *    ([[queryBm25IndexMany]], where terms arrive as data, not
    *    literals): the broadcast term join carries tok_part, so Spark
    *    DPP prunes unprobed directories' BYTES at run time — the lever
    *    bucketing cannot give a data-dependent join. Literal probes
    *    prune the same directories statically. Keep nPartDirs modest
    *    (each shard is a directory); token skew within a shard is fine
    *    — pruning is per-shard, scoring is per-token.
    */
  /** Tokens whose document frequency exceeds `maxDfRatio` of the corpus
    * — the stop-list derivation for a df-capped index build (the
    * `maxShingleFreq` analogue at the lexical layer): a real corpus is
    * Zipf-skewed, and a stop token's postings list is corpus-sized, so
    * one stop-bearing query makes the "pruned" probe slice scale with
    * the corpus instead of the query. Capping trades their ~zero-idf
    * score contribution (df ≈ N ⇒ BM25 idf ≈ 0) for probe bytes bounded
    * by the DISCRIMINATIVE terms' postings. Output: (tok, df),
    * vocabulary-bounded and usually a handful of rows — collect it into
    * [[buildBm25Index]]'s `stopTokens`.
    */
  def heavyTokens(docs: DataFrame, id: Column, text: Column,
                  maxDfRatio: Double): DataFrame = {
    require(maxDfRatio > 0 && maxDfRatio < 1,
      s"maxDfRatio must be in (0, 1), got $maxDfRatio")
    val base = docs.select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
    val n = base.agg(count(lit(1)).as("n_docs"))
    base.select(col("doc_id"), explode(col("toks")).as("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df").cast("double") > lit(maxDfRatio) * col("n_docs"))
      .select(col("tok"), col("df"))
      .orderBy(col("df").desc, col("tok"))
  }

  /** `stopTokens` (usually [[heavyTokens]]' output) drops those tokens'
    * postings AT BUILD: stats stay TRUE corpus stats (dl counts every
    * token), so un-stopped terms score exactly as on the uncapped index
    * and stopped query terms simply contribute nothing (BM25: no hits;
    * QL: collection-frequency 0, the OOV treatment) — the documented
    * recall trade. The stop set FREEZES at build (persisted in a
    * stamped `stop_toks` sidecar): appends filter their batches with
    * it, so the index stays internally consistent until the rebuild
    * cadence refreshes the set.
    */
  def buildBm25Index(docs: DataFrame, id: Column, text: Column,
                     indexDir: String, nBuckets: Int = 8,
                     layout: String = "bucket", nPartDirs: Int = 16,
                     stopTokens: Seq[String] = Nil,
                     stopMaxDfRatio: Option[Double] = None,
                     metaCols: Seq[String] = Nil): Long = {
    val spark = docs.sparkSession
    val base = docs.select((id.as("doc_id") +:
        TextOps.tokens(text).as("toks") +: metaCols.map(col)): _*)
      .select((col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        col("toks") +: metaCols.map(col)): _*)
    val postings0 = postingsOf(base, metaCols)
    val postings =
      if (stopTokens.isEmpty) postings0
      else postings0.filter(!col("tok").isInCollection(stopTokens))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // the cap marker lands BEFORE the table commits (fail-closed order):
    // a capped build that dies between its commits and a post-hoc marker
    // write would otherwise read as UNCAPPED — appends would land stop
    // postings unfiltered onto a filtered base, silent ranking
    // corruption with no repair signal. Every build writes its epoch
    // marker (empty token list = explicitly uncapped) at the version it
    // is ABOUT to commit, so the commit can never land without its cap
    // status on disk; a pre-commit crash leaves only an orphan marker at
    // a version that does not exist, which the next build overwrites.
    val postT = s"$indexDir/postings"
    val vPred =
      if (Versioned.exists(spark, postT))
        Versioned.latestVersion(spark, postT) + 1
      else 0L
    writeStopEpoch(spark, indexDir, stopTokens, stopMaxDfRatio, vPred)
    val vp = layout match {
      case "bucket" => Versioned.overwriteBucketed(postings,
        postT, "tok", nBuckets)
      case "partition" => Versioned.overwritePartitioned(
        postings.withColumn("tok_part", tokPartExpr(col("tok"), nPartDirs)),
        postT, "tok_part")
      case other => throw new IllegalArgumentException(
        s"postings layout must be bucket or partition, got $other")
    }
    val vs = Versioned.overwrite(stats, s"$indexDir/stats")
    require(vp == vs, s"BM25 index tables diverged: postings v$vp vs stats " +
      s"v$vs (was $indexDir written by something other than buildBm25Index?)")
    // the shard count is persisted beside the index (the chunk_grid
    // discipline): queries and appends derive tok_part from there, so
    // there is no way to probe or append with a mismatched modulus
    if (layout == "partition")
      writePartDirs(spark, indexDir, nPartDirs, vp)
    // lost the predicted version to a concurrent writer (already UB for
    // builds, but never leave the marker pointing at someone else's
    // commit); the legacy head pointer is convenience, written last
    if (vp != vPred)
      writeStopEpoch(spark, indexDir, stopTokens, stopMaxDfRatio, vp)
    writeStopHead(spark, indexDir, stopTokens, stopMaxDfRatio, vp)
    vp
  }

  // ---------------------------------------------------- stop-list sidecar
  //
  // Two files per capped (or explicitly-uncapped) build:
  //  - `stop_toks@<v>` — the EPOCH MARKER, written BEFORE the postings
  //    commit it describes (fail-closed: the commit cannot land without
  //    its cap status on disk). Append-only history: one per overwrite.
  //  - `stop_toks` — the legacy head pointer, written after the commits
  //    (convenience + back-compat; epoch markers take precedence).
  // Format (both): line 1 = "<version>" or "<version> <maxDfRatio>",
  // remaining lines = the sorted stop tokens (none = uncapped). A
  // recorded ratio opts the index into stop-list RE-DERIVATION at
  // [[compactBm25Index]] (boilerplate that emerges after the build gets
  // capped at the next compaction instead of never).

  private def stopSidecarPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(indexDir, "stop_toks")

  private def stopEpochPath(indexDir: String, v: Long) =
    new org.apache.hadoop.fs.Path(indexDir, s"stop_toks@$v")

  private def writeStopFile(spark: SparkSession,
                            p: org.apache.hadoop.fs.Path,
                            toks: Seq[String], ratio: Option[Double],
                            version: Long): Unit = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val head = version.toString + ratio.map(r => s" $r").getOrElse("")
    val out = f.create(p, true)
    try out.write((head +: toks.distinct.sorted).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def writeStopEpoch(spark: SparkSession, indexDir: String,
                             toks: Seq[String], ratio: Option[Double],
                             version: Long): Unit =
    writeStopFile(spark, stopEpochPath(indexDir, version), toks, ratio, version)

  private def writeStopHead(spark: SparkSession, indexDir: String,
                            toks: Seq[String], ratio: Option[Double],
                            version: Long): Unit =
    writeStopFile(spark, stopSidecarPath(indexDir), toks, ratio, version)

  /** Parse a stop file: (stamped version, recap ratio, tokens). The
    * legacy single-line-header format (version only, ≥1 token) parses
    * identically. None when absent or corrupt.
    */
  private def readStopFile(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Option[(Long, Option[Double], Seq[String])] = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = raw.split("\n", -1).toSeq
      lines.headOption.map(_.trim.split(" ").toSeq).flatMap {
        case Seq(v) if v.nonEmpty && v.forall(_.isDigit) =>
          Some((v.toLong, None, lines.tail.filter(_.nonEmpty)))
        case Seq(v, r) if v.nonEmpty && v.forall(_.isDigit) &&
            r.toDoubleOption.exists(d => d > 0 && d < 1) =>
          Some((v.toLong, r.toDoubleOption, lines.tail.filter(_.nonEmpty)))
        case _ => None
      }
    }
  }

  /** The cap state of the index at its current overwrite snapshot:
    * (stop tokens — empty = uncapped, recap ratio). Resolution order:
    *
    *  1. The epoch marker for the head overwrite. It was written before
    *     that commit, so a build/compaction can never land without it —
    *     its absence for a NEW-code overwrite cannot happen, and its
    *     word is final (an empty list is an explicit uncapped build).
    *  2. Legacy head pointer with a matching stamp (pre-marker indexes).
    *  3. Legacy head pointer with a STALE stamp throws — the cap status
    *     of the head snapshot is unknowable, and appending with a
    *     maybe-wrong set is silent ranking corruption, not degradation;
    *     [[repairBm25Index]] restores the stamp after the pure-rewrite
    *     content check.
    *  4. Nothing on disk = uncapped (pre-cap-era index).
    */
  private def stopStateOf(spark: SparkSession,
                          indexDir: String): (Seq[String], Option[Double]) = {
    val h = lastPostingsOverwrite(spark, indexDir)
    readStopFile(spark, stopEpochPath(indexDir, h)) match {
      case Some((v, ratio, toks)) =>
        require(v == h, s"$indexDir stop_toks@$h epoch marker records " +
          s"version $v — foreign write; rebuild the index")
        (toks, ratio)
      case None => readStopFile(spark, stopSidecarPath(indexDir)) match {
        case None => (Nil, None)
        // a stale pointer recording an EMPTY list is inert — filtering
        // with the empty set is the identity, so no append can become
        // inconsistent with any base; only a stale NON-empty list is
        // unknowable cap status
        case Some((_, ratio, toks)) if toks.isEmpty => (Nil, ratio)
        case Some((v, ratio, toks)) =>
          require(v == h,
            s"$indexDir stop_toks sidecar is STALE (a compaction or " +
              "rebuild died between its postings commit and the re-stamp) " +
              "— run repairBm25Index to restore it, or rebuild the index")
          (toks, ratio)
      }
    }
  }

  /** The stop list IF the index is capped: None = uncapped. Throws on
    * an unresolvable legacy stamp (see [[stopStateOf]]).
    */
  private def stopTokensOf(spark: SparkSession,
                           indexDir: String): Option[Seq[String]] =
    Some(stopStateOf(spark, indexDir)._1).filter(_.nonEmpty)

  /** Re-stamp a stale LEGACY stop_toks pointer after a repair restored
    * lockstep. The recorded list is blessed only when the head overwrite
    * snapshot is CONTENT-IDENTICAL to the stamped version (the
    * [[restampChunkGrid]] pure-rewrite discipline) — true for a crashed
    * compaction chain, false for ANY crashed rebuild (capped→uncapped
    * leaves the tokens present; an ENLARGED list leaves both old and new
    * tokens absent, where the weaker tokens-absent check would bless the
    * old list and appends would then filter with a smaller set than the
    * base build used). New-code indexes never need this: their epoch
    * markers precede their commits. No-op when absent, already trusted,
    * or nothing on disk can prove the rewrite was pure (vacuumed stamp
    * version included).
    */
  private def restampStopToks(spark: SparkSession, indexDir: String): Unit = {
    val h = lastPostingsOverwrite(spark, indexDir)
    if (readStopFile(spark, stopEpochPath(indexDir, h)).nonEmpty) return
    readStopFile(spark, stopSidecarPath(indexDir)).foreach {
      case (v, ratio, toks) if v < h && h > 0 && toks.nonEmpty =>
        // pure means the head overwrite changed nothing vs ITS INPUT
        // (version h−1): then cap status at h equals cap status at h−1,
        // which by induction through the sidecar-filtered appends is the
        // recorded list — true for a compaction, false for any content-
        // changing rebuild (capped→uncapped leaves the tokens present;
        // an ENLARGED list leaves different postings), which stays
        // refused with the manual-rebuild message
        val pure = try {
          val now  = Versioned.read(spark, s"$indexDir/postings", Some(h))
          val prev = Versioned.read(spark, s"$indexDir/postings", Some(h - 1))
          now.exceptAll(prev).isEmpty && prev.exceptAll(now).isEmpty
        } catch { case _: Exception => false }
        if (pure) {
          writeStopEpoch(spark, indexDir, toks, ratio, h)
          writeStopHead(spark, indexDir, toks, ratio, h)
        }
      case _ => ()
    }
  }

  /** Sidecar recording a partitioned layout's shard modulus, stamped
    * with the overwrite version of the table it describes (the
    * chunk_grid discipline: a crashed rebuild leaves a stale stamp that
    * consumers detect instead of pruning by the wrong modulus). Two
    * instances: `tok_parts` (token shards of a "partition"-layout
    * postings table) and `doc_parts` (doc shards of the forward index).
    */
  private def shardSidecarPath(indexDir: String, name: String) =
    new org.apache.hadoop.fs.Path(indexDir, name)

  private def shardEpochPath(indexDir: String, name: String, v: Long) =
    new org.apache.hadoop.fs.Path(indexDir, s"$name@$v")

  /** Writes BOTH the head sidecar and an append-only per-EPOCH copy
    * (`<name>@<version>`). The head file serves latest reads; the epoch
    * files give every historical layout epoch its own surviving record,
    * so a read PINNED before the current epoch (a serving stream that
    * straddled a compaction) prunes with ITS epoch's modulus instead of
    * degrading to an unpruned scan for the stream's remaining lifetime —
    * old epochs' shard columns are persisted per row, so an old modulus
    * prunes its own files correctly.
    */
  private[operators] def writeShardSidecar(spark: SparkSession,
                                indexDir: String,
                                name: String, nParts: Int,
                                version: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(shardSidecarPath(indexDir, name),
        shardEpochPath(indexDir, name, version)).foreach { p =>
      val out = p.getFileSystem(conf).create(p, true)
      try out.write(s"$nParts $version".getBytes("UTF-8")) finally out.close()
    }
  }

  /** The modulus recorded by epoch `v`'s sidecar copy, or None when the
    * epoch predates the history (legacy index) or its stamp disagrees
    * with its filename (foreign write). Only meaningful for `v`s that
    * are overwrite commits of the stamp table.
    */
  private def epochShardSidecarOf(spark: SparkSession, indexDir: String,
                                  name: String, v: Long): Option[Int] = {
    val p = shardEpochPath(indexDir, name, v)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      raw.trim.split(" ") match {
        case Array(n, sv) if Seq(n, sv).forall(_.forall(_.isDigit)) &&
            sv.toLong == v => Some(n.toInt)
        case _ => None
      }
    }
  }

  /** Shard modulus recorded by a sidecar, or None when the sidecar is
    * absent OR cannot be trusted for the CURRENT snapshot (stale stamp
    * after a crashed rebuild, corrupt file). Pruning is an optimization
    * layered over an always-correct fallback, so an untrusted sidecar
    * degrades queries to unpruned scans; appends need the modulus to
    * write and refuse separately when it is absent on a partitioned
    * table.
    */
  private[operators] def shardSidecarOf(spark: SparkSession, indexDir: String,
                             name: String, stampTable: String): Option[Int] = {
    val p = shardSidecarPath(indexDir, name)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      raw.trim.split(" ") match {
        case Array(n, v) if Seq(n, v).forall(_.forall(_.isDigit)) &&
            v.toLong == lastOverwriteOf(spark, indexDir, stampTable) =>
          Some(n.toInt)
        case _ => None
      }
    }
  }

  private def writePartDirs(spark: SparkSession, indexDir: String,
                            nParts: Int, version: Long): Unit =
    writeShardSidecar(spark, indexDir, "tok_parts", nParts, version)

  /** [[shardSidecarOf]] for a possibly-PINNED read. A layout EPOCH runs
    * from an overwrite commit (the build/compaction that laid the
    * directories out) to the next overwrite; appends inside an epoch
    * derive their shard column from the epoch's own sidecar, so every
    * version inside it shares one modulus. Resolution:
    *
    *  - no pin, or a pin inside the LIVE epoch → the stamp-checked head
    *    sidecar (exactly the pre-r14 behavior);
    *  - a pin in an EARLIER epoch → that epoch's own `<name>@<v>`
    *    history copy ([[writeShardSidecar]] appends one per overwrite),
    *    so a serving stream that pinned its version at start KEEPS
    *    pruning after a mid-stream compaction moves the live layout —
    *    previously every subsequent micro-batch of that stream read the
    *    table unpruned for the stream's remaining lifetime;
    *  - an epoch with no surviving record (legacy index, or the epoch's
    *    own writer crashed before its sidecar) → None: the unpruned-
    *    but-correct scan.
    */
  private[operators] def shardSidecarFor(spark: SparkSession,
      indexDir: String, name: String, stampTable: String,
      asOf: Option[Long]): Option[Int] = asOf match {
    case None => shardSidecarOf(spark, indexDir, name, stampTable)
    case Some(pin) =>
      val overwrites = Versioned.history(spark, s"$indexDir/$stampTable")
        .collect { case (v, "overwrite", _) => v }
      overwrites.filter(_ <= pin).lastOption.flatMap { epoch =>
        if (overwrites.lastOption.contains(epoch))
          shardSidecarOf(spark, indexDir, name, stampTable)
        else epochShardSidecarOf(spark, indexDir, name, epoch)
      }
  }

  /** The modulus a sidecar RECORDS, ignoring its stamp — a repair's
    * first candidate (the stamp is stale exactly when a repair is
    * needed; the recorded modulus is still the best guess and is
    * data-verified before being blessed).
    */
  private def sidecarRecordedModulus(spark: SparkSession, indexDir: String,
                                     name: String): Option[Int] = {
    val p = shardSidecarPath(indexDir, name)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      raw.trim.split(" ") match {
        case Array(n, v) if Seq(n, v).forall(_.forall(_.isDigit)) =>
          Some(n.toInt)
        case _ => None
      }
    }
  }

  private def partDirsOf(spark: SparkSession, indexDir: String): Option[Int] =
    shardSidecarOf(spark, indexDir, "tok_parts", "postings")

  /** Bound the per-epoch sidecar/marker history: [[writeShardSidecar]]
    * and [[writeStopEpoch]] append one `<name>@<v>` file per overwrite
    * FOREVER, and [[graft.sources.Versioned.vacuum]] prunes data files
    * but never these — the one artifact class that grew unboundedly.
    * Drop history entries for epochs no retained version can pin: after
    * `vacuum(retainVersions = N)` the readable versions are the last N,
    * so the epochs that matter are the overwrites INSIDE that window
    * plus the one covering its floor (a retained version between two
    * overwrites pins the EARLIER one's layout). A pin older than that
    * can no longer read data anyway. Call after vacuuming the index's
    * tables with the SAME retention. Returns the number of files
    * removed.
    */
  def vacuumIndexSidecars(spark: SparkSession, indexDir: String,
                          retainVersions: Int = 2): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pairs = Seq("tok_parts" -> "postings", "stop_toks" -> "postings",
      "doc_parts" -> "fwd", "vec_parts" -> "vectors")
    var removed = 0
    pairs.foreach { case (name, t) =>
      val tab = s"$indexDir/$t"
      if (Versioned.exists(spark, tab)) {
        val hist = Versioned.history(spark, tab)
        val floor = hist.map(_._1).takeRight(math.max(1, retainVersions)).head
        val overwrites = hist.collect { case (v, "overwrite", _) => v }
        val keep = (overwrites.filter(_ <= floor).lastOption.toSeq ++
          overwrites.filter(_ > floor)).toSet
        val dir = new org.apache.hadoop.fs.Path(indexDir)
        val f = dir.getFileSystem(conf)
        if (f.exists(dir)) f.listStatus(dir).filter(_.isFile)
          .map(_.getPath).filter(_.getName.startsWith(s"$name@"))
          .foreach { p =>
            val v = p.getName.stripPrefix(s"$name@")
            if (v.nonEmpty && v.forall(_.isDigit) && !keep.contains(v.toLong)) {
              if (f.delete(p, false)) removed += 1
            }
          }
      }
    }
    removed
  }

  // --------------------------------------------------- tombstone gating
  //
  // Document deletion ([[Tombstones]]): every probe of a persisted
  // index anti-joins its candidates against the index's broadcast
  // tombstone set BEFORE ranking — survivors fill the top-k (no
  // starvation), and df/cf/corpus stats stay PRE-delete until the
  // compaction physically drops the rows and corrects them (Lucene
  // delete-then-merge). Chunk-grain indexes gate on the decoded doc id
  // (high 32 bits of the composite key), detected from the index's own
  // chunk_grid sidecar.

  /** True when `indexDir` is a chunk-grain index (has a chunk_grid
    * sidecar) — its rows key by the composite ck, so doc-grain
    * tombstones match on the decoded high 32 bits. */
  private[operators] def hasChunkGrid(spark: SparkSession,
                                      indexDir: String): Boolean = {
    val p = chunkGridPath(indexDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The DOCUMENT id of an index row's key column: identity at doc
    * grain, the composite-key decode at chunk grain. */
  private[operators] def docKeyExpr(spark: SparkSession, indexDir: String,
                                    c: Column): Column =
    if (hasChunkGrid(spark, indexDir)) shiftright(c, 32) else c

  /** [[Tombstones.gate]] with the index's own grain decode. */
  private def tombGate(spark: SparkSession, indexDir: String,
                       rows: DataFrame, docCol: String): DataFrame =
    Tombstones.gate(spark, indexDir, rows,
      docKeyExpr(spark, indexDir, col(docCol)))

  /** Add a batch of NEW documents to an existing index (FAISS-add /
    * daily-cadence semantics; doc_ids must be previously unseen — the
    * same append-only invariant as `Corpus.appendSignalState`). Postings
    * rows append FIRST, then the 1-row stats table merges additively
    * and commits at the EXPECTED version (CAS). A crash — or a lost
    * CAS race — between the two commits leaves the batch's postings as
    * an ORPHAN SLICE ON DISK, from which [[repairBm25Index]] recomputes
    * the stats delta exactly (document length is denormalized into
    * every postings row). The reverse order was unwedgeable: the missed
    * postings delta was the batch itself, gone with the crashed
    * process. On a CAS failure do NOT re-append the same batch (its
    * postings are already committed) — run [[repairBm25Index]], which
    * folds the orphan slice's stats in and completes the append.
    */
  def appendToBm25Index(batch: DataFrame, id: Column, text: Column,
                        indexDir: String): Long = {
    val spark = batch.sparkSession
    val vStats = Versioned.latestVersion(spark, s"$indexDir/stats")
    val vPost  = Versioned.latestVersion(spark, s"$indexDir/postings")
    require(vPost == vStats, s"BM25 index tables out of lockstep (postings " +
      s"v$vPost, stats v$vStats) — a build or append crashed between " +
      "commits; run repairBm25Index, then retry")
    // a metadata-carrying index keeps its filtered-probe contract
    // through appends: the batch must supply the SAME baked columns
    // (the Similarity.withMeta discipline at the lexical layer)
    val meta = postingsMetaCols(Versioned.read(spark, s"$indexDir/postings"))
    val metaMissing = meta.filterNot(batch.columns.contains)
    require(metaMissing.isEmpty,
      s"$indexDir postings carry metadata column(s) ${meta.mkString(", ")} " +
        "(filtered-probe gates); the append batch must supply them — " +
        s"missing: ${metaMissing.mkString(", ")}")
    val base = batch.select((id.as("doc_id") +:
        TextOps.tokens(text).as("toks") +: meta.map(col)): _*)
      .select((col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        col("toks") +: meta.map(col)): _*)
    // a capped index filters every batch with its FROZEN stop set (from
    // the sidecar, never the caller) — stats stay true corpus stats
    val postings = stopTokensOf(spark, indexDir) match {
      case Some(stops) =>
        postingsOf(base, meta).filter(!col("tok").isInCollection(stops))
      case None => postingsOf(base, meta)
    }
    val delta = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val merged = Versioned.read(spark, s"$indexDir/stats", Some(vStats))
      .unionByName(delta)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val partitioned = Versioned.declaredLayout(spark, s"$indexDir/postings")
      .startsWith("part:")
    val vp =
      if (!partitioned) Versioned.append(postings, s"$indexDir/postings")
      else {
        // a partitioned table's batches must land partitioned with the
        // SAME modulus — from the sidecar, never the caller
        val n = partDirsOf(spark, indexDir).getOrElse(sys.error(
          s"$indexDir postings are partition-laid-out but the tok_parts " +
            "sidecar is absent or stale (a rebuild crashed between its " +
            "commit and the stamp) — rebuild with buildBm25Index"))
        Versioned.appendPartitioned(
          postings.withColumn("tok_part", tokPartExpr(col("tok"), n)),
          s"$indexDir/postings", "tok_part")
      }
    val vs =
      try Versioned.overwriteExpecting(merged, s"$indexDir/stats", vStats + 1)
      catch { case e: IllegalArgumentException =>
        throw new IllegalStateException(s"BM25 stats CAS failed after the " +
          s"batch's postings committed (v$vp) on $indexDir — the postings " +
          "are an orphan slice now; run repairBm25Index to fold their " +
          "stats in. Do NOT re-append the same batch (its postings would " +
          "land twice).", e)
      }
    require(vp == vs, s"BM25 append left tables out of lockstep (postings " +
      s"v$vp, stats v$vs) — run repairBm25Index")
    vp
  }

  /** Repair an index wedged between its two commits — the
    * orphan-postings shape (postings version ahead of stats, or stats
    * table missing after a crashed build). The missed stats delta is
    * recomputed EXACTLY from the orphan postings slice: document
    * length rides every postings row, and every document carries ≥1
    * postings row (empty text tokenizes to [""], so no document is
    * invisible to postings), so the slice's distinct (doc_id, dl) set
    * IS the batch the crashed append was accounting for. Caveat on a
    * stop-CAPPED index: a crashed-append document consisting ENTIRELY
    * of stopped tokens has no postings rows, so its length drops from
    * the repaired stats (an avgdl epsilon — the documented cap trade;
    * a rebuild restores exact stats). Stats then
    * commit at the expected version until the tables are back in
    * lockstep — a gap of two crashed appends catches up with
    * content-identical commits (the full delta lands in the FIRST
    * repair commit, so intermediate versions inside a multi-crash gap
    * pair slightly-ahead stats with their postings snapshot — those
    * versions never existed as consistent pairs anyway; pin at or
    * before the gap, or at the repaired head). A pre-crash consumer
    * pinned via asOf is never affected.
    *
    * NOT covered: a chunk-grain index whose BUILD crashed before the
    * grid sidecar landed — the window grid lived only in the crashed
    * caller; rebuild with [[buildChunkBm25Index]] (the DailyMaintenance
    * chunk stage self-heals exactly that way). A stats-AHEAD shape is
    * refused: no code path here produces it, so it signals foreign
    * writes. Returns the restored lockstep version; no-op when intact.
    */
  def repairBm25Index(spark: SparkSession, indexDir: String): Long = {
    val postT = s"$indexDir/postings"
    val statT = s"$indexDir/stats"
    require(Versioned.exists(spark, postT),
      s"$indexDir has no postings table — nothing to repair")
    def statsOf(docs: DataFrame): DataFrame =
      docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val vp = Versioned.latestVersion(spark, postT)
    if (!Versioned.exists(spark, statT)) {
      // a build died between its postings and stats commits
      val full = statsOf(Versioned.read(spark, postT, Some(vp))
        .select(col("doc_id"), col("dl")).distinct())
      var v = Versioned.overwrite(full, statT)
      while (v < vp)
        v = Versioned.overwrite(Versioned.read(spark, statT, Some(v)), statT)
      restampTokParts(spark, indexDir)
      restampStopToks(spark, indexDir)
      return v
    }
    val vs = Versioned.latestVersion(spark, statT)
    if (vp == vs) {
      // lockstep intact, but a compaction may still have died between
      // its table commits and a sidecar re-stamp — both restamps no-op
      // when already trusted
      restampTokParts(spark, indexDir)
      restampStopToks(spark, indexDir)
      return vp
    }
    require(vp > vs, s"$indexDir stats v$vs is AHEAD of postings v$vp — " +
      "not the orphan-postings crash shape (no BM25 code path produces " +
      "it); rebuild into a fresh directory")
    // pre-crash lockstep means postings snapshot vs is exactly the
    // corpus stats v(vs) describes; append-only + new-doc-only
    // invariants make doc_id membership the delta — in BOTH directions:
    // docs present at vp but not vs are a crashed APPEND's batch (add
    // their stats), and docs present at vs but not vp are a crashed
    // tombstone-MERGE's drop set (subtract theirs) — but ONLY when they
    // are actually tombstoned: a crashed stop-list RECAP also removes
    // rows (a doc whose every token got capped vanishes from postings),
    // and those documents remain corpus members whose stats must stay
    // (stats are TRUE corpus stats under the cap — the q183 invariant).
    val headDocs = Versioned.read(spark, postT, Some(vp))
      .select(col("doc_id"), col("dl")).distinct()
    val baseDocs = Versioned.read(spark, postT, Some(vs))
      .select(col("doc_id"), col("dl")).distinct()
    val newDocs = headDocs.join(baseDocs.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val goneDocs = Tombstones.hits(spark, indexDir,
      baseDocs.join(headDocs.select(col("doc_id")), Seq("doc_id"), "left_anti"),
      docKeyExpr(spark, indexDir, col("doc_id")))
    val merged = Versioned.read(spark, statT, Some(vs))
      .unionByName(statsOf(newDocs))
      .unionByName(statsOf(goneDocs).select(
        (-col("n_docs")).as("n_docs"), (-col("sum_dl")).as("sum_dl")))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    var v = Versioned.overwriteExpecting(merged, statT, vs + 1)
    while (v < vp)
      v = Versioned.overwriteExpecting(
        Versioned.read(spark, statT, Some(v)), statT, v + 1)
    restampTokParts(spark, indexDir)
    restampStopToks(spark, indexDir)
    v
  }

  /** Re-stamp the tok_parts sidecar after a repair restored lockstep on
    * a partition-layout index. A crashed compaction moved the postings'
    * overwrite version past the sidecar's stamp while leaving the
    * modulus unchanged, so without this step queries permanently lose
    * shard pruning and appends permanently refuse even though the
    * modulus is fully recoverable. The stamp is only restored after the
    * candidate modulus is VERIFIED against the data (every row must
    * satisfy tok_part = md5(tok) mod n — a crashed REBUILD with a
    * different modulus leaves rows that fail this, and blessing the old
    * stamp there would prune probes to the wrong shards, a wrong-answer
    * bug rather than a performance one). Candidates: the stale
    * sidecar's recorded modulus, then max(tok_part)+1 off the data (the
    * sidecar-missing crash shape). No candidate verifying ⇒ the sidecar
    * stays stale: queries degrade to unpruned (correct), appends keep
    * refusing with the rebuild message.
    */
  private def restampTokParts(spark: SparkSession, indexDir: String): Unit = {
    val postT = s"$indexDir/postings"
    if (!Versioned.declaredLayout(spark, postT).startsWith("part:")) return
    // already trusted (e.g. the crash was an APPEND, which never moves
    // the overwrite snapshot the stamp tracks) — re-stamping with a
    // fresher version would WRONGLY invalidate it
    if (partDirsOf(spark, indexDir).nonEmpty) return
    val stampV = lastPostingsOverwrite(spark, indexDir)
    val posts = Versioned.read(spark, postT).select(col("tok"), col("tok_part"))
    val recorded = sidecarRecordedModulus(spark, indexDir, "tok_parts")
    // an index over an EMPTY corpus has no rows to derive the modulus
    // from (max is NULL) — only the recorded candidate applies; getLong
    // on the null would turn the repair into a crash instead of the
    // documented stale-sidecar degradation
    val maxRow = posts.agg(max(col("tok_part"))).head
    val fromData: Seq[Int] =
      if (maxRow.isNullAt(0)) Seq.empty else Seq(maxRow.getLong(0).toInt + 1)
    (recorded.toSeq ++ fromData).distinct
      .find(n => posts
        .filter(col("tok_part") =!= tokPartExpr(col("tok"), n)).isEmpty)
      .foreach(n => writeShardSidecar(spark, indexDir, "tok_parts", n, stampV))
  }

  /** Compact the index after a run of appends (the daily-add cadence):
    * re-establishes the postings' bucketed-by-token layout — appends
    * demote reads to plain unbucketed files, costing probes their
    * bucket pruning and shuffle-free token aggregation until this runs
    * ([[graft.sources.Versioned.compact]] re-buckets per the table's
    * last declared layout). BOTH tables compact so versions stay in
    * lockstep, POSTINGS FIRST: a crash between the two commits leaves
    * postings one version ahead with IDENTICAL content, which
    * [[repairBm25Index]] heals with an empty-delta catch-up commit —
    * the stats-first order would leave the unrepairable stats-ahead
    * shape.
    */
  def compactBm25Index(spark: SparkSession, indexDir: String): Long = {
    val postT = s"$indexDir/postings"
    val statT = s"$indexDir/stats"
    // a partition-layout index re-stamps its shard sidecar — and a
    // capped index its stop-list sidecar — at the new overwrite version
    // (compaction is an overwrite); both are read-validated BEFORE the
    // rewrite moves the stamp (a stale legacy state is never blessed
    // here: the compact proceeds and the index stays refused until
    // repairBm25Index adjudicates it)
    val nParts = partDirsOf(spark, indexDir)
    val state: Option[(Seq[String], Option[Double])] =
      try Some(stopStateOf(spark, indexDir))
      catch { case _: IllegalArgumentException => None }
    // RE-DERIVE the stop list when the build recorded its df ratio: the
    // compaction rewrites every postings byte anyway, so re-running the
    // heavy-token derivation is free — boilerplate that emerged AFTER
    // the build (a new spam template, a new crawl source) gets capped
    // at the next compaction instead of never, closing the Zipf gap on
    // a growing corpus. df comes off the postings themselves (one row
    // per (tok, doc)); stats stay TRUE corpus stats, so surviving terms
    // keep scoring exactly as on the uncapped twin — the q183 invariant.
    val recapped: Option[(Seq[String], Option[Double])] = state.map {
      case (toks, Some(r)) =>
        val nDocs = Versioned.read(spark, statT)
          .select(col("n_docs")).head.getLong(0)
        val newly = Versioned.read(spark, postT)
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .filter(col("df").cast("double") > lit(r) * nDocs)
          .collect().map(_.getString(0)).toSeq // bounded: ≤ 1/r tokens
        ((toks ++ newly).distinct.sorted, Some(r))
      case s => s
    }
    val dropped = recapped.map(_._1).getOrElse(Nil)
      .diff(state.map(_._1).getOrElse(Nil))
    // tombstone MERGE (the physical half of [[Tombstones]]' Lucene
    // split): the pending deletes' postings drop from the rewrite, and
    // stats subtract the dropped documents' denormalized lengths — after
    // this the index is row-identical to a fresh build without the docs
    // (post-merge df/cf derive per-query from the dropped postings).
    // The dropped (doc, dl) set comes off the postings BEFORE the
    // rewrite; the 1-row aggregate is a bounded control read. Known
    // epsilon (shared with repairBm25Index): a tombstoned document whose
    // every token was stop-capped has no postings row, so its length
    // stays in stats — a rebuild restores exact stats.
    val docX = docKeyExpr(spark, indexDir, col("doc_id"))
    val goneRow = Tombstones.hits(spark, indexDir,
        Versioned.read(spark, postT).select(col("doc_id"), col("dl")), docX)
      .distinct()
      .agg(count(lit(1)), sum(col("dl"))).head
    val nGone = goneRow.getLong(0)
    val dlGone = if (goneRow.isNullAt(1)) 0L else goneRow.getLong(1)
    // the epoch marker precedes the commit it describes, as at build
    val vPred = Versioned.latestVersion(spark, postT) + 1
    recapped.foreach { case (t, r) => writeStopEpoch(spark, indexDir, t, r, vPred) }
    val vp =
      if (dropped.isEmpty && nGone == 0L) Versioned.compact(spark, postT)
      else {
        // layout-preserving rewrite minus the newly-heavy tokens and the
        // tombstoned documents' rows
        val recapFiltered =
          if (dropped.isEmpty) Versioned.read(spark, postT)
          else Versioned.read(spark, postT)
            .filter(!col("tok").isInCollection(dropped))
        Versioned.overwriteLike(
          Tombstones.gate(spark, indexDir, recapFiltered, docX), postT)
      }
    val vs =
      if (nGone == 0L) Versioned.compact(spark, statT)
      else {
        // postings committed first, so a crash here leaves the
        // postings-ahead-with-REMOVED-content shape repairBm25Index
        // heals (it subtracts exactly the tombstoned gone-docs' stats)
        val corrected = Versioned.read(spark, statT).select(
          (col("n_docs") - lit(nGone)).cast("long").as("n_docs"),
          (col("sum_dl") - lit(dlGone)).cast("long").as("sum_dl"))
        Versioned.overwriteExpecting(corrected, statT, vp)
      }
    require(vp == vs, s"BM25 compaction left tables out of lockstep " +
      s"(postings v$vp, stats v$vs) — run repairBm25Index")
    nParts.foreach(n => writePartDirs(spark, indexDir, n, vp))
    recapped.foreach { case (t, r) =>
      if (vp != vPred) writeStopEpoch(spark, indexDir, t, r, vp)
      writeStopHead(spark, indexDir, t, r, vp)
    }
    vp
  }

  /** The query-term shard prune: layered over the always-correct token
    * filter when the index is partition-laid-out and the sidecar vouches
    * for the read's snapshot — the latest, or any pin INSIDE the live
    * layout epoch ([[shardSidecarFor]]); an older pin degrades to the
    * unpruned-but-correct scan.
    */
  private def shardPruned(spark: SparkSession, indexDir: String,
                          posts: DataFrame, terms: Seq[String],
                          asOf: Option[Long]): DataFrame =
    if (!posts.columns.contains("tok_part")) posts
    else shardSidecarFor(spark, indexDir, "tok_parts", "postings", asOf) match {
      case Some(n) => posts.filter(col("tok_part")
        .isInCollection(terms.map(tokPartOf(_, n)).distinct))
      case None => posts
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
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    val tf = shardPruned(spark, indexDir,
        Versioned.read(spark, s"$indexDir/postings", asOf), terms, asOf)
      .filter(col("tok").isInCollection(terms))
      .select(col("doc_id"), col("dl"), col("tok"), col("tf"))
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    // pending deletes gate the scored set pre-ranking (stats/df stay
    // pre-delete until compaction — the Lucene split, see [[Tombstones]])
    tombGate(spark, indexDir, scoreDocs(tf, stats, k1, b), "doc_id")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Postings columns beyond the core shape = caller-baked metadata
    * (the filtered-probe gate columns). */
  private def postingsMetaCols(posts: DataFrame): Seq[String] =
    posts.columns.toSeq.filterNot(
      Set("tok", "doc_id", "tf", "dl", "positions", "tok_part"))

  private def requirePostingsPredicate(indexDir: String, posts: DataFrame,
                                       predicate: Column): Unit =
    try posts.filter(predicate).queryExecution.analyzed: Unit
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"$indexDir postings cannot resolve the probe predicate " +
            s"`$predicate` — the filtered probe gates candidates inside " +
            "the token-pruned scan, so the predicate may only reference " +
            "columns baked into the index at build (metaCols; available " +
            s"metadata here: ${postingsMetaCols(posts) match {
              case Nil => "none — this index was built without metaCols"
              case ms => ms.mkString(", ")
            }}). Rebuild with the column in metaCols, or gate through a " +
            s"doc-meta relation joined post-probe. Analyzer: ${
              e.getSimpleMessage}", e)
    }

  /** Metadata-FILTERED BM25 probe — the lexical half of filtered
    * retrieval ([[graft.operators.Similarity.queryIvfIndexFiltered]] is
    * the embedding half): the caller's predicate gates CANDIDATES, over
    * columns baked into the postings rows at build (`metaCols` —
    * denormalized per posting exactly like the doc length, so the gate
    * runs inside the token-pruned scan with no doc-meta join per
    * query). Semantics follow Lucene's filtered search: term statistics
    * stay INDEX-GLOBAL — df counts every matching document, gated or
    * not, and the corpus stats table is untouched — so a document's
    * score is IDENTICAL to its unfiltered score (the gate changes WHO
    * ranks, never HOW a survivor scores; a sub-corpus re-weighting
    * would make the same document score differently under every gate,
    * and both df variants read the same token-pruned slice anyway).
    * The gate applies to the full matching set BEFORE ranking (the
    * no-starvation contract), and a predicate naming a column the
    * index lacks refuses loudly.
    */
  def queryBm25IndexFiltered(spark: SparkSession, indexDir: String,
                             terms: Seq[String], k: Int, predicate: Column,
                             k1: Double = K1, b: Double = B,
                             asOf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    val posts = Versioned.read(spark, s"$indexDir/postings", asOf)
    requirePostingsPredicate(indexDir, posts, predicate)
    val slice = shardPruned(spark, indexDir, posts, terms, asOf)
      .filter(col("tok").isInCollection(terms))
    // df from the UNgated slice (index-global idf), scoring over the
    // gated rows — both consume the same token-pruned scan
    val dfTab = slice.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    tombGate(spark, indexDir, slice.filter(predicate)
      .select(col("doc_id"), col("dl"), col("tok"), col("tf"))
      .join(dfTab, Seq("tok"))
      .crossJoin(stats) // 1 row — broadcast nested loop by construction
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
           sum(bmTermExpr(k1, b).cast("decimal(27,10)")).as("s"))
      .select(col("doc_id"), col("n_terms"), col("s").cast("double").as("score")),
      "doc_id")
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
  /** The multi-query postings probe: the (query, posting) equality join
    * BEFORE scoring. On a partition-layout index the broadcast term
    * join carries the shard column, so Spark DPP prunes unprobed
    * token-shard DIRECTORIES' bytes at run time — the lever a dynamic
    * term set cannot get from bucketing (a literal IN would need the
    * terms at plan time). Package-visible so the plan audit can assert
    * the dynamicpruning subquery on the fragment that actually runs it
    * ([[queryBm25IndexMany]] stages this behind a checkpoint seam).
    */
  private[graft] def bm25ManyHits(spark: SparkSession, indexDir: String,
                                  queries: DataFrame,
                                  asOf: Option[Long]): DataFrame = {
    val postsAll = Versioned.read(spark, s"$indexDir/postings", asOf)
    val partN =
      if (postsAll.columns.contains("tok_part"))
        shardSidecarFor(spark, indexDir, "tok_parts", "postings", asOf)
      else None
    val posts = postsAll.select(
      (partN.map(_ => col("tok_part")).toSeq ++
        Seq(col("doc_id"), col("dl"), col("tok"), col("tf")) ++
        postingsMetaCols(postsAll).map(col)): _*)
    val qt0 = queries
      .select(col("query_id"), explode(col("terms")).as("tok")).distinct()
    val (qt, joinKeys) = partN match {
      case Some(n) =>
        (qt0.withColumn("tok_part", tokPartExpr(col("tok"), n)),
          Seq("tok_part", "tok"))
      case None => (qt0, Seq("tok"))
    }
    posts.join(broadcast(qt), joinKeys)
  }

  def queryBm25IndexMany(spark: SparkSession, indexDir: String,
                         queries: DataFrame, k: Int,
                         k1: Double = K1, b: Double = B,
                         asOf: Option[Long] = None): DataFrame = {
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    // the pruned (query, posting) slice feeds BOTH df and scoring —
    // stage it (bounded by Σ per-query postings, not the corpus); the
    // join fragment runs as its own job, so its DPP fires there (and is
    // plan-audited there — the downstream plan only sees the RDD seam)
    val hits = bm25ManyHits(spark, indexDir, queries, asOf)
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
    Ranking.topPerGroup(tombGate(spark, indexDir, scored, "doc_id"),
        Seq(col("query_id")), Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("query_id"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  /** [[queryBm25IndexFiltered]] at serving batch width — MANY queries,
    * one predicate-gated postings pass: identical probe shape to
    * [[queryBm25IndexMany]] (broadcast term join, DPP on a partition
    * layout — the hits carry the baked metadata columns through the
    * seam), df stays INDEX-GLOBAL per query (Lucene filtered-search
    * semantics: the gate changes WHO ranks, never how a survivor
    * scores), and the gate applies to the full matching set before
    * ranking. Output: (query_id, doc_id, n_terms, score) top-k/query.
    */
  def queryBm25IndexManyFiltered(spark: SparkSession, indexDir: String,
                                 queries: DataFrame, k: Int,
                                 predicate: Column,
                                 k1: Double = K1, b: Double = B,
                                 asOf: Option[Long] = None): DataFrame = {
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    requirePostingsPredicate(indexDir,
      Versioned.read(spark, s"$indexDir/postings", asOf), predicate)
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    val hits = bm25ManyHits(spark, indexDir, queries, asOf)
      .localCheckpoint(eager = false)
    val dfTab = hits.groupBy(col("query_id"), col("tok"))
      .agg(count(lit(1)).as("df"))
    val scored = hits.filter(predicate)
      .join(dfTab, Seq("query_id", "tok"))
      .crossJoin(stats)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
           sum(bmTermExpr(k1, b).cast("decimal(27,10)")).as("s"))
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("s").cast("double").as("score"))
    Ranking.topPerGroup(tombGate(spark, indexDir, scored, "doc_id"),
        Seq(col("query_id")), Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("query_id"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  // ------------------------------------------------------ facet counts

  /** FACET COUNTS over filtered retrieval — the serving aggregate every
    * search UI mounts beside its top-k: per gate-column value, the
    * count of the FULL eligible matching set (documents matching ≥1
    * query term AND the predicate, minus pending deletes) — NOT of the
    * truncated top-k. Rides exactly the probe's own slice: the token
    * filter pushes into the (bucket/shard-pruned) postings scan, the
    * facet columns were baked onto the postings rows at build
    * (`metaCols` — the dl denormalization discipline), and the count is
    * one distinct-doc aggregation over that slice, so facet bytes ==
    * probe bytes and no doc-meta table joins at query time. Facet and
    * predicate columns must be baked; un-baked names refuse loudly.
    * Output: (facetCols…, n_docs), ordered by the facet columns.
    */
  def bm25Facets(spark: SparkSession, indexDir: String, terms: Seq[String],
                 facetCols: Seq[String], predicate: Option[Column] = None,
                 asOf: Option[Long] = None): DataFrame =
    facetsOf(spark, indexDir,
      facetSlice(spark, indexDir, terms, facetCols, predicate, asOf),
      facetCols)

  /** Ranking AND facets off ONE physical pass: the token-pruned slice
    * stages once (lazy localCheckpoint — the first action materializes
    * it, the second reuses the rows), the left half is exactly
    * [[queryBm25IndexFiltered]]'s ranking and the right half exactly
    * [[bm25Facets]]' counts (both spec-asserted). This is the serving
    * shape: a UI needs both per request, and paying the probe scan
    * twice would double the per-request index bytes.
    */
  def queryBm25IndexFaceted(spark: SparkSession, indexDir: String,
                            terms: Seq[String], k: Int,
                            facetCols: Seq[String],
                            predicate: Option[Column] = None,
                            k1: Double = K1, b: Double = B,
                            asOf: Option[Long] = None)
      : (DataFrame, DataFrame) = {
    // the slice rows already carry INDEX-GLOBAL df (facetSlice joins it
    // pre-gate — Lucene filtered semantics: survivor scores equal their
    // unfiltered scores), so ranking needs no second df pass
    val slice = facetSlice(spark, indexDir, terms, facetCols, predicate,
      asOf).localCheckpoint(eager = false)
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    val ranked = tombGate(spark, indexDir, slice
      .crossJoin(stats) // 1 row — broadcast nested loop by construction
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
           sum(bmTermExpr(k1, b).cast("decimal(27,10)")).as("s"))
      .select(col("doc_id"), col("n_terms"),
        col("s").cast("double").as("score")), "doc_id")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    (ranked, facetsOf(spark, indexDir, slice, facetCols))
  }

  /** The shared eligible slice: token-pruned postings rows with
    * INDEX-GLOBAL df joined on (computed pre-gate, so survivor scores
    * equal their unfiltered scores), then predicate-gated. Carries
    * (doc_id, dl, tok, tf, df, facetCols…).
    */
  private def facetSlice(spark: SparkSession, indexDir: String,
                         terms: Seq[String], facetCols: Seq[String],
                         predicate: Option[Column],
                         asOf: Option[Long]): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(facetCols.nonEmpty, "need at least one facet column")
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    val posts = Versioned.read(spark, s"$indexDir/postings", asOf)
    predicate.foreach(requirePostingsPredicate(indexDir, posts, _))
    val missing = facetCols.filterNot(postingsMetaCols(posts).contains)
    require(missing.isEmpty,
      s"$indexDir postings do not carry facet column(s) " +
        s"${missing.mkString(", ")} — facets count inside the token-pruned " +
        "scan, so the columns must be baked at build (metaCols; available: " +
        s"${postingsMetaCols(posts) match {
          case Nil => "none"; case ms => ms.mkString(", ") }})")
    val slice = shardPruned(spark, indexDir, posts, terms, asOf)
      .filter(col("tok").isInCollection(terms))
    val dfTab = slice.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val gated = predicate.map(slice.filter).getOrElse(slice)
    gated.select((col("doc_id") +: col("dl") +: col("tok") +: col("tf") +:
        facetCols.map(col)): _*)
      .join(dfTab, Seq("tok"))
  }

  private def facetsOf(spark: SparkSession, indexDir: String,
                       slice: DataFrame, facetCols: Seq[String]): DataFrame =
    tombGate(spark, indexDir,
        slice.select((col("doc_id") +: facetCols.map(col)): _*).distinct(),
        "doc_id")
      .groupBy(facetCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(facetCols.map(col(_).asc): _*)

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
    * SIGIR 2001) — the second classic ranker beside BM25, over the SAME
    * inverted index: score(q,d) = Σ_{w∈q} ln((tf(w,d) + μ·P(w|C)) /
    * (dl + μ)), with the collection model P(w|C) = cf(w)/|C| and
    * μ = 2000 the published default. Candidates are documents matching
    * ≥1 query term (standard inverted-index behavior), each scored with
    * the FULL smoothed likelihood over every query term — an unmatched
    * term contributes its smoothing mass, so long documents do not get
    * a free ride on partial matches. Query terms absent from the corpus
    * drop (their collection probability is zero — the standard
    * treatment). Per-doc sums ride DECIMAL(27,10), so the double scores
    * replay exactly in SQL.
    *
    * Scale shape: identical to [[queryBm25Index]] — the probe touches
    * only the query terms' postings (bucket/shard-pruned by layout);
    * cf and the candidate set both derive from that pruned slice; the
    * candidate × term grid is |cand|·|terms| rows with the |terms|-row
    * cf table broadcast. Output: (doc_id, n_terms, score) top-k by
    * (score desc, doc_id asc); n_terms counts MATCHED terms.
    */
  def queryQlIndex(spark: SparkSession, indexDir: String,
                   terms: Seq[String], k: Int, mu: Double = 2000.0,
                   asOf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "QL needs at least one query term")
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    // the pruned slice feeds cf, the candidate set, AND the tf join —
    // stage it (≤ |terms| rows per matching doc, the bm25Scores rule)
    val pruned = shardPruned(spark, indexDir,
        Versioned.read(spark, s"$indexDir/postings", asOf), terms, asOf)
      .filter(col("tok").isInCollection(terms))
      .select(col("doc_id"), col("dl"), col("tok"), col("tf"))
      .localCheckpoint(eager = false)
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    val cf = pruned.groupBy(col("tok")).agg(sum(col("tf")).as("cf"))
    val cand = pruned.select(col("doc_id"), col("dl")).distinct()
    val scoredQl = cand.crossJoin(broadcast(cf))
      .join(pruned.select(col("doc_id"), col("tok"), col("tf")),
        Seq("doc_id", "tok"), "left")
      .crossJoin(stats)
      .withColumn("__s", log(
        (coalesce(col("tf"), lit(0L)).cast("double") +
          lit(mu) * (col("cf").cast("double") / col("sum_dl").cast("double"))) /
        (col("dl").cast("double") + lit(mu))))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("tf").isNotNull, 1L).otherwise(0L)).as("n_terms"),
        sum(col("__s").cast("decimal(27,10)")).as("__sc"))
      .select(col("doc_id"), col("n_terms"),
        col("__sc").cast("double").as("score"))
    tombGate(spark, indexDir, scoredQl, "doc_id")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** MANY queries scored under Dirichlet QL in ONE postings pass — the
    * [[queryBm25IndexMany]] shape for the second ranker: the (query,
    * posting) slice from [[bm25ManyHits]] (DPP-pruned on a partition
    * layout) feeds cf, the candidate set, and the tf join per query; a
    * 1-query batch returns exactly [[queryQlIndex]]'s rows. This is
    * what lets QL serve as a fusion arm at ANY grain — the chunk-grain
    * hybrid passes its composite-keyed index through unchanged. Output:
    * (query_id, doc_id, n_terms, score), top-k per query.
    */
  def queryQlIndexMany(spark: SparkSession, indexDir: String,
                       queries: DataFrame, k: Int, mu: Double = 2000.0,
                       asOf: Option[Long] = None): DataFrame = {
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    if (asOf.isEmpty) {
      val vp = Versioned.latestVersion(spark, s"$indexDir/postings")
      val vs = Versioned.latestVersion(spark, s"$indexDir/stats")
      require(vp == vs, s"BM25 index tables out of lockstep (postings v$vp, " +
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    val stats = Versioned.read(spark, s"$indexDir/stats", asOf)
    val hits = bm25ManyHits(spark, indexDir, queries, asOf)
      .select(col("query_id"), col("doc_id"), col("dl"), col("tok"),
        col("tf"))
      .localCheckpoint(eager = false)
    val cf = hits.groupBy(col("query_id"), col("tok"))
      .agg(sum(col("tf")).as("cf"))
    val cand = hits.select(col("query_id"), col("doc_id"), col("dl"))
      .distinct()
    val scored = cand.join(broadcast(cf), Seq("query_id"))
      .join(hits.select(col("query_id"), col("doc_id"), col("tok"),
        col("tf")), Seq("query_id", "doc_id", "tok"), "left")
      .crossJoin(stats)
      .withColumn("__s", log(
        (coalesce(col("tf"), lit(0L)).cast("double") +
          lit(mu) * (col("cf").cast("double") / col("sum_dl").cast("double"))) /
        (col("dl").cast("double") + lit(mu))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(when(col("tf").isNotNull, 1L).otherwise(0L)).as("n_terms"),
        sum(col("__s").cast("decimal(27,10)")).as("__sc"))
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("__sc").cast("double").as("score"))
    Ranking.topPerGroup(tombGate(spark, indexDir, scored, "doc_id"),
        Seq(col("query_id")), Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("query_id"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  /** Dirichlet QL over the chunk-grain index; output matches
    * [[queryChunkBm25Index]]'s shape: (doc_id, chunk_start, n_terms,
    * score) — the index machinery is grain-agnostic, the composite-key
    * decode is the only seam.
    */
  def queryChunkQlIndex(spark: SparkSession, indexDir: String,
                        terms: Seq[String], k: Int, mu: Double = 2000.0,
                        asOf: Option[Long] = None): DataFrame =
    decodeChunkKey(queryQlIndex(spark, indexDir, terms, k, mu, asOf))

  /** Pseudo-relevance-feedback query expansion (RM3-style — Lavrenko &
    * Croft's relevance models, SIGIR 2001; the uniform-weight requery
    * simplification): rank once, treat the top `kFb` documents as
    * pseudo-relevant, mine their INDEX POSTINGS for the `nExp`
    * highest-mass expansion terms (mass(w) = Σ_fb tf(w,d)/dl(d) ·
    * score(d) — term likelihood weighted by document relevance, summed
    * in DECIMAL so the cut replays exactly), and re-rank with the
    * original ∪ expansion term set. The synonym-bridge effect: a
    * document sharing NO original term surfaces when it shares the
    * feedback set's vocabulary.
    *
    * Everything is index-only — the feedback pass, the term mining
    * (feedback doc ids broadcast ONTO the postings scan), and the
    * requery (the expanded set is DATA, so it rides the dynamic-term
    * [[queryBm25IndexMany]] machinery — on a partition-layout index the
    * requery DPP-prunes like any dynamic batch); no text is re-read
    * and nothing is collected to the driver. The MINING pass has two
    * forms: without `forwardDir` it reads the postings bytes once — a
    * token-ordered layout scatters the kFb feedback docs' rows across
    * every bucket, so doc-id pruning has nothing to prune, and a
    * deployment that expands every query pays a corpus-sized read per
    * batch. With `forwardDir` (a [[buildForwardIndex]] artifact over
    * the SAME corpus) the feedback docs' tf/dl mine from the doc-keyed
    * forward rows instead: the kFb ids broadcast onto the forward scan
    * and DPP prunes to their doc-shard directories — mining bytes
    * become O(kFb docs), independent of corpus size. Both forms
    * compute identical masses (forward tf is a recount of the same
    * token stream the postings aggregated), so the expansion — and the
    * final ranking — is the same. Output: (doc_id, n_terms, score)
    * top-k under the expanded query.
    */
  def rm3Expand(spark: SparkSession, indexDir: String, terms: Seq[String],
                k: Int, kFb: Int = 5, nExp: Int = 5,
                k1: Double = K1, b: Double = B,
                asOf: Option[Long] = None,
                forwardDir: Option[String] = None): DataFrame = {
    require(kFb > 0 && nExp >= 0, s"need kFb > 0, nExp >= 0")
    val fb = constraintFreeStage(
      queryBm25Index(spark, indexDir, terms, kFb, k1, b, asOf)
        .select(col("doc_id"), col("score")))
      // feeds the doc-set probe AND the score join — one probe, not two
    val mined = forwardDir match {
      case Some(fd) =>
        forwardFor(spark, fd, fb, Seq("dl", "toks"), asOf)
          .join(broadcast(fb), Seq("doc_id"))
          .select(col("doc_id"), col("dl"), col("score"),
            explode(col("toks")).as("tok"))
          .groupBy(col("doc_id"), col("dl"), col("score"), col("tok"))
          .agg(count(lit(1)).as("tf"))
      case None =>
        Versioned.read(spark, s"$indexDir/postings", asOf)
          .join(broadcast(fb), Seq("doc_id"))
    }
    val expansion = mined
      .filter(!col("tok").isInCollection(terms))
      .groupBy(col("tok"))
      .agg(sum(((col("tf").cast("double") / col("dl").cast("double")) *
        col("score")).cast("decimal(27,10)")).as("w"))
      .orderBy(col("w").desc, col("tok").asc)
      .limit(nExp)
    import spark.implicits._
    val expanded = expansion.select(col("tok"))
      .unionByName(terms.toDF("tok"))
      .agg(collect_set(col("tok")).as("terms"))
      .select(lit(0L).as("query_id"), col("terms"))
    queryBm25IndexMany(spark, indexDir, expanded, k, k1, b, asOf)
      .select(col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** RM3 expansion over the CHUNK-grain index — the machinery is
    * index-shape agnostic (feedback "documents" are chunks; mining runs
    * over the chunk postings, which is the index-only form — the
    * doc-grain forward index does not apply at ck grain), and the
    * composite key decodes to attributed spans: pseudo-relevance
    * feedback at the grain the RAG stack serves, where the synonym
    * bridge surfaces a SPAN sharing no original term. Output matches
    * [[queryChunkBm25Index]]: (doc_id, chunk_start, n_terms, score).
    */
  def rm3ExpandChunks(spark: SparkSession, indexDir: String,
                      terms: Seq[String], k: Int, kFb: Int = 5,
                      nExp: Int = 5, k1: Double = K1, b: Double = B,
                      asOf: Option[Long] = None): DataFrame =
    decodeChunkKey(
      rm3Expand(spark, indexDir, terms, k, kFb, nExp, k1, b, asOf))
      .orderBy(col("score").desc, col("doc_id").asc, col("chunk_start").asc)

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
        s"stats v$vs) — an append or build crashed between commits; run " +
        "repairBm25Index, or pin an intact version with asOf")
    }
    val posts = Versioned.read(spark, s"$indexDir/postings", asOf)
    val partN =
      if (asOf.isEmpty && posts.columns.contains("tok_part"))
        partDirsOf(spark, indexDir)
      else None
    val slices = phrase.zipWithIndex.map { case (t, j) =>
      partN.fold(posts)(n =>
          posts.filter(col("tok_part") === lit(tokPartOf(t, n))))
        .filter(col("tok") === lit(t))
        .select(col("doc_id"),
          transform(col("positions"), p => p - j).as(s"p$j"))
    }
    val joined = slices.reduce((a, b) => a.join(b, Seq("doc_id")))
    val inter = (1 until phrase.length).foldLeft(col("p0"))((acc, j) =>
      array_intersect(acc, col(s"p$j")))
    tombGate(spark, indexDir,
        joined.select(col("doc_id"), size(inter).cast("long").as("n_occur")),
        "doc_id")
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
                         size: Int, stride: Int,
                         metaCols: Seq[String] = Nil): DataFrame = {
    val chunked = Corpus.chunk(docs, id, text, size, stride)
      .filter(assert_true(
        col("doc_id") >= 0 && col("doc_id") < lit(1L << 31) &&
          col("chunk_start") < lit(ChunkKeyBase),
        lit(s"chunk key overflow: need 0 <= doc_id < 2^31 and chunk_start " +
          "< 2^32 for span-exact attribution (negative ids would decode " +
          "to the wrong span)")).isNull)
    // a chunk inherits its document's metadata (the filtered-search
    // gate columns) — one build-cadence equality join by doc id
    val withM =
      if (metaCols.isEmpty) chunked
      else chunked.join(
        docs.select((id.as("doc_id") +: metaCols.map(col)): _*), Seq("doc_id"))
    withM.select(((col("doc_id") * lit(ChunkKeyBase) + col("chunk_start"))
      .as("ck") +: col("chunk_text") +: metaCols.map(col)): _*)
  }

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
  /** [[heavyTokens]] at CHUNK grain — df counts chunks containing the
    * token (what the chunk index's postings lists are sized by), over
    * the same window grid the index will use. The stop-set derivation
    * for a df-capped [[buildChunkBm25Index]].
    */
  def heavyChunkTokens(docs: DataFrame, id: Column, text: Column,
                       size: Int, stride: Int,
                       maxDfRatio: Double): DataFrame =
    heavyTokens(chunkKeyed(docs, id, text, size, stride),
      col("ck"), col("chunk_text"), maxDfRatio)

  def buildChunkBm25Index(docs: DataFrame, id: Column, text: Column,
                          indexDir: String, size: Int, stride: Int,
                          nBuckets: Int = 8,
                          stopTokens: Seq[String] = Nil,
                          stopMaxDfRatio: Option[Double] = None,
                          metaCols: Seq[String] = Nil): Long = {
    require(size > 0 && stride > 0)
    // the df cap applies at chunk grain too — at 100 TB the chunk index
    // is the LARGER postings artifact, and a stop token's chunk-grain
    // list is size/stride× the doc-grain one; appends inherit the
    // frozen set through the shared stop_toks sidecar, and a recorded
    // ratio has [[compactBm25Index]] re-derive the set over the grown
    // chunk corpus (chunk-grain df: chunks containing the token).
    // metaCols: chunks inherit their document's gate columns, so
    // [[queryChunkBm25IndexFiltered]] gates spans inside the pruned scan
    val v = buildBm25Index(chunkKeyed(docs, id, text, size, stride, metaCols),
      col("ck"), col("chunk_text"), indexDir, nBuckets,
      stopTokens = stopTokens, stopMaxDfRatio = stopMaxDfRatio,
      metaCols = metaCols)
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

  /** Last "overwrite" version of the index's stamp table — the
    * snapshot a grid/sidecar stamp must match (appends keep it; builds
    * and compactions move it). `postings` for the lexical index,
    * `assignment` for the chunk ANN index.
    */
  private[operators] def lastOverwriteOf(spark: SparkSession, indexDir: String,
                              table: String): Long =
    Versioned.history(spark, s"$indexDir/$table")
      .collect { case (v, "overwrite", _) => v }.lastOption
      .getOrElse(sys.error(s"$indexDir/$table has no overwrite commit"))

  private def lastPostingsOverwrite(spark: SparkSession,
                                    indexDir: String): Long =
    lastOverwriteOf(spark, indexDir, "postings")

  /** The build-time window grid of a chunk-grain index, trusted ONLY
    * when its stamp matches the postings' current overwrite snapshot.
    * Fails loudly on: a plain BM25 index (no sidecar — appending
    * document text to a chunk index or vice versa is the
    * silent-corruption path this closes), a sidecar truncated by a
    * crashed write, or a stamp from a superseded build/compaction (a
    * rebuild or compact died between its two writes) — each with the
    * recovery spelled out instead of mis-chunked spans.
    */
  def chunkGrid(spark: SparkSession, indexDir: String,
                stampTable: String = "postings"): (Int, Int) = {
    val p = chunkGridPath(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p), s"$indexDir carries no chunk_grid sidecar — " +
      "not a chunk-grain index (or a pre-grid build); rebuild with " +
      "buildChunkBm25Index / buildChunkIvfIndex")
    val in = f.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    raw.trim.split(" ") match {
      case Array(s, st, v) if Seq(s, st, v).forall(_.forall(_.isDigit)) =>
        require(v.toLong == lastOverwriteOf(spark, indexDir, stampTable),
          s"$indexDir chunk_grid stamp v$v does not match the " +
            s"$stampTable table's current overwrite snapshot — a rebuild " +
            "or compaction died between its index commit and the grid " +
            "stamp, so the recorded grid cannot be trusted to describe " +
            "the current build; rebuild the index")
        (s.toInt, st.toInt)
      case _ => sys.error(s"$indexDir chunk_grid sidecar is corrupt " +
        s"('${raw.take(40)}') — a crashed write; rebuild the index")
    }
  }

  /** True iff the chunk_grid sidecar is present, parseable, and its
    * stamp matches the stamp table's current overwrite snapshot — the
    * routing predicate a self-healing maintenance stage uses to decide
    * build-vs-append (a crashed build leaves tables without a trusted
    * grid; the heal is a rebuild, which the build path owns).
    */
  def chunkGridHealthy(spark: SparkSession, indexDir: String,
                       stampTable: String = "postings"): Boolean =
    try { chunkGrid(spark, indexDir, stampTable); true }
    catch { case _: Exception => false }

  /** Re-stamp the chunk_grid sidecar after a crashed COMPACTION moved
    * the stamp table's overwrite snapshot past the stamp — the
    * [[restampTokParts]] discipline applied to the grid: without it the
    * index is permanently refused even though the recorded grid is
    * fully recoverable, and a maintenance-grain operator that obeyed
    * the rebuild message would rebuild from one day's batch, silently
    * dropping prior days. The stamp is restored ONLY when the current
    * overwrite snapshot's content is IDENTICAL to the version before it
    * — true for a compaction (a pure rewrite), false for a
    * grid-CHANGING rebuild (different window ⇒ different ck keys ⇒
    * different rows), which stays refused with the manual-rebuild
    * message. No-op when the grid is already trusted, the sidecar is
    * absent/corrupt, or nothing on disk can prove the rewrite was pure.
    * Content comparison is a maintenance-cadence cost, paid only on the
    * crash-recovery path.
    */
  def restampChunkGrid(spark: SparkSession, indexDir: String,
                       stampTable: String = "postings"): Unit = {
    if (chunkGridHealthy(spark, indexDir, stampTable)) return
    val p = chunkGridPath(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return
    val in = f.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    raw.trim.split(" ") match {
      case Array(s, st, v) if Seq(s, st, v).forall(_.forall(_.isDigit)) =>
        val t = s"$indexDir/$stampTable"
        val vNew =
          try lastOverwriteOf(spark, indexDir, stampTable)
          catch { case _: Exception => return }
        // vNew == 0 is a first build with nothing before it to verify
        // against; vNew <= recorded stamp is a foreign shape
        if (vNew <= v.toLong || vNew == 0L) return
        // a rewrite is grid-preserving when it ADDED nothing and removed
        // at most TOMBSTONED documents' rows (a pure compaction, or a
        // crashed tombstone merge — survivors keep their ck keys, so the
        // recorded grid still describes them); a grid-CHANGING rebuild
        // adds re-keyed rows and stays refused
        val now  = Versioned.read(spark, t, Some(vNew))
        val prev = Versioned.read(spark, t, Some(vNew - 1))
        val keyCol = if (now.columns.contains("doc_id")) "doc_id" else "cand_id"
        val goneUntombed = Tombstones.of(spark, indexDir) match {
          case None => prev.exceptAll(now)
          case Some(tb) => prev.exceptAll(now).join(
            broadcast(tb.select(col("doc_id").as("__ts_doc"))),
            shiftright(col(keyCol), 32) === col("__ts_doc"), "left_anti")
        }
        if (now.exceptAll(prev).isEmpty && goneUntombed.isEmpty)
          writeChunkGrid(spark, indexDir, s.toInt, st.toInt, vNew)
      case _ => ()
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

  /** [[queryBm25IndexFiltered]] at chunk grain: the gate columns were
    * inherited from each chunk's DOCUMENT at build, so a span ranks
    * only if its document passes — language/license gates compose with
    * span-exact attribution at no per-query join. Same Lucene
    * semantics: chunk df stays index-global, survivors score exactly
    * as unfiltered.
    */
  def queryChunkBm25IndexFiltered(spark: SparkSession, indexDir: String,
                                  terms: Seq[String], k: Int,
                                  predicate: Column,
                                  asOf: Option[Long] = None): DataFrame =
    decodeChunkKey(queryBm25IndexFiltered(spark, indexDir, terms, k,
      predicate, asOf = asOf))

  /** Append a document batch's chunks to the chunk-grain index —
    * [[appendToBm25Index]] semantics (new keys only, stats merge under
    * CAS). The window grid comes from the index's own sidecar, never
    * from the caller: there is no way to append a mismatched grid.
    */
  def appendToChunkBm25Index(batch: DataFrame, id: Column, text: Column,
                             indexDir: String): Long = {
    val spark = batch.sparkSession
    val (size, stride) = chunkGrid(spark, indexDir)
    // a metadata-carrying chunk index derives its gate columns from the
    // index itself, never the caller — appendToBm25Index then enforces
    // the batch actually supplies them
    val meta = postingsMetaCols(Versioned.read(spark, s"$indexDir/postings"))
    appendToBm25Index(chunkKeyed(batch, id, text, size, stride,
        meta.filter(batch.columns.contains)),
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

  /** [[hybridSearch]] with ONE metadata gate applied to BOTH arms —
    * end-to-end FILTERED retrieval, the shape a multilingual /
    * license-gated RAG deployment actually serves: the lexical arm
    * gates inside its token-pruned postings scan
    * ([[queryBm25IndexManyFiltered]] — gate columns denormalized onto
    * postings rows at build), the semantic arm inside its probed
    * centroid buckets ([[Similarity.queryIvfIndexFiltered]] — gate
    * columns baked onto assignment rows), and BOTH apply the gate to
    * the full scored set before their top-kEach (no arm can starve on
    * gated neighbors), so the fusion sees only eligible documents.
    * The SAME Column predicate resolves against each index's own baked
    * columns — build both with the same metaCols names; either side
    * missing them refuses loudly.
    */
  def hybridSearchFiltered(spark: SparkSession, bm25Dir: String,
                           ivfDir: String, queries: DataFrame, k: Int,
                           predicate: Column,
                           kEach: Int = 20, nProbes: Int = 4, c: Int = 60,
                           bm25AsOf: Option[Long] = None,
                           ivfAsOf: Option[Long] = None): DataFrame = {
    val lex = queryBm25IndexManyFiltered(spark, bm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, predicate,
        asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val sem = Similarity.queryIvfIndexFiltered(spark, ivfDir,
        queries.select(col("query_id").as("id"), col("vec")), kEach,
        predicate, nProbes, asOf = ivfAsOf)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("sim").as("score"))
    rrfFuse(Seq(lex, sem), k, c)
  }

  /** [[hybridSearch]] with the semantic arm upgraded to the engine's
    * declared ANN scale path — the COMPRESSED index plus exact re-rank
    * ([[Similarity.queryIvfPqIndexReranked]]): the ADC scan shortlists
    * kEach·alpha candidates per query at code-width bytes, the exact
    * full-precision dot re-scores only the shortlist (DPP-fetched from
    * the index's own vectors table — never a corpus scan, never a
    * caller-supplied corpus that could drift stale), and the re-ranked
    * top-kEach fuses with the lexical ranking under RRF. At 100 TB
    * this is the serving pair a deployment actually runs: postings
    * pruned by token on one arm, ~nProbes/nCentroids ÷ 32 of the
    * vector bytes + |Q|·kEach·alpha exact dots on shard-pruned
    * directories on the other. `alpha` is the semantic arm's recall
    * dial; both indexes pin their own version.
    */
  def hybridSearchPq(spark: SparkSession, bm25Dir: String, pqDir: String,
                     queries: DataFrame, k: Int,
                     kEach: Int = 20, alpha: Int = 4, nProbes: Int = 4,
                     c: Int = 60, m: Int = 8, ks: Int = 16, dim: Int = 64,
                     residual: Boolean = false,
                     bm25AsOf: Option[Long] = None,
                     pqAsOf: Option[Long] = None): DataFrame = {
    val lex = queryBm25IndexMany(spark, bm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val sem = Similarity.queryIvfPqIndexReranked(spark, pqDir,
        queries.select(col("query_id").as("id"), col("vec")),
        kEach, alpha, nProbes, pqAsOf, m, ks, dim, residual)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("dot").as("score"))
    rrfFuse(Seq(lex, sem), k, c)
  }

  // --------------------------------------------- chunk-grain hybrid RAG

  /** Build the chunk-grain ANN index — the semantic twin of
    * [[buildChunkBm25Index]]: documents chunk into the same keyed
    * windows, each chunk embeds via the deterministic feature-hash
    * encoder ([[Corpus.hashEmbed]] — the SQL-replayable stand-in for a
    * neural encoder; a deployment swaps in its model's vectors at this
    * exact seam), and the vectors build a persisted IVF index keyed by
    * ck. The window grid persists beside the index stamped against the
    * ASSIGNMENT table's overwrite snapshot, so the fusion path can
    * refuse to fuse two indexes chunked on different grids.
    */
  def buildChunkIvfIndex(docs: DataFrame, id: Column, text: Column,
                         indexDir: String, size: Int, stride: Int,
                         dim: Int = 64, nCentroids: Int = 16,
                         lloydIters: Int = 0, nBuckets: Int = 8,
                         metaCols: Seq[String] = Nil): Long = {
    require(size > 0 && stride > 0)
    val chunked = chunkKeyed(docs, id, text, size, stride, metaCols)
    val vecs0 = Corpus.hashEmbed(chunked, col("ck"), col("chunk_text"), dim)
    // chunks inherit their document's gate columns (chunkKeyed carried
    // them); bake them onto the assignment so the filtered probe gates
    // spans inside the probed buckets
    val vecs =
      if (metaCols.isEmpty) vecs0
      else vecs0.join(
        chunked.select((col("ck").as("id") +: metaCols.map(col)): _*),
        Seq("id"))
    val v = Similarity.buildIvfIndex(vecs, indexDir, nCentroids,
      lloydIters, nBuckets, metaCols = metaCols)
    writeChunkGrid(docs.sparkSession, indexDir, size, stride, v)
    v
  }

  /** Append a document batch's chunks to the chunk-grain ANN index:
    * grid from the index's own sidecar (no way to append a mismatched
    * window), embeddings from the SAME feature-hash encoder (`dim`
    * must match the build's), then FAISS-add semantics via
    * [[Similarity.appendToIvfIndex]] (frozen centroids). Assignment
    * APPENDS keep the grid stamp valid — only rebuilds and compactions
    * move the overwrite snapshot, and [[compactChunkIvfIndex]]
    * re-stamps.
    */
  def appendToChunkIvfIndex(batch: DataFrame, id: Column, text: Column,
                            indexDir: String, dim: Int = 64): Long = {
    val spark = batch.sparkSession
    val (size, stride) = chunkGrid(spark, indexDir,
      stampTable = "assignment")
    // re-derive the index's gate columns for the batch's chunks; the
    // underlying append enforces the batch actually supplies them
    val meta = Similarity.indexMetaCols(spark, indexDir)
      .filter(batch.columns.contains)
    val chunked = chunkKeyed(batch, id, text, size, stride, meta)
    val vecs0 = Corpus.hashEmbed(chunked, col("ck"), col("chunk_text"), dim)
    val vecs =
      if (meta.isEmpty) vecs0
      else vecs0.join(
        chunked.select((col("ck").as("id") +: meta.map(col)): _*), Seq("id"))
    Similarity.appendToIvfIndex(vecs, indexDir)
  }

  /** Compact the chunk-grain ANN index and RE-STAMP its grid sidecar
    * at the new overwrite version — the [[compactChunkBm25Index]]
    * discipline; use this, not the raw [[Similarity.compactIvfIndex]],
    * on chunk indexes. Handles both the plain-float and the IVF-PQ
    * chunk index (the compactor compacts whichever of
    * centroids/codebook/assignment exist, in lockstep).
    */
  def compactChunkIvfIndex(spark: SparkSession, indexDir: String): Long = {
    val (size, stride) = chunkGrid(spark, indexDir, stampTable = "assignment")
    val v = Similarity.compactIvfIndex(spark, indexDir)
    writeChunkGrid(spark, indexDir, size, stride, v)
    v
  }

  /** The grid values the sidecar RECORDS, ignoring its stamp — what a
    * RETRAIN rebuild reads (the sidecarRecordedModulus discipline: the
    * stamp is stale exactly when a prior rebuild crashed, the recorded
    * grid is still the corpus's grid, and the rebuild re-stamps at its
    * own commit, which is what makes the stamp true again). None when
    * absent or corrupt.
    */
  private def chunkGridRecorded(spark: SparkSession,
                                indexDir: String): Option[(Int, Int)] = {
    val p = chunkGridPath(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      raw.trim.split(" ") match {
        case Array(s, st, v) if Seq(s, st, v).forall(_.forall(_.isDigit)) =>
          Some((s.toInt, st.toInt))
        case _ => None
      }
    }
  }

  /** [[Similarity.rebuildIvfIndex]] on a CHUNK-grain dir, re-stamping
    * the grid sidecar at the rebuilt overwrite (the grid itself is
    * immutable across a retrain — same windows, fresh centroids). The
    * grid reads stamp-UNvalidated ([[chunkGridRecorded]]): a stale
    * stamp left by a crashed prior rebuild must not wedge the retrain
    * cadence, and the rebuild sources from the last LOCKSTEP snapshot —
    * the era the recorded grid describes — then makes the stamp true
    * again at its own commit.
    */
  def rebuildChunkIvfIndex(spark: SparkSession, indexDir: String,
                           lloydIters: Int = 0): Long = {
    val (size, stride) = chunkGridRecorded(spark, indexDir).getOrElse(
      sys.error(s"$indexDir carries no parseable chunk_grid sidecar — " +
        "rebuild from the corpus with buildChunkIvfIndex"))
    val v = Similarity.rebuildIvfIndex(spark, indexDir, lloydIters)
    writeChunkGrid(spark, indexDir, size, stride, v)
    v
  }

  /** [[Similarity.rebuildIvfPqIndex]] on a CHUNK-grain dir, grid
    * re-stamped as in [[rebuildChunkIvfIndex]]. */
  def rebuildChunkIvfPqIndex(spark: SparkSession, indexDir: String,
                             pqLloydIters: Int = 0,
                             lloydIters: Int = 0): Long = {
    val (size, stride) = chunkGridRecorded(spark, indexDir).getOrElse(
      sys.error(s"$indexDir carries no parseable chunk_grid sidecar — " +
        "rebuild from the corpus with buildChunkIvfPqIndex"))
    val v = Similarity.rebuildIvfPqIndex(spark, indexDir, pqLloydIters,
      lloydIters)
    writeChunkGrid(spark, indexDir, size, stride, v)
    v
  }

  /** Build the COMPRESSED chunk-grain ANN index — [[buildChunkIvfIndex]]
    * with the assignment storing m-byte PQ codes instead of float
    * vectors ([[Similarity.buildIvfPqIndex]]). At 100 TB the chunk-grain
    * vector table is the LARGEST vector artifact in the system (every
    * document explodes into size/stride windows), which is exactly
    * where PQ's ~32× byte cut pays most: a probe moves
    * ~nProbes/nCentroids ÷ 32 of the float-index bytes, and the exact
    * re-rank ([[Similarity.queryIvfPqIndexReranked]], wired into
    * [[hybridSearchChunksPq]]) closes the reconstruction-error recall
    * gap at |Q|·kEach·alpha exact dots. Same grid-sidecar discipline as
    * the float index — stamped against the assignment's overwrite
    * snapshot, so fusion refuses mismatched grids.
    */
  def buildChunkIvfPqIndex(docs: DataFrame, id: Column, text: Column,
                           indexDir: String, size: Int, stride: Int,
                           dim: Int = 64, nCentroids: Int = 16,
                           m: Int = 8, ks: Int = 16,
                           pqLloydIters: Int = 0, lloydIters: Int = 0,
                           residual: Boolean = false,
                           nBuckets: Int = 8,
                           metaCols: Seq[String] = Nil): Long = {
    require(size > 0 && stride > 0)
    val chunked = chunkKeyed(docs, id, text, size, stride, metaCols)
    val vecs0 = Corpus.hashEmbed(chunked, col("ck"), col("chunk_text"), dim)
    val vecs =
      if (metaCols.isEmpty) vecs0
      else vecs0.join(
        chunked.select((col("ck").as("id") +: metaCols.map(col)): _*),
        Seq("id"))
    val v = Similarity.buildIvfPqIndex(vecs, indexDir, nCentroids, m, ks,
      pqLloydIters, lloydIters, dim, residual, nBuckets,
      metaCols = metaCols)
    writeChunkGrid(docs.sparkSession, indexDir, size, stride, v)
    v
  }

  /** Append a document batch's chunks to the compressed chunk ANN
    * index: grid from the sidecar, embeddings from the same
    * feature-hash encoder, then FAISS-add on the frozen centroids +
    * codebook ([[Similarity.appendToIvfPqIndex]]).
    */
  def appendToChunkIvfPqIndex(batch: DataFrame, id: Column, text: Column,
                              indexDir: String, dim: Int = 64, m: Int = 8,
                              residual: Boolean = false): Long = {
    val spark = batch.sparkSession
    val (size, stride) = chunkGrid(spark, indexDir,
      stampTable = "assignment")
    val meta = Similarity.indexMetaCols(spark, indexDir)
      .filter(batch.columns.contains)
    val chunked = chunkKeyed(batch, id, text, size, stride, meta)
    val vecs0 = Corpus.hashEmbed(chunked, col("ck"), col("chunk_text"), dim)
    val vecs =
      if (meta.isEmpty) vecs0
      else vecs0.join(
        chunked.select((col("ck").as("id") +: meta.map(col)): _*), Seq("id"))
    Similarity.appendToIvfPqIndex(vecs, indexDir, m, dim, residual)
  }

  /** HYBRID retrieval at CHUNK grain — the full RAG serving unit: the
    * chunk BM25 index and the chunk ANN index answer the same query
    * batch independently AT CK GRAIN (so a lexical hit and a semantic
    * hit of the same span fuse, not just the same document), RRF fuses
    * the two rankings, and the composite key decodes to attributed
    * spans. The two indexes must have been chunked on the SAME window
    * grid — fusing rankings over different grids would co-rank spans
    * that never align, so a grid mismatch refuses up front.
    *
    * Queries: (query_id, terms array<string>, vec array<double> — the
    * query text embedded by the same encoder as the index). Output:
    * (query_id, doc_id, chunk_start, n_rankers, rrf), top-k per query
    * by (rrf desc, doc asc, chunk asc). Feed [[assembleContext]] to
    * turn the ranking into a budgeted context window.
    */
  def hybridSearchChunks(spark: SparkSession, chunkBm25Dir: String,
                         chunkIvfDir: String, queries: DataFrame, k: Int,
                         kEach: Int = 20, nProbes: Int = 4, c: Int = 60,
                         bm25AsOf: Option[Long] = None,
                         ivfAsOf: Option[Long] = None,
                         qlArm: Boolean = false,
                         mu: Double = 2000.0): DataFrame = {
    val gridLex = chunkGrid(spark, chunkBm25Dir)
    val gridSem = chunkGrid(spark, chunkIvfDir, stampTable = "assignment")
    require(gridLex == gridSem, s"chunk index grids disagree: BM25 " +
      s"$gridLex vs ANN $gridSem — spans from different grids never " +
      "align; rebuild one index on the other's grid")
    val lex = queryBm25IndexMany(spark, chunkBm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val sem = Similarity.queryIvfIndex(spark, chunkIvfDir,
        queries.select(col("query_id").as("id"), col("vec")), kEach,
        nProbes, asOf = ivfAsOf)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("sim").as("score"))
    // the optional THIRD arm — Dirichlet QL over the SAME chunk BM25
    // index (one more pass over the already-pruned postings slice, no
    // new artifact): rrfFuse is ranker-count-agnostic and only ranks
    // enter, so the likelihood scale never needs to be commensurate
    val arms =
      if (!qlArm) Seq(lex, sem)
      else Seq(lex, sem, queryQlIndexMany(spark, chunkBm25Dir,
          queries.select(col("query_id"), col("terms")), kEach, mu,
          asOf = bm25AsOf)
        .select(col("query_id"), col("doc_id"), col("score")))
    rrfFuse(arms, k, c)
      .select(shiftright(col("doc_id"), 32).as("doc_id"),
        col("doc_id").bitwiseAND(lit(ChunkKeyBase - 1)).as("chunk_start"),
        col("query_id"), col("n_rankers"), col("rrf"))
      .select(col("query_id"), col("doc_id"), col("chunk_start"),
        col("n_rankers"), col("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"),
        col("chunk_start"))
  }

  /** [[hybridSearchChunks]] with ONE metadata gate on BOTH chunk arms —
    * [[hybridSearchFiltered]] at the RAG serving grain: spans rank only
    * if their DOCUMENT passes the gate (chunks inherited the columns at
    * build — postings metaCols on the lexical arm, assignment metaCols
    * on the semantic arm), each arm gates its full scored set before
    * its top-kEach, and the fused output keeps span-exact attribution.
    * Both indexes must share the window grid AND carry the predicate's
    * columns; either missing refuses the whole serve.
    */
  def hybridSearchChunksFiltered(spark: SparkSession, chunkBm25Dir: String,
                         chunkIvfDir: String, queries: DataFrame, k: Int,
                         predicate: Column,
                         kEach: Int = 20, nProbes: Int = 4, c: Int = 60,
                         bm25AsOf: Option[Long] = None,
                         ivfAsOf: Option[Long] = None): DataFrame = {
    val gridLex = chunkGrid(spark, chunkBm25Dir)
    val gridSem = chunkGrid(spark, chunkIvfDir, stampTable = "assignment")
    require(gridLex == gridSem, s"chunk index grids disagree: BM25 " +
      s"$gridLex vs ANN $gridSem — spans from different grids never " +
      "align; rebuild one index on the other's grid")
    val lex = queryBm25IndexManyFiltered(spark, chunkBm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, predicate,
        asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val sem = Similarity.queryIvfIndexFiltered(spark, chunkIvfDir,
        queries.select(col("query_id").as("id"), col("vec")), kEach,
        predicate, nProbes, asOf = ivfAsOf)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("sim").as("score"))
    rrfFuse(Seq(lex, sem), k, c)
      .select(col("query_id"),
        shiftright(col("doc_id"), 32).as("doc_id"),
        col("doc_id").bitwiseAND(lit(ChunkKeyBase - 1)).as("chunk_start"),
        col("n_rankers"), col("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"),
        col("chunk_start"))
  }

  /** [[hybridSearchChunks]] with the semantic arm upgraded to the
    * COMPRESSED chunk index plus exact re-rank — the 100 TB serving
    * form: the chunk-grain vector table is the largest vector artifact
    * in the system, so its probe reads m-code rows (~1/32 the float
    * bytes) and only the |Q|·kEach·alpha shortlist pays exact dots,
    * DPP-fetched from the ck-sharded full-precision vectors the index
    * persisted AT BUILD TIME ([[buildChunkIvfPqIndex]] already computes
    * every chunk vector to encode it — committing them costs one write,
    * where the previous form re-chunked and re-embedded the WHOLE
    * documents table in-plan per serving batch, a full corpus pass that
    * a real neural encoder makes impossible, with a silent-staleness
    * hazard besides). Both indexes must share the window grid; both pin
    * their own version; `alpha` is the semantic arm's recall dial.
    * Output matches [[hybridSearchChunks]]: (query_id, doc_id,
    * chunk_start, n_rankers, rrf).
    */
  def hybridSearchChunksPq(spark: SparkSession, chunkBm25Dir: String,
                           chunkPqDir: String, queries: DataFrame,
                           k: Int, kEach: Int = 20,
                           alpha: Int = 4, nProbes: Int = 4, c: Int = 60,
                           m: Int = 8, ks: Int = 16, dim: Int = 64,
                           residual: Boolean = false,
                           bm25AsOf: Option[Long] = None,
                           pqAsOf: Option[Long] = None): DataFrame = {
    val gridLex = chunkGrid(spark, chunkBm25Dir)
    val gridSem = chunkGrid(spark, chunkPqDir, stampTable = "assignment")
    require(gridLex == gridSem, s"chunk index grids disagree: BM25 " +
      s"$gridLex vs PQ $gridSem — spans from different grids never " +
      "align; rebuild one index on the other's grid")
    val lex = queryBm25IndexMany(spark, chunkBm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val sem = Similarity.queryIvfPqIndexReranked(spark, chunkPqDir,
        queries.select(col("query_id").as("id"), col("vec")),
        kEach, alpha, nProbes, pqAsOf, m, ks, dim, residual)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("dot").as("score"))
    rrfFuse(Seq(lex, sem), k, c)
      .select(col("query_id"),
        shiftright(col("doc_id"), 32).as("doc_id"),
        col("doc_id").bitwiseAND(lit(ChunkKeyBase - 1)).as("chunk_start"),
        col("n_rankers"), col("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"),
        col("chunk_start"))
  }

  /** LATE-INTERACTION (multi-vector) re-rank — ColBERT's maxsim
    * (Khattab & Zaharia, SIGIR 2020) bounded to the serving shape a
    * 100 TB pipeline can afford: single-vector ANN recalls a shortlist
    * cheaply, then ONLY the |Q|·kEach shortlist pays token-level
    * interaction — maxsim(q, c) = Σ_{query token} max_{chunk token}
    * cos(tokvec_q, tokvec_c) — never the corpus. Token vectors are
    * deterministic character-trigram hash embeddings
    * ([[Corpus.charTrigramEmbed]] — the SQL-replayable stand-in for
    * per-token neural vectors), derived on demand for the shortlist's
    * chunks alone: the shortlist's doc ids broadcast-semi-join the
    * corpus (DPP-prunable, bounded), those docs re-window on the
    * index's OWN grid, and everything downstream is
    * shortlist × query-token sized equality joins. Per-(query, chunk,
    * query-token) maxes are order-independent; the final sum runs in
    * DECIMAL(27,10) so the score replays exactly cross-engine.
    *
    * Output: (query_id, doc_id, chunk_start, maxsim) — top `k` per
    * query, span-exact attribution like every chunk server here.
    */
  def maxSimRerankChunks(spark: SparkSession, chunkPqDir: String,
                         docs: DataFrame, id: Column, text: Column,
                         queries: DataFrame, k: Int, kEach: Int = 20,
                         alpha: Int = 4, nProbes: Int = 4,
                         asOf: Option[Long] = None, m: Int = 8,
                         ks: Int = 16, dim: Int = 64,
                         residual: Boolean = false): DataFrame =
    Ranking.topPerGroup(
        maxSimScores(spark, chunkPqDir, docs, id, text, queries, kEach,
          alpha, nProbes, asOf, m, ks, dim, residual),
        Seq(col("query_id")), Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("query_id"),
        shiftright(col("doc_id"), 32).as("doc_id"),
        col("doc_id").bitwiseAND(lit(ChunkKeyBase - 1)).as("chunk_start"),
        col("score").as("maxsim"))
      .orderBy(col("query_id"), col("maxsim").desc, col("doc_id"),
        col("chunk_start"))

  /** The maxsim arm at ck grain — (query_id, doc_id = ck, score), the
    * [[rrfFuse]] input shape shared with the other arms. */
  private def maxSimScores(spark: SparkSession, chunkPqDir: String,
                           docs: DataFrame, id: Column, text: Column,
                           queries: DataFrame, kEach: Int, alpha: Int,
                           nProbes: Int, asOf: Option[Long], m: Int,
                           ks: Int, dim: Int,
                           residual: Boolean): DataFrame =
    maxSimScoresFrom(spark, chunkPqDir, docs, id, text, queries,
      Similarity.queryIvfPqIndexReranked(spark, chunkPqDir,
          queries.select(col("query_id").as("id"), col("vec")),
          kEach, alpha, nProbes, asOf, m, ks, dim, residual)
        .select(col("query_id"), col("cand_id").as("ck"))
        .localCheckpoint(eager = false)) // feeds doc fetch + the pair join

  /** [[maxSimScores]] over a CALLER-STAGED shortlist (query_id, ck) —
    * the seam that lets [[hybridSearchChunksMaxSim]] run the PQ
    * probe+rerank ONCE and feed both the exact-dot arm and the maxsim
    * arm from the same staged rows, instead of evaluating the identical
    * probe subtree twice per serve call. The shortlist must be staged
    * (checkpointed) by the caller: it feeds the doc fetch, the chunk
    * semi-join and the pair join below.
    */
  private def maxSimScoresFrom(spark: SparkSession, chunkPqDir: String,
                           docs: DataFrame, id: Column, text: Column,
                           queries: DataFrame,
                           short: DataFrame): DataFrame = {
    val (size, stride) = chunkGrid(spark, chunkPqDir,
      stampTable = "assignment")
    // ONLY the shortlist's documents re-window — never the corpus
    val docIds = short.select(shiftright(col("ck"), 32).as("__d")).distinct()
    val shortDocs = docs.join(broadcast(docIds), id === col("__d"),
      "left_semi")
    val ctoks = chunkKeyed(shortDocs, id, text, size, stride)
      .join(broadcast(short.select(col("ck")).distinct()), Seq("ck"),
        "left_semi")
      .select(col("ck"),
        explode(graft.functions.TextOps.tokens(col("chunk_text")))
          .as("tok"))
      .distinct() // maxes over duplicate tokens are identical
    val qtoks = queries
      .select(col("query_id"), explode(col("terms")).as("tok")).distinct()
    val vocab = ctoks.select(col("tok"))
      .unionByName(qtoks.select(col("tok"))).distinct()
    // the vocabulary is shortlist-token-bounded — broadcast it onto
    // both token streams (statless plans otherwise SMJ these tiny sides)
    val tv = Corpus.charTrigramEmbed(vocab, col("tok"), dim = 64)
      .localCheckpoint(eager = false) // joined on both sides of the pair
    val qv = qtoks.join(broadcast(tv), Seq("tok"))
      .select(col("query_id"), col("tok").as("qtok"),
        col("vec").as("qtv"), col("nsq").as("qnsq"))
    val cv = ctoks.join(broadcast(tv), Seq("tok"))
      .select(col("ck"), col("vec").as("ctv"), col("nsq").as("cnsq"))
    // the shortlist itself is |Q|·kEach rows — broadcast it onto the
    // (larger) chunk-token stream
    cv.join(broadcast(short), Seq("ck"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", graft.functions.VectorOps.cosineWithNorms(
        col("qtv"), col("ctv"), col("qnsq"), col("cnsq")))
      .groupBy(col("query_id"), col("ck"), col("qtok"))
      .agg(max(col("cos")).as("mxc"))
      .groupBy(col("query_id"), col("ck"))
      .agg(sum(col("mxc").cast("decimal(27,10)")).cast("double")
        .as("score"))
      .select(col("query_id"), col("ck").as("doc_id"), col("score"))
  }

  /** [[hybridSearchChunksPq]] grown to the FOUR-arm serving unit: BM25
    * + Dirichlet QL (both off the pruned postings slice) + the
    * PQ-shortlisted exact-dot single-vector arm + the late-interaction
    * maxsim re-rank of that same shortlist ([[maxSimRerankChunks]]).
    * RRF stays rank-only, so the four incommensurate scales (log-odds,
    * log-likelihood, dot, summed cosine) never need calibration;
    * n_rankers reaches 4 where every arm finds the span. The maxsim
    * arm re-uses the PQ arm's shortlist — the fourth ranking costs
    * token-level work on |Q|·kEach chunks, nothing corpus-sized.
    */
  def hybridSearchChunksMaxSim(spark: SparkSession, chunkBm25Dir: String,
                               chunkPqDir: String, docs: DataFrame,
                               id: Column, text: Column,
                               queries: DataFrame, k: Int,
                               kEach: Int = 20, alpha: Int = 4,
                               nProbes: Int = 4, c: Int = 60,
                               mu: Double = 2000.0, m: Int = 8,
                               ks: Int = 16, dim: Int = 64,
                               residual: Boolean = false,
                               bm25AsOf: Option[Long] = None,
                               pqAsOf: Option[Long] = None): DataFrame = {
    val gridLex = chunkGrid(spark, chunkBm25Dir)
    val gridSem = chunkGrid(spark, chunkPqDir, stampTable = "assignment")
    require(gridLex == gridSem, s"chunk index grids disagree: BM25 " +
      s"$gridLex vs PQ $gridSem — spans from different grids never " +
      "align; rebuild one index on the other's grid")
    val lex = queryBm25IndexMany(spark, chunkBm25Dir,
        queries.select(col("query_id"), col("terms")), kEach,
        asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    val ql = queryQlIndexMany(spark, chunkBm25Dir,
        queries.select(col("query_id"), col("terms")), kEach, mu,
        asOf = bm25AsOf)
      .select(col("query_id"), col("doc_id"), col("score"))
    // ONE PQ probe+rerank serves both semantic arms: the exact-dot arm
    // reads (ck, dot), the maxsim arm re-ranks the same shortlist —
    // staged once, never evaluated twice (r17: the duplicated probe
    // subtree was the single largest cost in this composition).
    val semRaw = Similarity.queryIvfPqIndexReranked(spark, chunkPqDir,
        queries.select(col("query_id").as("id"), col("vec")),
        kEach, alpha, nProbes, pqAsOf, m, ks, dim, residual)
      .localCheckpoint(eager = false)
    val sem = semRaw
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("dot").as("score"))
    val msim = maxSimScoresFrom(spark, chunkPqDir, docs, id, text, queries,
      semRaw.select(col("query_id"), col("cand_id").as("ck")))
    rrfFuse(Seq(lex, ql, sem, msim), k, c)
      .select(col("query_id"),
        shiftright(col("doc_id"), 32).as("doc_id"),
        col("doc_id").bitwiseAND(lit(ChunkKeyBase - 1)).as("chunk_start"),
        col("n_rankers"), col("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"),
        col("chunk_start"))
  }

  /** RAG context assembly over a fused chunk ranking — the step between
    * retrieval and the prompt: per query,
    *
    *  1. CAP chunks per document at `maxPerDoc` (diversity — one
    *     rambling document cannot monopolize the context),
    *  2. MERGE overlapping/adjacent co-ranked spans into maximal spans
    *     (stride < size makes neighbors co-rank; the consumer wants
    *     each passage once, not k shifted copies),
    *  3. CLIP span ends to the document's real token length (the last
    *     window is shorter than `size`),
    *  4. PACK the ranking prefix into `budget` tokens in (score desc,
    *     doc, start) order — the TOP context that fits, not a
    *     bin-packing of leftovers: the first span that would overflow
    *     the budget cuts the context off.
    *
    * Everything is windows + one broadcast length join: the fused
    * ranking is O(|Q|·k) rows, so assembly cost is independent of
    * corpus size; the length join broadcasts the SPANS onto the corpus
    * scan, never the reverse.
    *
    * Input: (query_id, doc_id, chunk_start, rrf) + the corpus for
    * lengths; `size` must be the retrieval grid's window size. Output:
    * (query_id, doc_id, span_start, span_end, n_chunks, score,
    * cum_tok), ordered (query_id, score desc, doc, start).
    */
  def assembleContext(fused: DataFrame, docs: DataFrame, id: Column,
                      text: Column, size: Int, budget: Int,
                      maxPerDoc: Int = 4): DataFrame =
    assembleWith(fused,
      docs.select(id.as("doc_id"),
        org.apache.spark.sql.functions.size(TextOps.tokens(text))
          .cast("long").as("__n_tok")),
      size, budget, maxPerDoc)

  /** [[assembleContext]] clipping from the doc-keyed FORWARD index
    * instead of tokenizing the corpus — the serve-path form: the
    * corpus-scan variant recomputes every document's token length per
    * serving batch just to clip O(|Q|·k) spans, which at 100 TB makes
    * every RAG query batch pay a full-corpus read+tokenize. Here the
    * fused ranking's doc set broadcast-joins ONTO the forward scan, so
    * (a) parquet column pruning reads only the (doc_id, dl) bytes —
    * never the token arrays — and (b) on a trusted doc_parts sidecar
    * the join carries the shard key and Spark DPP prunes unprobed
    * doc-shard DIRECTORIES: the clip reads ~|docs(fused)|/nPartDirs of
    * the length bytes, independent of corpus size. Output is
    * row-identical to [[assembleContext]] over the corpus the index
    * was built from.
    */
  def assembleContextIndexed(spark: SparkSession, fused: DataFrame,
                             forwardDir: String, size: Int, budget: Int,
                             maxPerDoc: Int = 4,
                             asOf: Option[Long] = None): DataFrame = {
    // the fused ranking feeds both the doc-set probe and the span
    // windows — stage it so the second consumer does not replay the
    // whole hybrid search lineage (constraint-free: see
    // [[constraintFreeStage]])
    val f = constraintFreeStage(fused)
    assembleWith(f,
      forwardFor(spark, forwardDir, f, Seq("dl"), asOf)
        .select(col("doc_id"), col("dl").as("__n_tok")),
      size, budget, maxPerDoc)
  }

  private def assembleWith(fused: DataFrame, lengths: DataFrame, size: Int,
                           budget: Int, maxPerDoc: Int): DataFrame = {
    require(budget > 0)
    val W = org.apache.spark.sql.expressions.Window
    val wPack = W.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc, col("span_start").asc)
      .rowsBetween(W.unboundedPreceding, 0)
    clippedSpans(fused, lengths, size, maxPerDoc)
      .withColumn("cum_tok",
        sum(col("span_end") - col("span_start") + 1).over(wPack))
      .filter(col("cum_tok") <= budget)
      .select(col("query_id"), col("doc_id"), col("span_start"),
        col("span_end"), col("n_chunks"), col("score"), col("cum_tok"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"),
        col("span_start"))
  }

  /** Steps 1–3 of context assembly (cap → merge → clip), shared by the
    * whitespace-budget and model-token-budget packers. Output:
    * (query_id, doc_id, span_start, span_end, n_chunks, score).
    */
  private def clippedSpans(fused: DataFrame, lengths: DataFrame, size: Int,
                           maxPerDoc: Int): DataFrame = {
    require(size > 0 && maxPerDoc > 0)
    val W = org.apache.spark.sql.expressions.Window
    val capped = fused
      .withColumn("__r", row_number().over(
        W.partitionBy(col("query_id"), col("doc_id"))
          .orderBy(col("rrf").desc, col("chunk_start").asc)))
      .filter(col("__r") <= maxPerDoc)
    // interval merge: a chunk opens a new span iff it starts past every
    // prior chunk's end + 1 (adjacent spans concatenate seamlessly —
    // merge them too); group id = running count of span-opens
    val wOrd = W.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("chunk_start").asc)
    val spans = capped
      .withColumn("__end", col("chunk_start") + lit(size.toLong - 1))
      .withColumn("__pmax", max(col("__end")).over(
        wOrd.rowsBetween(W.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("chunk_start") > col("__pmax") + 1,
          lit(1)).otherwise(lit(0)))
      .withColumn("__grp", sum(col("__new")).over(
        wOrd.rowsBetween(W.unboundedPreceding, 0)))
      .groupBy(col("query_id"), col("doc_id"), col("__grp"))
      .agg(min(col("chunk_start")).as("span_start"),
        max(col("__end")).as("__span_end0"),
        count(lit(1)).as("n_chunks"),
        max(col("rrf")).as("score"))
    // a span starting past its document's end means the fused ranking
    // and the corpus DISAGREE (stale index, wrong corpus): refuse
    // loudly — clipping it would yield a negative-length span whose
    // negative token count silently corrupts the budget accounting
    lengths.join(broadcast(spans), Seq("doc_id"))
      .filter(assert_true(col("span_start") <= col("__n_tok"),
        lit("context span starts past its document's end — the fused " +
          "ranking and the corpus disagree (stale chunk index or wrong " +
          "corpus); rebuild the index against this corpus")).isNull)
      .select(col("query_id"), col("doc_id"), col("span_start"),
        least(col("__span_end0"), col("__n_tok")).as("span_end"),
        col("n_chunks"), col("score"))
  }

  /** [[assembleContextIndexed]] with the budget counted in MODEL tokens
    * — the unit the context's consumer is actually provisioned in: a
    * prompt mounts into a model whose window is a BPE-id budget, and
    * whitespace counts mis-provision it (the q165 lesson — whitespace
    * and BPE ids diverge per document, so a whitespace-packed context
    * can overflow the model or waste window). Steps 1–3 (cap → merge →
    * clip) are identical; step 4 fetches each clipped span's text from
    * the forward index (DPP-pruned — O(|Q|·k) spans), counts it in
    * MODEL tokens under the persisted tokenizer (`modelAsOf` pins a
    * historical version, so a packed context reproduces bit-for-bit
    * across a retrain), and packs the ranking prefix into `budget` ids.
    * Caveat stated honestly: a char-level model drops words absent from
    * its type table (undercounting them); the byte-level model is the
    * no-OOV form this budget is exact under. Output: (query_id, doc_id,
    * span_start, span_end, n_chunks, score, n_model_tok, cum_tok) with
    * cum_tok in model tokens.
    */
  def assembleContextModelTokens(spark: SparkSession, fused: DataFrame,
                                 forwardDir: String, modelDir: String,
                                 size: Int, budget: Int, maxPerDoc: Int = 4,
                                 byteLevel: Boolean = false,
                                 modelAsOf: Option[Long] = None,
                                 asOf: Option[Long] = None): DataFrame = {
    require(budget > 0)
    val W = org.apache.spark.sql.expressions.Window
    val f = constraintFreeStage(fused)
    val lengths = forwardFor(spark, forwardDir, f, Seq("dl"), asOf)
      .select(col("doc_id"), col("dl").as("__n_tok"))
    // the clipped span set feeds the text fetch AND the final output —
    // stage it so the windows' lineage is not replayed per consumer
    // (constraint-free: its SECOND forward probe needs its own guard)
    val spans = constraintFreeStage(clippedSpans(f, lengths, size, maxPerDoc))
    // each span's text off the forward index (slice is map-side), then
    // its MODEL-token count: spans are documents at span grain to the
    // tokenizer — the span key rides through the count as a struct id
    val texts = contextWith(spans
        .select(col("query_id"), col("doc_id"), col("span_start"),
          col("span_end"), col("score")),
      forwardFor(spark, forwardDir, spans, Seq("toks"), asOf)
        .select(col("doc_id"), col("toks").as("__toks")))
    val counted = graft.operators.Bpe.tokenCountsWithModel(spark, modelDir,
        texts.withColumn("__sk", struct(col("query_id"), col("doc_id"),
          col("span_start"))),
        col("__sk"), col("span_text"), byteLevel, modelAsOf)
      .select(col("doc_id")("query_id").as("query_id"),
        col("doc_id")("doc_id").as("doc_id"),
        col("doc_id")("span_start").as("span_start"),
        col("n_tok").as("n_model_tok"))
    val wPack = W.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc, col("span_start").asc)
      .rowsBetween(W.unboundedPreceding, 0)
    spans.join(broadcast(counted), Seq("query_id", "doc_id", "span_start"))
      .withColumn("cum_tok", sum(col("n_model_tok")).over(wPack))
      .filter(col("cum_tok") <= budget)
      .select(col("query_id"), col("doc_id"), col("span_start"),
        col("span_end"), col("n_chunks"), col("score"),
        col("n_model_tok"), col("cum_tok"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"),
        col("span_start"))
  }

  /** Materialize packed spans as the STRINGS a prompt mounts — the last
    * step of the RAG pipeline ([[assembleContext]] emits coordinates;
    * this fetches the text): one equality join with the spans broadcast
    * ONTO the corpus scan (never the reverse — the span set is
    * O(|Q|·k) rows), then a map-side token slice per span (the
    * `Corpus.packedSequenceTexts` discipline at span grain). Output:
    * (query_id, doc_id, span_start, span_end, score, span_text),
    * ordered (query_id, score desc, doc, start) — concatenating
    * span_text per query in row order IS the context window.
    */
  def contextTexts(packed: DataFrame, docs: DataFrame, id: Column,
                   text: Column): DataFrame =
    contextWith(packed,
      docs.select(id.as("doc_id"), TextOps.tokens(text).as("__toks")))

  /** [[contextTexts]] sliced from the doc-keyed FORWARD index instead
    * of re-tokenizing the corpus — the serve-path form: the packed
    * spans' doc set broadcast-joins ONTO the forward scan, DPP-pruning
    * to the spans' doc-shard directories (trusted sidecar), so a
    * serving batch reads the token bytes of the documents it mounts,
    * not the corpus. Row-identical to [[contextTexts]] over the corpus
    * the index was built from.
    */
  def contextTextsIndexed(spark: SparkSession, packed: DataFrame,
                          forwardDir: String,
                          asOf: Option[Long] = None): DataFrame = {
    val p = constraintFreeStage(packed)
    contextWith(p, forwardFor(spark, forwardDir, p, Seq("toks"), asOf)
      .select(col("doc_id"), col("toks").as("__toks")))
  }

  private def contextWith(packed: DataFrame, toks: DataFrame): DataFrame =
    toks.join(broadcast(packed), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("span_start"),
        col("span_end"), col("score"),
        array_join(slice(col("__toks"), col("span_start").cast("int"),
          (col("span_end") - col("span_start") + 1).cast("int")), " ")
          .as("span_text"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"),
        col("span_start"))

  // ------------------------------------------- doc-keyed forward index

  /** Build the doc-keyed FORWARD index — the inverse layout of the
    * inverted index, and the serve-path complement the RAG stack reads
    * BY DOCUMENT: one row per document (doc_id, dl, toks), landed in
    * doc-shard DIRECTORIES (doc_part = doc_id mod nPartDirs) so a
    * bounded doc set — packed context spans, RM3 feedback docs —
    * broadcast-joins onto the scan and Spark DPP prunes every unprobed
    * shard's bytes. A token-ordered (inverted) layout scatters one
    * document's data across every bucket, so doc-keyed reads there are
    * corpus-sized no matter how small the doc set; this layout is the
    * q162 lesson applied to the serving side. The shard modulus
    * persists in a version-stamped `doc_parts` sidecar (the tok_parts
    * discipline); parquet column pruning means a length-only consumer
    * ([[assembleContextIndexed]]) never reads the token arrays.
    */
  def buildForwardIndex(docs: DataFrame, id: Column, text: Column,
                        indexDir: String, nPartDirs: Int = 0): Long = {
    require(nPartDirs >= 0, s"need nPartDirs >= 0 (0 = auto), got $nPartDirs")
    val n = if (nPartDirs > 0) nPartDirs else autoDocShards(docs.count())
    val rows = docs.select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("toks")).cast("long").as("dl"),
        col("toks"),
        pmod(col("doc_id"), lit(n.toLong)).as("doc_part"))
    val v = Versioned.overwritePartitioned(rows, s"$indexDir/fwd", "doc_part")
    writeShardSidecar(docs.sparkSession, indexDir, "doc_parts", n, v)
    v
  }

  /** Auto-sized doc_part modulus: ~64 documents of token arrays per
    * shard directory (a few hundred KB — shard bytes, not shard count,
    * is what a probe pays), capped at 4096 directories so a huge corpus
    * does not explode file listings (past the cap, shards fatten with
    * the corpus and the probe still reads ≤ |docSet|/4096 of it). A
    * FIXED modulus makes probed bytes grow linearly with the corpus (a
    * probed shard is read whole, and shards fatten as the corpus grows
    * — the r12 rag_serve residual slope); sizing it from the corpus
    * count at build, and re-deriving at [[compactForwardIndex]], keeps
    * shard bytes — and therefore a fixed serving batch's read — flat.
    */
  private def autoDocShards(count: Long): Int =
    math.max(4L, math.min(4096L, (count + 63L) / 64L)).toInt

  /** Append a batch of NEW documents to the forward index (the daily
    * cadence; doc_ids must be previously unseen — the append-only
    * invariant every index here shares). The shard modulus comes from
    * the index's own sidecar, never the caller; appends keep the
    * partitioned layout and the stamp stays valid (appends never move
    * the overwrite snapshot it tracks).
    */
  def appendToForwardIndex(batch: DataFrame, id: Column, text: Column,
                           indexDir: String): Long = {
    val spark = batch.sparkSession
    val n = docPartsOf(spark, indexDir).getOrElse(sys.error(
      s"$indexDir forward index's doc_parts sidecar is absent or stale " +
        "(a rebuild crashed between its commit and the stamp) — rebuild " +
        "with buildForwardIndex"))
    val rows = batch.select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("toks")).cast("long").as("dl"),
        col("toks"),
        pmod(col("doc_id"), lit(n.toLong)).as("doc_part"))
    Versioned.appendPartitioned(rows, s"$indexDir/fwd", "doc_part")
  }

  /** Compact the forward index's per-append files and RE-STAMP the
    * doc_parts sidecar. On a trusted sidecar the compaction RE-DERIVES
    * the shard modulus from the grown corpus (a compaction rewrites the
    * snapshot anyway, so the re-shard is free — [[autoDocShards]] keeps
    * probed shard bytes flat as appends accumulate). An untrusted
    * sidecar falls back to a plain layout-preserving compact with the
    * stamp left stale ([[repairForwardIndex]] recovers it). The modulus
    * is read-validated BEFORE any rewrite moves the stamp.
    */
  def compactForwardIndex(spark: SparkSession, indexDir: String): Long =
    docPartsOf(spark, indexDir) match {
      case Some(_) =>
        // tombstoned documents drop from the rewrite (single table — no
        // stats to correct, no lockstep partner; see [[Tombstones]])
        val cur = Tombstones.gate(spark, indexDir,
          Versioned.read(spark, s"$indexDir/fwd").drop("doc_part"),
          col("doc_id"))
        val n = autoDocShards(cur.count())
        val v = Versioned.overwritePartitioned(
          cur.withColumn("doc_part", pmod(col("doc_id"), lit(n.toLong))),
          s"$indexDir/fwd", "doc_part")
        writeShardSidecar(spark, indexDir, "doc_parts", n, v)
        v
      case None =>
        // untrusted sidecar: layout-preserving compact, with the
        // tombstone drop folded in only when there is one to apply
        if (Tombstones.of(spark, indexDir).isEmpty)
          Versioned.compact(spark, s"$indexDir/fwd")
        else Versioned.overwriteLike(
          Tombstones.gate(spark, indexDir,
            Versioned.read(spark, s"$indexDir/fwd"), col("doc_id")),
          s"$indexDir/fwd")
    }

  private def docPartsOf(spark: SparkSession, indexDir: String): Option[Int] =
    shardSidecarOf(spark, indexDir, "doc_parts", "fwd")

  /** Re-stamp the doc_parts sidecar after a crash left it stale — the
    * [[restampTokParts]] twin for the FORWARD index: a compaction that
    * died between its overwrite commit and the sidecar re-stamp leaves
    * every [[appendToForwardIndex]] refusing with a rebuild message
    * even though the modulus is fully recoverable (and a
    * maintenance-grain operator that OBEYED that message would rebuild
    * from one day's batch, silently dropping prior days). The stamp is
    * restored only after the candidate modulus is VERIFIED against the
    * data (every row must satisfy doc_part = pmod(doc_id, n) — a
    * crashed rebuild with a DIFFERENT modulus leaves rows that fail
    * this, and blessing the old stamp there would prune probes to the
    * wrong shards). Candidates: the stale sidecar's recorded modulus,
    * then max(doc_part)+1 off the data. No candidate verifying ⇒ the
    * sidecar stays stale: queries degrade to unpruned (correct),
    * appends keep refusing. No-op when already trusted.
    */
  def repairForwardIndex(spark: SparkSession, indexDir: String): Unit =
    restampModSidecar(spark, indexDir, "doc_parts", "fwd",
      "doc_id", "doc_part", n => Some(autoDocShards(n)))

  /** The generic pmod-shard restamp behind [[repairForwardIndex]] and
    * the ANN vectors table's vec_parts repair: verify a candidate
    * modulus against every row's recorded shard, then re-stamp the
    * sidecar at the table's current overwrite snapshot. Shared by every
    * partitioned layout whose shard key is `pmod(id, n)` (tok_parts
    * hashes the token first and keeps its own verifier). Candidates, in
    * order: the stale sidecar's recorded modulus (an append/compact
    * crash that kept the modulus), max(partCol)+1 off the data (the
    * sidecar-missing shape — exact when the top shard is non-empty),
    * and `autoModulus(row count)` — the modulus an AUTO-SIZED crashed
    * compaction actually used, which the first two miss when the
    * compact re-derived a NEW modulus whose top shard happens to be
    * empty (no id ≡ n−1 mod n): without it the sidecar stayed stale and
    * appends wedged behind a rebuild message that repair cannot honor.
    */
  private[operators] def restampModSidecar(spark: SparkSession,
      indexDir: String, name: String, table: String,
      idCol: String, partCol: String,
      autoModulus: Long => Option[Int] = _ => None): Unit = {
    val t = s"$indexDir/$table"
    if (!Versioned.exists(spark, t)) return
    if (!Versioned.declaredLayout(spark, t).startsWith("part:")) return
    if (shardSidecarOf(spark, indexDir, name, table).nonEmpty) return
    val stampV = lastOverwriteOf(spark, indexDir, table)
    val rows = Versioned.read(spark, t).select(col(idCol), col(partCol))
    val recorded = sidecarRecordedModulus(spark, indexDir, name)
    val maxRow = rows.agg(max(col(partCol)), count(lit(1))).head
    val fromData: Seq[Int] =
      if (maxRow.isNullAt(0)) Seq.empty else Seq(maxRow.getLong(0).toInt + 1)
    val fromAuto: Seq[Int] =
      if (maxRow.isNullAt(0)) Seq.empty
      else autoModulus(maxRow.getLong(1)).toSeq
    (recorded.toSeq ++ fromData ++ fromAuto).distinct
      .find(n => rows
        .filter(col(partCol) =!= pmod(col(idCol), lit(n.toLong))).isEmpty)
      .foreach(n => writeShardSidecar(spark, indexDir, name, n, stampV))
  }

  /** Forward rows for a bounded doc set: the set's distinct doc ids
    * broadcast ONTO the partitioned forward scan. On a trusted sidecar
    * the join carries doc_part, so Spark DPP prunes unprobed doc-shard
    * directories at run time — for the latest read AND for any asOf
    * pinned inside the live layout epoch ([[shardSidecarFor]] — what
    * keeps a pinned serving stream pruned); an untrusted sidecar or a
    * pre-epoch pin degrades to the unpruned-but-correct doc_id join.
    * `need` names the forward columns to read — parquet prunes the
    * rest, so a length-only consumer never pays the token-array bytes.
    */
  /** Stage a SMALL serve-side set (fused rankings, packed spans,
    * feedback docs — all O(|Q|·k) rows) behind a CONSTRAINT-FREE RDD
    * seam. A plain `localCheckpoint` preserves the origin plan's
    * constraints through the seam (SPARK-39748), and when the staged
    * set already flowed through a forward-index join its constraints
    * contain this module's own shard-range guard — so the NEXT
    * consumer's guard gets pruned as redundant, `hasSelectivePredicate`
    * fails on the probe side, and PartitionPruning silently declines:
    * the second hop of a composed serve pipeline (assemble → fetch
    * text) read the forward index UNPRUNED (and the optimizer then
    * injected a corpus-sized reverse bloom). Rebuilding the DataFrame
    * from the checkpointed row RDD drops origin metadata, so the guard
    * survives at every composition depth. The row round-trip costs a
    * serialize/deserialize of O(|Q|·k) rows — serve-batch-sized, never
    * corpus-sized.
    */
  private[graft] def constraintFreeStage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd.localCheckpoint(), df.schema)

  private[graft] def forwardFor(spark: SparkSession, indexDir: String,
                         docSet: DataFrame, need: Seq[String],
                         asOf: Option[Long]): DataFrame = {
    val fwd = Versioned.read(spark, s"$indexDir/fwd", asOf)
    // the takedown gate rides the REQUEST set (already bounded and
    // broadcast-bound), so a tombstoned document's text never mounts
    // into a context window even if an ungated caller asks for it
    val ids = Tombstones.gate(spark, indexDir,
      docSet.select(col("doc_id")).distinct(), col("doc_id"))
    shardSidecarFor(spark, indexDir, "doc_parts", "fwd", asOf) match {
      case Some(n) =>
        // the shard-range guard is an invariant (pmod lands in [0, n))
        // doing double duty: it is the selective predicate Spark's
        // PartitionPruning rule requires on the probe side before it
        // will insert the DPP subquery — without it a checkpointed/
        // in-memory span set joins unpruned (correct, corpus-sized)
        val probe = ids
          .withColumn("doc_part", pmod(col("doc_id"), lit(n.toLong)))
          .filter(col("doc_part").between(0, n - 1))
        fwd.select(("doc_part" +: "doc_id" +: need).map(col): _*)
          .join(broadcast(probe), Seq("doc_part", "doc_id"))
          .drop("doc_part")
      case None =>
        fwd.select(("doc_id" +: need).map(col): _*)
          .join(broadcast(ids), Seq("doc_id"))
    }
  }
}
