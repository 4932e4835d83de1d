package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Graph, NearDup}

/** Scaling probe: time the corpus-heavy operators on 1×/3×/10×
  * replicas of the documents table (ids offset per replica so the
  * corpus grows, not the duplicate count per doc). Near-linear growth
  * here is the evidence that candidate generation really is
  * equality-join-shaped — a quadratic term shows up immediately at 10×.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.ScaleProbe [sfDir] [scales...]
  */
object ScaleProbe {

  def replicate(docs: DataFrame, times: Int): DataFrame = {
    val n = 1000000L
    (0 until times).map { i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"),
        // rewrite EVERY token with a replica tag: replicas then share no
        // shingles/fingerprints with each other, so the duplicate
        // structure grows linearly with the corpus (one token-prefix
        // perturbation is not enough — replicas would remain near-dups
        // of each other and the PROBE ITSELF would inject an O(replicas²)
        // pair count that looks like operator super-linearity)
        when(lit(i) === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "), t => concat(lit(s"r$i"), t)),
            " ")).as("text"))
    }.reduce(_ unionByName _)
  }

  /** Adversarial skew: every third doc's text becomes one shared
    * boilerplate template, so the replicated corpus carries a duplicate
    * cluster that GROWS WITH THE CORPUS (n/3 docs). Uncapped banding
    * pairs that cluster quadratically — (n/3)²/2 candidates at any
    * band key — which is exactly the input shape the frequency cap
    * exists for.
    */
  def injectSkew(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("all work and no play makes jack a dull boy every single day"))
        .otherwise(col("text")))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (scaleArgs, opFilter) = args.drop(1).toSeq.partition(_.forall(_.isDigit))
    val scales = if (scaleArgs.nonEmpty) scaleArgs.map(_.toInt) else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "dedup_normalized" -> (d => Dedup.normalizedText(d, col("text"), col("doc_id"))),
      "ngram_jaccard"    -> (d => NearDup.ngramJaccardPairs(d, col("doc_id"), col("text"))),
      "minhash_lsh"      -> (d => NearDup.minhashNearDup(d, col("doc_id"), col("text"))),
      "simhash_pairs"    -> (d => NearDup.simhashNearDup(d, col("doc_id"), col("text"))),
      "tfidf_top_term"   -> (d => Corpus.topTermPerDoc(d, col("doc_id"), col("text"))),
      "chunk_20_15"      -> (d => Corpus.chunk(d, col("doc_id"), col("text"), 20, 15)),
      "repetition_stats" -> (d => Corpus.repetitionStats(d, col("doc_id"), col("text"))),
      // iterative operator: edges = exact normalized-dup pairs (cheap to
      // generate), then min-label propagation to a fixpoint
      "components"       -> { d =>
        val groups = Dedup.normalizedText(d, col("text"), col("doc_id"))
        val edges = d
          .select(col("doc_id"), md5(lower(trim(col("text")))).as("norm_fp"))
          .join(groups.filter(col("n_dups") > 1), Seq("norm_fp"))
          .filter(col("doc_id") =!= col("keep_id"))
          .select(col("keep_id").as("src"), col("doc_id").as("dst"))
        Graph.connectedComponents(d.select(col("doc_id")), edges)
      },
      // skewed corpus (one boilerplate cluster = n/3 of all docs) with
      // the frequency cap engaged: time must stay near-linear — the cap
      // drops the cluster's heavy band keys instead of pairing them
      "minhash_skew_cap" -> (d => NearDup.minhashNearDup(injectSkew(d),
        col("doc_id"), col("text"), maxBandFreq = Some(50))),
      "simhash_skew_cap" -> (d => NearDup.simhashNearDup(injectSkew(d),
        col("doc_id"), col("text"), maxBandFreq = Some(50))),
      "jaccard_skew_cap" -> (d => NearDup.ngramJaccardPairs(injectSkew(d),
        col("doc_id"), col("text"), maxShingleFreq = Some(50))),
      // cross-corpus decontamination: 90/10 deterministic split of the
      // same corpus, pair space = shared-shingle join (never train×test)
      "decontamination"  -> { d =>
        val bucket = Corpus.hashBucket(col("doc_id"))
        NearDup.contaminationPairs(d.filter(bucket < 90),
          d.filter(bucket >= 90), col("doc_id"), col("text"), minShared = 2)
      },
      // sequence packing: the slice-machinery cumsum must scale like the
      // range sort it rides on — a single-partition window would go
      // super-linear immediately
      "pack_sequences"   -> (d => Corpus.packSequences(
        d, col("doc_id"), col("text"), budget = 512)),
      // chunk dedup: hash agg on chunk md5 + equality join back
      "chunk_dedup"      -> (d => Corpus.dedupChunks(
        d, col("doc_id"), col("text"), size = 16)),
      // mixture + packing (q127's tail): broadcast-join fan-out into the
      // range-sorted packing cumsum — the epoch expansion must cost like
      // the ~1.6× rows it adds, not like a shuffle of the corpus
      "mixture_pack"     -> { d =>
        val mixed = Corpus.mixtureSample(
          d.withColumn("source",
            concat(lit("src"), pmod(col("doc_id"), lit(8)))),
          col("source"), col("doc_id"),
          Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 1.5, "src3" -> 1.0,
              "src4" -> 1.0, "src5" -> 0.75, "src6" -> 0.5, "src7" -> 0.25))
          .withColumn("mid", col("doc_id") * 4 + col("epoch"))
        Corpus.packSequences(mixed, col("mid"), col("text"), budget = 512)
      },
      // round-8 span-dup family: hashed instance shingles corpus-wide —
      // the wide join carries 8-byte keys; growth must track the
      // instance count, not pair anything quadratically
      "dup_ngrams"       -> (d => Corpus.dupNgramStats(d, col("doc_id"), col("text"))),
      "dup_spans"        -> (d => Corpus.dupSpanStats(d, col("doc_id"), col("text"))),
      "strip_dup_spans"  -> (d => Corpus.stripDupSpans(d, col("doc_id"),
        col("text"), minSpanTokens = 12)),
      // round-8 hashed-key LM: model tables stay vocabulary-bounded as
      // the corpus grows (replica-tagged tokens grow V linearly here —
      // the worst case for the model side)
      "lm_score"         -> (d => Corpus.lmScore(d, col("doc_id"), col("text"))),
      // round-8 perceptual near-dup (stub hash tier): banded equality
      // join over 8×8-bit keys — narrow keys mean collision-driven
      // candidates; the Hamming filter must keep growth near-linear
      "image_neardup"    -> (d => graft.operators.Multimodal.imageNearDupStub(
        d.select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload")),
      // capped variant — the 100 TB path: 8-bit band keys saturate on
      // near-uniform hashes (O(n²/256) candidates uncapped); the
      // frequency cap keeps growth linear by dropping only heavy keys
      "image_neardup_cap" -> (d => graft.operators.Multimodal.imageNearDupStub(
        d.select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload", maxBandFreq = Some(50))),

      // BM25 inline: the corpus pass grows with the corpus while the
      // query-term hits stay 1× (replicas prefix every token) — growth
      // here measures the scan+explode, the part a persisted index
      // removes (see the bm25_index_query block below)
      "bm25_topk"        -> (d => graft.operators.Retrieval.bm25TopK(
        d, col("doc_id"), col("text"), Seq("dup", "spark", "hash"), 20)),
      // BPE training: ONE corpus pass builds the type table; the merge
      // loop then touches vocabulary-sized data only, so growth tracks
      // the token stream, never k × corpus
      "bpe_train_6"      -> (d => graft.operators.Bpe.train(d, col("text"), 6)))

    val selected = if (opFilter.isEmpty) ops
                   else ops.filter(o => opFilter.exists(o._1.contains))
    println(f"${"operator"}%-18s " + scales.map(s => f"${s}%8dx").mkString(" "))
    selected.foreach { case (name, op) =>
      val times = scales.map { s =>
        val docs = replicate(Tables.documents(spark, sfDir), s)
        Bench.force(op(docs))               // warm (codegen, listing)
        val t0 = System.nanoTime()
        Bench.force(op(docs))
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"$name%-18s " + times.map(t => f"$t%8.2f").mkString(" ") +
        f"   (10x/1x ratio: ${times.last / times.head}%.1f)")
    }

    // Candidate-count audit on the adversarial power-law corpus: the
    // WITHOUT-cap column is the quadratic evidence (the boilerplate
    // cluster is n/3 of all docs, so its band keys contribute ~(n/3)²/2
    // candidates — 10× data ≈ 100× candidates), computed analytically
    // (Σ f·(f−1)/2 over band-key frequencies, no pairs materialized —
    // actually RUNNING the uncapped join at 10× would be the explosion
    // itself); the WITH-cap column is the bounded volume the capped
    // join really processes, and must grow ~linearly.
    if (opFilter.isEmpty || opFilter.exists("candidate_audit".contains)) {
      println()
      println(f"${"candidate audit"}%-18s " +
        scales.map(s => f"${s}%16dx").mkString(" "))
      val rows = scales.map { sc =>
        val d = injectSkew(replicate(Tables.documents(spark, sfDir), sc))
        def one(cap: Option[Int]) = NearDup.minhashCandidateAudit(
          d, col("doc_id"), col("text"), maxBandFreq = cap)
          .collect()(0).getLong(1)
        (one(None), one(Some(50)))
      }
      println(f"${"minhash_nocap"}%-18s " +
        rows.map(r => f"${r._1}%16d").mkString(" ") +
        f"   (10x/1x: ${rows.last._1.toDouble / rows.head._1}%.1f)")
      println(f"${"minhash_cap50"}%-18s " +
        rows.map(r => f"${r._2}%16d").mkString(" ") +
        f"   (10x/1x: ${rows.last._2.toDouble / rows.head._2}%.1f)")
    }

    // Incremental curation: the probe question is different — not "how
    // does the operator scale with its input" but "how does a
    // FIXED-SIZE daily batch cost grow as the ACCUMULATED STATE grows".
    // The daily batch stays 1× while state is 1×/3×/10×; near-flat
    // growth is the evidence that a batch pays O(batch) text work and
    // joins stored 8-byte shingle keys, never re-shingling history.
    if (opFilter.isEmpty || opFilter.exists("incremental_batch".contains)) {
      val docs = Tables.documents(spark, sfDir)
      val batch = docs.select((col("doc_id") + lit(900000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "), t => concat(lit("zz"), t)),
          " ").as("text"))
        .withColumn("n_chars", length(col("text")))
      val times = scales.map { s =>
        val state = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_curation_$s").toString
        graft.operators.Curation.curateBatch(
          replicate(docs, s).withColumn("n_chars", length(col("text"))), state): Unit
        val t0 = System.nanoTime()
        graft.operators.Curation.curateBatch(batch, state): Unit
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"${"incremental_batch"}%-18s " + times.map(t => f"$t%8.2f").mkString(" ") +
        f"   (10x/1x ratio: ${times.last / times.head}%.1f)  [fixed 1x batch vs growing state]")
    }
    // BM25/phrase from the persisted index: the probe question is
    // "what does a FIXED query set cost as the INDEX grows" — the
    // query-relevant postings stay 1× (replicas share no tokens with
    // replica 0), so near-flat growth is the evidence that the token
    // pushdown really prunes the postings scan and a probe never pays
    // for the rest of the corpus.
    if (opFilter.isEmpty || opFilter.exists("bm25_index_query".contains)) {
      val docs = Tables.documents(spark, sfDir)
      val times = scales.map { s =>
        val idx = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_bm25_$s").toString
        graft.operators.Retrieval.buildBm25Index(
          replicate(docs, s), col("doc_id"), col("text"), idx): Unit
        val run = () => {
          Bench.force(graft.operators.Retrieval.queryBm25Index(
            spark, idx, Seq("dup", "spark", "hash"), 20))
          Bench.force(graft.operators.Retrieval.phraseSearch(
            spark, idx, Seq("hash", "join"), 20))
        }
        run() // warm
        val t0 = System.nanoTime()
        run()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"${"bm25_index_query"}%-18s " + times.map(t => f"$t%8.2f").mkString(" ") +
        f"   (10x/1x ratio: ${times.last / times.head}%.1f)  [fixed queries vs growing index]")
    }
    // PageRank under power-law skew (round 10): a planted hub receives
    // HALF of all edges — the web-graph shape where per-round
    // groupBy(dst) concentrates on a few destinations. pageRank's
    // contribution sum is a hash aggregation, so Spark plans a map-side
    // PARTIAL sum before the exchange: the hub's shuffle rows are
    // bounded by the upstream partition count, not its edge count —
    // the two-phase form Skew.saltedCount hand-builds, already in the
    // plan. The agg-shape rows time the same sum with and without the
    // partial pass (the no-partial form repartitions raw contributions
    // by dst, so the hub task reads half the stream).
    if (opFilter.isEmpty || opFilter.exists("pagerank_hub".contains)) {
      def hubGraph(s: Int) = {
        val nNodes = 20000L * s
        val nEdges = 200000L * s
        val edges = spark.range(nEdges).select(
          (col("id") % nNodes).as("src"),
          when(col("id") % 2 === 0, lit(0L))
            .otherwise(pmod(xxhash64(col("id")), lit(nNodes))).as("dst"))
        (spark.range(nNodes).select(col("id")), edges)
      }
      val times = scales.map { s =>
        val (nodes, edges) = hubGraph(s)
        Bench.force(Graph.pageRank(nodes, edges, iters = 3)) // warm
        val t0 = System.nanoTime()
        Bench.force(Graph.pageRank(nodes, edges, iters = 3))
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"${"pagerank_hub"}%-18s " + times.map(t => f"$t%8.2f").mkString(" ") +
        f"   (10x/1x ratio: ${times.last / times.head}%.1f)  [50%% of edges -> one dst]")
      val aggTimes = scales.map { s =>
        val (_, edges) = hubGraph(s)
        val contrib = edges.select(col("dst").as("id"),
          (lit(1.0) / (pmod(col("src"), lit(7)) + lit(1))).as("c"))
          .localCheckpoint()
        def time(df: DataFrame) = {
          Bench.force(df); val t0 = System.nanoTime()
          Bench.force(df); (System.nanoTime() - t0) / 1e9
        }
        val twoPhase = time(contrib.groupBy(col("id"))
          .agg(sum(col("c").cast("decimal(27,10)")).as("s")))
        val noPartial = time(contrib.repartition(col("id"))
          .groupBy(col("id"))
          .agg(sum(col("c").cast("decimal(27,10)")).as("s")))
        spark.catalog.clearCache()
        (twoPhase, noPartial)
      }
      println(f"${"hub_agg_2phase"}%-18s " +
        aggTimes.map(t => f"${t._1}%8.2f").mkString(" ") +
        f"   (10x/1x: ${aggTimes.last._1 / aggTimes.head._1}%.1f)")
      println(f"${"hub_agg_nopartial"}%-18s " +
        aggTimes.map(t => f"${t._2}%8.2f").mkString(" ") +
        f"   (10x/1x: ${aggTimes.last._2 / aggTimes.head._2}%.1f)")
    }

    // Round-9 layout claims, growth-measured (round 10): fixed probe
    // vs a GROWING index, bucketed/partitioned layout vs plain files —
    // wall time AND actual bytes read off the scan (task input metrics).
    // Near-flat bucketed probes with a widening bytes gap are the
    // evidence that "a probe reads only its bytes" is literal.
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead): Unit
    })
    // vectored IO off for the byte measurements: parquet-mr's
    // readVectored path bypasses the Hadoop FS statistics feeding
    // inputMetrics.bytesRead, so data-page bytes would go uncounted
    // and every probe would report ~footer-only reads
    spark.sparkContext.hadoopConfiguration
      .set("parquet.hadoop.vectored.io.enabled", "false")
    def measured(run: () => Unit): (Double, Long) = {
      run() // warm
      Thread.sleep(200) // listener events drain async
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      run()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      (t, bytesRead.get())
    }
    if (opFilter.isEmpty || opFilter.exists("bm25_layout".contains)) {
      val docs = Tables.documents(spark, sfDir)
      val rows = scales.map { s =>
        val big = replicate(docs, s)
        val bkt = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_bml_b$s").toString
        graft.operators.Retrieval.buildBm25Index(
          big, col("doc_id"), col("text"), bkt): Unit
        // plain-file twin: identical postings/stats, no bucketed layout
        val plain = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_bml_p$s").toString
        graft.sources.Versioned.overwrite(
          graft.sources.Versioned.read(spark, s"$bkt/postings"),
          s"$plain/postings"): Unit
        graft.sources.Versioned.overwrite(
          graft.sources.Versioned.read(spark, s"$bkt/stats"),
          s"$plain/stats"): Unit
        def probe(dir: String) = measured(() =>
          Bench.force(graft.operators.Retrieval.queryBm25Index(
            spark, dir, Seq("dup", "spark", "hash"), 20)))
        val b = probe(bkt); val p = probe(plain)
        spark.catalog.clearCache()
        (b, p)
      }
      println(f"${"bm25_probe_bucket"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"bm25_probe_plain"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
    }
    if (opFilter.isEmpty || opFilter.exists("ann_layout".contains)) {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      def grow(s: Int) = (0 until s).map(i =>
        e.select((col("id") + lit(i * 1000000L)).as("id"), col("vec")))
        .reduce(_ unionByName _)
      // 2 queries × 4 probes ≤ 8 of 16 centroids: the probed-centroid
      // union must be a strict subset or there is nothing to prune
      // (10 queries × 4 probes covered all 16 and read every byte).
      // STORAGE-BACKED and filtered — DPP's trigger shape: a
      // localCheckpointed batch has no selective predicate, so the
      // optimizer skips pruning insertion entirely (measured: identical
      // bytes to the plain layout)
      val queries = e.filter(col("id") < 2)
      val rows = scales.map { s =>
        val big = grow(s)
        val part = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_annl_d$s").toString
        graft.operators.Similarity.buildIvfIndex(big, part,
          nCentroids = 16, assignmentLayout = "partition"): Unit
        val plain = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_annl_p$s").toString
        graft.sources.Versioned.overwrite(
          graft.sources.Versioned.read(spark, s"$part/centroids"),
          s"$plain/centroids"): Unit
        graft.sources.Versioned.overwrite(
          graft.sources.Versioned.read(spark, s"$part/assignment"),
          s"$plain/assignment"): Unit
        def probe(dir: String) = measured(() =>
          Bench.force(graft.operators.Similarity.queryIvfIndex(
            spark, dir, queries, k = 5, nProbes = 4)))
        val d = probe(part); val p = probe(plain)
        spark.catalog.clearCache()
        (d, p)
      }
      println(f"${"ann_probe_dpp"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"ann_probe_plain"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
    }

    // Round-15 filtered-ANN claim: a SELECTIVE gate (~1% of candidates)
    // underfills a fixed-width probe, and the adaptive widening
    // (queryIvfIndexFilteredAdaptive) escalates until k eligible rows
    // fill — so probed BYTES are set by the gate's selectivity, not the
    // corpus: at small scale few eligible rows sit per bucket and the
    // escalation approaches the exhaustive scan (the information floor
    // — they must be found), while at 10× each probed bucket holds 10×
    // the eligible rows, the first width already fills k, and bytes
    // grow SUB-linearly vs the corpus. The exhaustive-filtered row is
    // the ceiling the adaptive path must undercut at scale.
    if (opFilter.isEmpty || opFilter.exists("ann_filtered_selective".contains)) {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      def grow(s: Int) = (0 until s).map(i =>
        e.select((col("id") + lit(i * 1000000L)).as("id"), col("vec")))
        .reduce(_ unionByName _)
        .withColumn("rare", pmod(col("id"), lit(97L)) < 1) // ~1% uniform
      val queries = e.filter(col("id") < 2)
      val rows = scales.map { s =>
        val big = grow(s)
        val dir = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_annf_$s").toString
        graft.operators.Similarity.buildIvfIndex(big, dir,
          nCentroids = 16, assignmentLayout = "partition",
          metaCols = Seq("rare")): Unit
        graft.operators.Similarity.refreshGateCounts(spark, dir,
          Seq("rare")): Unit
        def probeA() = measured(() =>
          Bench.force(graft.operators.Similarity.queryIvfIndexFilteredAdaptive(
            spark, dir, queries, k = 5, predicate = col("rare"), nProbes = 1)))
        // round-16: the gatecounts sidecar picks every query's probe
        // width in ONE round — bytes must track the adaptive path's
        // FINAL round alone (no geometric re-scans, no per-doubling
        // driver round-trip)
        def probeC() = measured(() =>
          Bench.force(graft.operators.Similarity.queryIvfIndexFilteredCounted(
            spark, dir, queries, k = 5, gateCol = "rare", gateVal = true)))
        def probeX() = measured(() =>
          Bench.force(graft.operators.Similarity.queryIvfIndexFiltered(
            spark, dir, queries, k = 5, predicate = col("rare"), nProbes = 16)))
        val a = probeA(); val c = probeC(); val x = probeX()
        spark.catalog.clearCache()
        (a, c, x)
      }
      println(f"${"ann_filtered_sel"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"ann_filtered_cnt"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
      println(f"${"ann_filtered_exh"}%-18s " +
        rows.map(r => f"${r._3._1}%5.2fs ${r._3._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._3._2.toDouble / rows.head._3._2}%.1f)")
    }

    // Round-11 layout claim: DYNAMIC term sets (queryBm25IndexMany —
    // terms arrive as data, nothing pushes into the scan) against a
    // growing index. The bucketed layout must read ALL postings bytes
    // (pruning needs literals); the partition layout's broadcast term
    // join carries the shard key, so DPP prunes unprobed directories —
    // a FIXED query batch's bytes must grow sub-linearly. The batch is
    // storage-backed + filtered (DPP's trigger shape).
    if (opFilter.isEmpty || opFilter.exists("bm25_many_layout".contains)) {
      import spark.implicits._
      val docs = Tables.documents(spark, sfDir)
      val qdir = java.nio.file.Files
        .createTempDirectory("scaleprobe_bmq").toString
      Seq((1L, Seq("dup", "spark"), "keep"),
          (2L, Seq("hash", "join", "table"), "keep"),
          (3L, Seq("unused"), "drop"))
        .toDF("query_id", "terms", "tag")
        .write.mode("overwrite").parquet(qdir)
      val qdf = spark.read.parquet(qdir).filter(col("tag") === "keep")
        .select("query_id", "terms")
      val rows = scales.map { s =>
        val big = replicate(docs, s)
        val part = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_bmm_d$s").toString
        graft.operators.Retrieval.buildBm25Index(
          big, col("doc_id"), col("text"), part, layout = "partition"): Unit
        val bkt = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_bmm_b$s").toString
        graft.operators.Retrieval.buildBm25Index(
          big, col("doc_id"), col("text"), bkt): Unit
        def probe(dir: String) = measured(() =>
          Bench.force(graft.operators.Retrieval.queryBm25IndexMany(
            spark, dir, qdf, 10)))
        val d = probe(part); val b = probe(bkt)
        spark.catalog.clearCache()
        (d, b)
      }
      println(f"${"bm25_many_part"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"bm25_many_bucket"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
    }

    // Round-13 adversarial-corpus claim: the uniform synthetic corpus
    // has no true stop tokens, so bm25_many_part above measures the
    // happy case — a REAL corpus is Zipf-skewed, and a stop token's
    // postings list is corpus-sized, so ONE stop-bearing query makes
    // the "pruned" slice scale with the corpus on BOTH rankers. Fixture:
    // boilerplate stop tokens (df = N) plus a 997-type rare-marker
    // vocabulary (so shards are not degenerate); queries mix one stop
    // token with one rare marker. The capped build (heavyTokens df >
    // 0.5·N — the q183 semantics) drops the stop shards from the read
    // set; the surviving rare terms' postings still grow with their df
    // (information-theoretic floor), so the evidence is the capped/
    // uncapped BYTES RATIO per scale, not a flat slope.
    if (opFilter.isEmpty || opFilter.exists("bm25_zipf".contains)) {
      import spark.implicits._
      val docs0 = Tables.documents(spark, sfDir)
      // the boilerplate attaches AFTER replication (replicate() rewrites
      // tokens per replica — a pre-attached stop token would fall below
      // the df threshold at 3×), so zz* stay df = N at every scale
      def zipf(docs: DataFrame) = docs.withColumn("text", concat(col("text"),
        lit(" zz0 zz1 zz2 zz0 zz1 zz2 "),
        concat(lit("rare"), pmod(col("doc_id"), lit(997L)))))
      val qdir = java.nio.file.Files
        .createTempDirectory("scaleprobe_zipfq").toString
      Seq((1L, Seq("zz0", "rare13"), "keep"),
          (2L, Seq("zz1", "rare257"), "keep"),
          (3L, Seq("unused"), "drop"))
        .toDF("query_id", "terms", "tag")
        .write.mode("overwrite").parquet(qdir)
      val qdf = spark.read.parquet(qdir).filter(col("tag") === "keep")
        .select("query_id", "terms")
      val rows = scales.map { s =>
        val big = zipf(replicate(docs0, s))
        val un = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_zipf_u$s").toString
        graft.operators.Retrieval.buildBm25Index(big, col("doc_id"),
          col("text"), un, layout = "partition", nPartDirs = 64): Unit
        val stops = graft.operators.Retrieval.heavyTokens(big,
            col("doc_id"), col("text"), maxDfRatio = 0.5)
          .select("tok").collect().map(_.getString(0)).toSeq
        val cap = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_zipf_c$s").toString
        graft.operators.Retrieval.buildBm25Index(big, col("doc_id"),
          col("text"), cap, layout = "partition", nPartDirs = 64,
          stopTokens = stops): Unit
        val bmU = measured(() => Bench.force(
          graft.operators.Retrieval.queryBm25IndexMany(spark, un, qdf, 10)))
        val qlU = measured(() => Bench.force(
          graft.operators.Retrieval.queryQlIndexMany(spark, un, qdf, 10)))
        val bmC = measured(() => Bench.force(
          graft.operators.Retrieval.queryBm25IndexMany(spark, cap, qdf, 10)))
        spark.catalog.clearCache()
        (bmU, qlU, bmC)
      }
      def zrow(name: String,
               pick: ((Double, Long), (Double, Long), (Double, Long)) => (Double, Long)): Unit = {
        val vs = rows.map(r => pick(r._1, r._2, r._3))
        println(f"$name%-18s " +
          vs.map(v => f"${v._1}%5.2fs ${v._2 / 1024}%7dKB").mkString(" ") +
          f"   (bytes 10x/1x: ${vs.last._2.toDouble / vs.head._2}%.1f)")
      }
      zrow("bm25_zipf_uncap", (a, _, _) => a)
      zrow("ql_zipf_uncap", (_, b, _) => b)
      zrow("bm25_zipf_capped", (_, _, c) => c)
      println(f"${"zipf_capped/uncap"}%-18s " + rows.map(r =>
        f"${r._3._2.toDouble / r._1._2}%14.2f ").mkString(" "))
    }

    // Round-12 serve-path claim (the round-11 VERDICT's one weak item,
    // closed): a FIXED RAG serving batch against a GROWING corpus —
    // the forward-index forms (assembleContextIndexed: clip lengths
    // column-pruned + DPP doc-shard pruned; contextTextsIndexed: span
    // token slices off the pruned shards) vs the corpus-scan forms
    // that re-tokenize every document per batch. Sub-linear indexed
    // bytes with near-linear scan bytes is the evidence the serve path
    // stopped paying a corpus read per query batch. The span set is
    // in-session here — the shard-range guard in forwardFor is what
    // lets DPP fire without a storage-backed batch.
    if (opFilter.isEmpty || opFilter.exists("rag_serve".contains)) {
      import spark.implicits._
      val docs = Tables.documents(spark, sfDir)
      val packed = Seq(
        (1L, 3L, 1L, 8L, 0.9), (1L, 7L, 1L, 12L, 0.8),
        (2L, 11L, 1L, 10L, 0.7), (2L, 19L, 1L, 6L, 0.6))
        .toDF("query_id", "doc_id", "span_start", "span_end", "score")
      val fused = Seq(
        (1L, 3L, 1L, 0.9), (1L, 7L, 1L, 0.8),
        (2L, 11L, 1L, 0.7), (2L, 19L, 1L, 0.6))
        .toDF("query_id", "doc_id", "chunk_start", "rrf")
      val rows = scales.map { s =>
        val big = replicate(docs, s)
        val fdir = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_rag_f$s").toString
        graft.operators.Retrieval.buildForwardIndex(
          big, col("doc_id"), col("text"), fdir): Unit
        val textIdx = measured(() => Bench.force(
          graft.operators.Retrieval.contextTextsIndexed(spark, packed, fdir)))
        val textScan = measured(() => Bench.force(
          graft.operators.Retrieval.contextTexts(packed, big,
            col("doc_id"), col("text"))))
        val packIdx = measured(() => Bench.force(
          graft.operators.Retrieval.assembleContextIndexed(spark, fused,
            fdir, size = 8, budget = 1000, maxPerDoc = 2)))
        val packScan = measured(() => Bench.force(
          graft.operators.Retrieval.assembleContext(fused, big,
            col("doc_id"), col("text"), size = 8, budget = 1000,
            maxPerDoc = 2)))
        spark.catalog.clearCache()
        (textIdx, textScan, packIdx, packScan)
      }
      def row(name: String, pick: ((Double, Long), (Double, Long), (Double, Long), (Double, Long)) => (Double, Long)): Unit = {
        val vs = rows.map(r => pick(r._1, r._2, r._3, r._4))
        println(f"$name%-18s " +
          vs.map(v => f"${v._1}%5.2fs ${v._2 / 1024}%7dKB").mkString(" ") +
          f"   (bytes 10x/1x: ${vs.last._2.toDouble / vs.head._2}%.1f)")
      }
      row("rag_text_fwd", (a, _, _, _) => a)
      row("rag_text_scan", (_, b, _, _) => b)
      row("rag_pack_fwd", (_, _, c, _) => c)
      row("rag_pack_scan", (_, _, _, d) => d)
    }

    // Round-13 serve-path claim (the round-12 VERDICT's one weak item,
    // closed): the exact RE-RANK stage of the compressed ANN path — a
    // FIXED query batch against a GROWING corpus, the DPP-pruned fetch
    // off the index's own vectors table vs the retired shape's full
    // float-table scan. Both runs pay the same ADC shortlist stage;
    // the delta is the re-rank fetch. Sub-linear dpp bytes with
    // near-linear scan bytes is the evidence the last corpus-sized
    // read left the serving path.
    if (opFilter.isEmpty || opFilter.exists("ann_rerank".contains)) {
      import spark.implicits._
      // CHUNK grain — the largest vector artifact in the system (every
      // document explodes into size/stride windows), where the re-rank
      // fetch hurt most: the pre-r13 shape re-chunked and re-embedded
      // this whole corpus per serving batch
      val docs = Tables.documents(spark, sfDir)
      // one query, k·alpha = 10: the shortlist must not cover every
      // shard or there is nothing to prune (the bm25_many/ann_layout
      // lesson) — at deployment scale shards outnumber any shortlist
      val qraw = Seq((900000001L, Seq("dup", "spark")))
        .toDF("query_id", "terms")
      val queries = graft.operators.Corpus.hashEmbed(qraw, col("query_id"),
        concat_ws(" ", col("terms")))
      val rows = scales.map { s =>
        val idx = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_rr_$s").toString
        graft.operators.Retrieval.buildChunkIvfPqIndex(replicate(docs, s),
          col("doc_id"), col("text"), idx, size = 32, stride = 16): Unit
        // the ADC shortlist stage is SHARED by both re-rank forms and is
        // inherently ∝ corpus·nProbes/nCentroids (code-width rows) — at
        // larger SFs it dominates the totals, so it is measured as its
        // own floor and the FETCH deltas are derived below it
        val floor = measured(() => Bench.force(
          graft.operators.Similarity.queryIvfPqIndex(
            spark, idx, queries, k = 10, nProbes = 4)))
        val dpp = measured(() => Bench.force(
          graft.operators.Similarity.queryIvfPqIndexReranked(
            spark, idx, queries, k = 5, alpha = 2, nProbes = 4)))
        // the retired pre-r13 shape: the k·alpha shortlist joined
        // against EVERY full-precision vector row (no shard key on the
        // probe, so nothing prunes — the whole float table streams)
        val scan = measured(() => Bench.force {
          val short = graft.operators.Similarity.queryIvfPqIndex(
              spark, idx, queries, k = 10, nProbes = 4)
            .select(col("query_id"), col("cand_id"))
          val c = graft.sources.Versioned.read(spark, s"$idx/vectors")
            .select(col("cand_id"), col("cv"))
          val q = queries.select(col("id").as("query_id"),
            graft.functions.VectorOps.toDoubleArray(col("vec")).as("qv"))
          graft.operators.Ranking.topPerGroup(
            c.join(broadcast(short), Seq("cand_id"))
              .join(broadcast(q), Seq("query_id"))
              .withColumn("dot",
                graft.functions.VectorOps.dot(col("qv"), col("cv"))),
            Seq(col("query_id")), Seq(col("dot").desc, col("cand_id").asc), 5)
        })
        spark.catalog.clearCache()
        (floor, dpp, scan)
      }
      println(f"${"ann_adc_floor"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"ann_rerank_dpp"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
      println(f"${"ann_rerank_scan"}%-18s " +
        rows.map(r => f"${r._3._1}%5.2fs ${r._3._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._3._2.toDouble / rows.head._3._2}%.1f)")
      // the fetch alone (total − shared ADC floor): the r13 claim is
      // about THESE bytes — the dpp fetch is bounded by the shortlist's
      // shard directories while the scan fetch streams the float table
      println(f"${"rerank_fetch_dpp"}%-18s " + rows.map(r =>
        f"${math.max(0L, r._2._2 - r._1._2) / 1024}%13dKB ").mkString(" "))
      println(f"${"rerank_fetch_scan"}%-18s " + rows.map(r =>
        f"${math.max(0L, r._3._2 - r._1._2) / 1024}%13dKB ").mkString(" "))
    }

    // Round-14 serve-path claim (the r13 VERDICT's What's-wrong #1,
    // closed): a PINNED serving batch straddling a COMPACTION — the pin
    // predates the live layout epoch, and before r14 every such
    // micro-batch read the forward table unpruned for the stream's
    // remaining lifetime. With per-epoch sidecar history the pre-epoch
    // pin prunes with ITS OWN epoch's modulus: pinned bytes should stay
    // bounded (shard-sized) while the no-history twin (the pre-r14
    // behavior, simulated by deleting the pin's epoch record) grows
    // with the corpus.
    if (opFilter.isEmpty || opFilter.exists("rag_pinned".contains)) {
      import spark.implicits._
      val docs = Tables.documents(spark, sfDir)
      val packed = Seq(
        (1L, 3L, 1L, 8L, 0.9), (1L, 7L, 1L, 12L, 0.8),
        (2L, 11L, 1L, 10L, 0.7), (2L, 19L, 1L, 6L, 0.6))
        .toDF("query_id", "doc_id", "span_start", "span_end", "score")
      val rows = scales.map { s =>
        val big = replicate(docs, s)
        val fdir = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_pin_$s").toString
        graft.operators.Retrieval.buildForwardIndex(
          big, col("doc_id"), col("text"), fdir): Unit          // v0: epoch A
        graft.operators.Retrieval.appendToForwardIndex(
          Seq((900000001L, "appended doc")).toDF("doc_id", "text"),
          col("doc_id"), col("text"), fdir): Unit               // v1: the pin
        graft.operators.Retrieval.compactForwardIndex(spark, fdir): Unit // v2: epoch B
        def pinnedRead() = Bench.force(
          graft.operators.Retrieval.contextTextsIndexed(spark, packed, fdir,
            asOf = Some(1L)))
        val pinned = measured(pinnedRead _)
        // the pre-r14 behavior: no surviving record for the pin's epoch
        val ep0 = new org.apache.hadoop.fs.Path(fdir, "doc_parts@0")
        ep0.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(ep0, false): Unit
        val nohist = measured(pinnedRead _)
        spark.catalog.clearCache()
        (pinned, nohist)
      }
      println(f"${"rag_pinned_epoch"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"rag_pinned_nohist"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
    }

    // Round-14 Zipf claim (the r13 VERDICT's What's-wrong #2, closed):
    // the POST-BUILD BURST — boilerplate that emerges only AFTER a
    // capped build (a new spam template). The frozen stop set never
    // caps it, so a burst-bearing probe's bytes grow with the corpus
    // until the next compaction's RECAP re-derives the set over the
    // grown corpus and drops the newly-heavy postings. precap bytes
    // should grow ~linearly; recap bytes should drop back to the
    // rare-term floor at every scale.
    if (opFilter.isEmpty || opFilter.exists("bm25_burst".contains)) {
      import spark.implicits._
      val docs0 = Tables.documents(spark, sfDir)
      def zipf(docs: DataFrame) = docs.withColumn("text", concat(col("text"),
        lit(" zz0 zz1 zz2 "),
        concat(lit("rare"), pmod(col("doc_id"), lit(997L)))))
      val qdir = java.nio.file.Files
        .createTempDirectory("scaleprobe_burstq").toString
      Seq((1L, Seq("zzburst", "rare13"), "keep"),
          (2L, Seq("unused"), "drop"))
        .toDF("query_id", "terms", "tag")
        .write.mode("overwrite").parquet(qdir)
      val qdf = spark.read.parquet(qdir).filter(col("tag") === "keep")
        .select("query_id", "terms")
      val rows = scales.map { s =>
        val base = zipf(replicate(docs0, s))
        val dir = java.nio.file.Files
          .createTempDirectory(s"scaleprobe_burst_$s").toString
        val stops = graft.operators.Retrieval.heavyTokens(base,
            col("doc_id"), col("text"), maxDfRatio = 0.4)
          .select("tok").collect().map(_.getString(0)).toSeq
        graft.operators.Retrieval.buildBm25Index(base, col("doc_id"),
          col("text"), dir, layout = "partition", nPartDirs = 64,
          stopTokens = stops, stopMaxDfRatio = Some(0.4)): Unit
        val maxId = base.agg(max(col("doc_id"))).head.getLong(0)
        // the burst: a same-sized batch whose every doc carries the new
        // boilerplate token — df ends at 0.5 of the doubled corpus,
        // above the recorded 0.4 ratio, but FROZEN-set appends admit it
        val burst = base.select((col("doc_id") + maxId + 1L).as("doc_id"),
          concat(col("text"), lit(" zzburst zzburst")).as("text"))
        graft.operators.Retrieval.appendToBm25Index(burst, col("doc_id"),
          col("text"), dir): Unit
        def probe() = Bench.force(
          graft.operators.Retrieval.queryBm25IndexMany(spark, dir, qdf, 10))
        val pre = measured(probe _)
        graft.operators.Retrieval.compactBm25Index(spark, dir): Unit
        val post = measured(probe _)
        spark.catalog.clearCache()
        (pre, post)
      }
      println(f"${"zipf_burst_precap"}%-18s " +
        rows.map(r => f"${r._1._1}%5.2fs ${r._1._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._1._2.toDouble / rows.head._1._2}%.1f)")
      println(f"${"zipf_burst_recap"}%-18s " +
        rows.map(r => f"${r._2._1}%5.2fs ${r._2._2 / 1024}%7dKB").mkString(" ") +
        f"   (bytes 10x/1x: ${rows.last._2._2.toDouble / rows.head._2._2}%.1f)")
      println(f"${"burst_recap/precap"}%-18s " + rows.map(r =>
        f"${r._2._2.toDouble / r._1._2}%14.2f ").mkString(" "))
    }

    // q42 inversion evidence (round 10): the distributed exact-
    // percentile machinery vs the input size — 10× sf0.1 lineitem ≈
    // sf1. Engine time should grow SUB-linearly off its fixed stage
    // floor while any one-buffer/one-task form grows linearly at best;
    // the DuckDB twin is timed by tools/percentile_probe.py and the
    // pair is recorded in SURVEY §9.1.
    if (opFilter.isEmpty || opFilter.exists("percentile_scale".contains)) {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val times = scales.map { s =>
        val big = (0 until s).map(i => li.select(col("l_returnflag"),
            (col("l_extendedprice") + lit(i)).as("l_extendedprice")))
          .reduce(_ unionByName _)
        val probe = () => Bench.force(graft.operators.Stats.exactPercentiles(
          big, col("l_returnflag"), col("l_extendedprice"),
          Seq(0.25, 0.5, 0.75, 0.99)))
        probe()
        val t0 = System.nanoTime()
        probe()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"${"percentile_scale"}%-18s " + times.map(t => f"$t%8.2f").mkString(" ") +
        f"   (10x/1x ratio: ${times.last / times.head}%.1f)  [10x sf0.1 ~= sf1]")
    }

    // Tokenizer-true export path (round 10, q165's engine half): encode
    // with a FIXED persisted model + budget-pack the id stream over a
    // growing corpus (ids offset, text duplicated — same subword space,
    // so the vocab join stays total). Near-linear growth = the encode's
    // broadcast-merge rewrite, the per-doc array agg, and the packing
    // prefix sum all stay corpus-pass-shaped with no quadratic term.
    if (opFilter.isEmpty || opFilter.exists("bpe_export".contains)) {
      val docs = Tables.documents(spark, sfDir)
      val mdl = java.nio.file.Files
        .createTempDirectory("scaleprobe_bpe_mdl").toString
      graft.operators.Bpe.buildBpeModel(docs, col("text"), k = 6, mdl): Unit
      def growDup(s: Int) = (0 until s).map(i =>
        docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
        .reduce(_ unionByName _)
      val times = scales.map { s =>
        val big = growDup(s)
        val probe = () => Bench.force(graft.operators.Bpe.packedIdSequences(
          graft.operators.Bpe.encodeIdsWithModel(
            spark, mdl, big, col("doc_id"), col("text")), 512))
        probe()
        val t0 = System.nanoTime()
        probe()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"${"bpe_export"}%-18s " + times.map(t => f"$t%8.2f").mkString(" ") +
        f"   (10x/1x ratio: ${times.last / times.head}%.1f)  [fixed model, encode+pack]")
    }
    spark.stop()
  }
}
