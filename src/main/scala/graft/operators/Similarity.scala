package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over embedding columns (SURVEY.md §2.3 J7).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query side,
  *    stream the candidate side, one window per query id. O(|Q|·|C|)
  *    cosines but a single pass over the big side, no shuffle of the
  *    candidate vectors themselves. This is the correctness baseline.
  *  - [[lshTopK]] — approximate scale path: random-hyperplane signatures
  *    bucket the candidates; only same-bucket pairs are scored. At
  *    100 TB the bucket join replaces the cross product — recall is
  *    tunable by nBits/nTables.
  *
  * Norms are computed once per row BEFORE the pair join (not once per
  * pair): at |Q|=10, k=64 that is 10+N norm computations instead of 10·N.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query row.
    *
    * @param queries    (id, vec) — must be small enough to broadcast
    * @param candidates (id, vec)
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(col("id").as("query_id"), VectorOps.toDoubleArray(col("vec")).as("qv"))
      .withColumn("q_norm_sq", VectorOps.normSq(col("qv")))
    val c = candidates
      .select(col("id").as("cand_id"), VectorOps.toDoubleArray(col("vec")).as("cv"))
      .withColumn("c_norm_sq", VectorOps.normSq(col("cv")))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("sim",
        VectorOps.cosineWithNorms(col("qv"), col("cv"), col("q_norm_sq"), col("c_norm_sq")))
    // single window pass computes AND keeps the rank (a topPerGroup +
    // re-rank would run the identical window sort twice)
    scored
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("sim"))
  }

  /** Hard-negative mining — the contrastive-training data-prep step
    * (dense-retrieval recipes à la DPR/ANCE): for each query row, the
    * k most-similar candidates carrying a DIFFERENT label. "Close in
    * embedding space but differently labeled" is exactly the pair a
    * contrastive loss learns most from.
    *
    * Scale shape = [[bruteForceTopK]]: broadcast query side × one pass
    * over the candidate scan (declared BNLJ), with the label
    * inequality riding the join condition so same-label pairs never
    * materialize. At 100 TB the same composition rides the IVF index
    * ([[queryIvfIndex]] with a post-filter on label, over-fetching
    * k·labels to survive the filter) — the brute form is the exact
    * baseline the index path is measured against.
    *
    * @param queries    (id, vec, label) — small enough to broadcast
    * @param candidates (id, vec, label)
    */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(col("id").as("query_id"), VectorOps.toDoubleArray(col("vec")).as("qv"),
        col("label").as("q_label"))
      .withColumn("q_norm_sq", VectorOps.normSq(col("qv")))
    val c = candidates
      .select(col("id").as("cand_id"), VectorOps.toDoubleArray(col("vec")).as("cv"),
        col("label").as("cand_label"))
      .withColumn("c_norm_sq", VectorOps.normSq(col("cv")))
    c.join(broadcast(q), col("cand_label") =!= col("q_label"))
      .withColumn("sim",
        VectorOps.cosineWithNorms(col("qv"), col("cv"), col("q_norm_sq"), col("c_norm_sq")))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cand_label"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: component i of plane j is
    * derived from a fixed-seed xorshift mix of (j, i). Stable across
    * runs, sessions, and cluster sizes — required for reproducible
    * bucketing.
    */
  private[graft] def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    Array.tabulate(nBits, dim) { (j, i) =>
      var x = (j.toLong << 32) | (i.toLong + 1)
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      x ^= 0x9e3779b97f4a7c15L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (math.abs(x % 2000001L).toDouble / 1000000.0) - 1.0
    }
  }

  /** Approximate top-k via random-hyperplane LSH: candidates whose
    * signature matches the query's in at least one band are scored.
    * nBits bits split into nBands bands → same-band-hash pairs join.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nBits: Int = 16, nBands: Int = 4): DataFrame = {
    require(nBits % nBands == 0, "nBits must divide into nBands")
    val rowsPerBand = nBits / nBands
    val planes = hyperplanes(nBits, 64)
    val planesLit = array(planes.map(p => array(p.map(lit): _*)): _*)

    def base(df: DataFrame, idAs: String): DataFrame =
      df.select(col("id").as(idAs), VectorOps.toDoubleArray(col("vec")).as(s"${idAs}_v"))
        .withColumn(s"${idAs}_norm_sq", VectorOps.normSq(col(s"${idAs}_v")))

    // bands carry only (id, band, band_key): the hyperplane signature is
    // computed exactly once per row, and the scoring join below fetches
    // vectors from the plain base projection (no signature recompute)
    def bands(b: DataFrame, idAs: String): DataFrame = {
      val v = col(s"${idAs}_v")
      val bits = transform(planesLit, p =>
        when(VectorOps.dot(v, p) >= 0, lit(1)).otherwise(lit(0)))
      b.withColumn("__bits", bits)
        .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
        .withColumn("band_key",
          aggregate(slice(col("__bits"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
            lit(0L), (acc, b) => acc * 2 + b))
        .select(col(idAs), col("band"), col("band_key"))
    }

    val qBase = base(queries, "query_id")
    val cBase = base(candidates, "cand_id")
    // dedup band collisions on the 16-byte id pair, then join the
    // vectors back for scoring — distinct() over rows carrying two
    // 64-element arrays would shuffle the full vectors per banded pair
    val pairs = bands(cBase, "cand_id")
      .join(broadcast(bands(qBase, "query_id")), Seq("band", "band_key"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
    val paired = pairs
      .join(cBase, Seq("cand_id"))
      .join(broadcast(qBase), Seq("query_id"))
      .withColumn("sim", VectorOps.cosineWithNorms(
        col("query_id_v"), col("cand_id_v"),
        col("query_id_norm_sq"), col("cand_id_norm_sq")))
    Ranking.topPerGroup(paired, Seq(col("query_id")),
        Seq(col("sim").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("sim"))
      .orderBy(col("query_id"), col("sim").desc, col("cand_id"))
  }

  /** Approximate top-k via IVF (inverted-file) partitioning: candidates
    * are assigned to their nearest centroid (one pass, broadcast
    * centroids); each query scans only its `nProbes` nearest centroid
    * buckets. At scale this turns the cross product into a
    * bucket-equality join whose cost is |corpus|·nProbes/nCentroids per
    * query — the classic IVF-flat recall/cost dial.
    *
    * Seed centroids are a deterministic pseudo-random sample of the
    * corpus (smallest md5-bucket key: stable across runs and cluster
    * sizes, reproducible by an external engine). `lloydIters` runs that
    * many k-means (Lloyd) refinement passes over the seeds — each is
    * one assignment pass plus a per-dimension mean. The means are
    * DETERMINISTIC AND CROSS-ENGINE REPRODUCIBLE: per-dimension sums
    * run in DECIMAL(27,10) (exact, order-independent — a double sum
    * would vary with partitioning), then one double division by the
    * cluster size. Empty clusters drop; their seed id disappears from
    * the centroid set in every engine identically.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nCentroids: Int = 16, nProbes: Int = 4,
              lloydIters: Int = 0): DataFrame = {
    val c = prepCandidates(candidates)
    val (centroids, assigned) = centroidsAndAssignment(c, nCentroids, lloydIters)
    probeIndex(queries, centroids, assigned, k, nProbes)
  }

  /** Corpus projection shared by the inline and persisted IVF paths. */
  private def prepCandidates(candidates: DataFrame): DataFrame = candidates
    .select(col("id").as("cand_id"), VectorOps.toDoubleArray(col("vec")).as("cv"))
    .withColumn("c_norm_sq", VectorOps.normSq(col("cv")))

  /** Core assignment columns across the index family; anything else on
    * an assignment row is caller-baked METADATA — the columns a
    * filtered probe may gate on. */
  private val assignmentCoreCols =
    Set("centroid_id", "cand_id", "cv", "c_norm_sq", "cq", "pqcode")

  private def assignmentMetaCols(assigned: DataFrame): Seq[String] =
    assigned.columns.toSeq.filterNot(assignmentCoreCols)

  /** Metadata columns a persisted index's assignment carries — what a
    * composing caller (the chunk-grain appenders) must re-derive for
    * its batch before handing it to the append. */
  private[operators] def indexMetaCols(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[String] =
    assignmentMetaCols(
      graft.sources.Versioned.read(spark, s"$indexDir/assignment"))

  /** Bake caller-named metadata columns (language, date, license — the
    * filtered-search gates) onto index rows by cand_id. One equality
    * join at BUILD/APPEND cadence buys every probe a join-free,
    * scan-resident gate. */
  private def withMeta(rows: DataFrame, source: DataFrame,
                       metaCols: Seq[String]): DataFrame =
    if (metaCols.isEmpty) rows
    else rows.join(
      source.select((col("id").as("cand_id") +: metaCols.map(col)): _*),
      Seq("cand_id"))

  /** Refuse a probe predicate naming columns the index does not carry:
    * silently scoring an UNfiltered stream would be a wrong answer, not
    * a degradation — the one sidecar-style fail-open this family must
    * never have. */
  private def requirePredicateCols(indexDir: String, assigned: DataFrame,
                                   predicate: Column): Unit =
    try assigned.filter(predicate).queryExecution.analyzed: Unit
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"$indexDir assignment cannot resolve the probe predicate " +
            s"`$predicate` — a filtered probe gates candidates INSIDE the " +
            "probed-bucket scan, so the predicate may only reference " +
            "columns baked into the index at build (metaCols; available " +
            s"metadata here: ${assignmentMetaCols(assigned) match {
              case Nil => "none — this index was built without metaCols"
              case ms => ms.mkString(", ")
            }}). Rebuild with the column in metaCols, or gate through a " +
            "separate (id, label) relation with hardNegativesIndexed-style " +
            s"post-join scoring. Analyzer: ${e.getSimpleMessage}", e)
    }

  /** The IVF build: deterministic seed sample, optional Lloyd passes,
    * final assignment. Returns (centroids, assignment) — exactly the
    * two relations a persisted index stores.
    */
  private def centroidsAndAssignment(c: DataFrame, nCentroids: Int,
                                     lloydIters: Int): (DataFrame, DataFrame) = {
    // Sample key = md5-derived long (graft's deterministic hash-bucket
    // family): stable across runs/layouts like xxhash64, but computable
    // in any engine — which is what lets the DuckDB oracle reproduce
    // the centroid set and hash-check the whole IVF pipeline.
    val sampleKey =
      conv(substring(md5(col("cand_id").cast("string")), 1, 8), 16, 10).cast("long")
    val seeds = c
      .orderBy(sampleKey.asc, col("cand_id").asc)
      .limit(nCentroids)
      .select(col("cand_id").as("centroid_id"), col("cv").as("centv"),
        col("c_norm_sq").as("cent_norm_sq"))

    val centroids = (1 to lloydIters).foldLeft(seeds) { (cent, _) =>
      assignTo(c, cent)
        .select(col("centroid_id"), posexplode(col("cv")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(col("col").cast("decimal(27,10)")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s").cast("double") / col("n")).as("m")))),
          x => x("m")).as("centv"))
        .withColumn("cent_norm_sq", VectorOps.normSq(col("centv")))
        .select(col("centroid_id"), col("centv"), col("cent_norm_sq"))
    }
    (centroids, assignTo(c, centroids))
  }

  /** Centroid set as ONE row holding an array of (centroid_id, centv,
    * cent_norm_sq) structs: broadcast-joined onto the corpus so nearest-
    * centroid selection is a PER-ROW array fold — zero shuffles of the
    * corpus, where the previous window-ranking form (`topPerGroup` over
    * candidate×centroid pairs) shuffled the full corpus WITH its vectors
    * once per call and once per Lloyd iteration. At 100 TB that window
    * was 1+lloydIters avoidable full-corpus vector shuffles.
    */
  private def centArray(cent: DataFrame): DataFrame = cent
    .agg(collect_list(struct(col("centroid_id"), col("centv"),
      col("cent_norm_sq"))).as("cents"))

  /** (sim, centroid_id) per centroid, computed once per element inside
    * `transform` (the lambda binds everything it dereferences — an
    * unbound subexpression would re-evaluate per element). Null sims
    * (zero-norm vectors) rank last, matching the window form's
    * descending NULLS LAST.
    */
  private def scoredCents(v: Column, normSq: Column): Column =
    transform(col("cents"), ct => struct(
      coalesce(VectorOps.cosineWithNorms(v, ct("centv"), normSq, ct("cent_norm_sq")),
        lit(Double.NegativeInfinity)).as("sim"),
      ct("centroid_id").as("centroid_id")))

  /** Comparator = sim DESC, centroid_id ASC — the same total order the
    * window form used, so ties resolve identically (order-independent:
    * collect_list's arbitrary array order cannot change the result).
    */
  private val bySimDescIdAsc = (l: Column, r: Column) =>
    when(l("sim") > r("sim"), lit(-1)).when(l("sim") < r("sim"), lit(1))
      .when(l("centroid_id") < r("centroid_id"), lit(-1))
      .when(l("centroid_id") > r("centroid_id"), lit(1)).otherwise(lit(0))

  /** Assignment: nearest centroid per candidate (cosine, ties → smaller
    * id), map-side per-row argmax over the broadcast centroid array.
    */
  private def assignTo(c: DataFrame, cent: DataFrame): DataFrame = c
    .join(broadcast(centArray(cent)), lit(true))
    .withColumn("__best",
      element_at(array_sort(scoredCents(col("cv"), col("c_norm_sq")), bySimDescIdAsc), 1))
    .select(col("__best")("centroid_id").as("centroid_id"),
      col("cand_id"), col("cv"), col("c_norm_sq"))

  /** Probe + scan + rank against a (centroids, assignment) pair —
    * shared by the inline path and [[queryIvfIndex]].
    */
  /** The probe pipeline up to (query_id, cand_id, sim) scored pairs —
    * the pre-ranking seam [[probeIndex]] and label-aware consumers
    * ([[hardNegativesIndexed]]) share: probe selection is map-side
    * (sort the broadcast centroid array, slice, explode), and only the
    * probed buckets are scanned.
    */
  private def probeScored(queries: DataFrame, centroids: DataFrame,
                          assigned: DataFrame, nProbes: Int): DataFrame = {
    val q = queries
      .select(col("id").as("query_id"), VectorOps.toDoubleArray(col("vec")).as("qv"))
      .withColumn("q_norm_sq", VectorOps.normSq(col("qv")))
    val probes = q
      .join(broadcast(centArray(centroids)), lit(true))
      .withColumn("__probe", explode(slice(
        array_sort(scoredCents(col("qv"), col("q_norm_sq")), bySimDescIdAsc),
        1, nProbes)))
      .select(col("query_id"), col("__probe")("centroid_id").as("centroid_id"),
        col("qv"), col("q_norm_sq"))

    // scan only the probed buckets
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", VectorOps.cosineWithNorms(
        col("qv"), col("cv"), col("q_norm_sq"), col("c_norm_sq")))
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  private def probeIndex(queries: DataFrame, centroids: DataFrame,
                         assigned: DataFrame, k: Int, nProbes: Int): DataFrame =
    Ranking.topPerGroup(probeScored(queries, centroids, assigned, nProbes),
        Seq(col("query_id")), Seq(col("sim").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("sim"))
      .orderBy(col("query_id"), col("sim").desc, col("cand_id"))

  /** [[hardNegatives]] over a persisted IVF index — the scale path:
    * only the probed buckets are scanned, and the label constraint is
    * applied to the FULL scored candidate set BEFORE ranking (not as a
    * post-filter on an already-truncated top-k, which could starve a
    * query whose nearest neighbors share its label). Labels ride a
    * separate (id, label) relation joined on cand_id — an equality
    * join against the pruned pair stream; a deployment that mines
    * negatives every day would bake the label column into the index
    * assignment instead and skip the join.
    *
    * With nProbes = nCentroids the bucket scan is exhaustive and the
    * output is EXACTLY [[hardNegatives]] (spec-proven, and how the
    * oracle checks it); at lower probe counts recall follows the
    * RecallProbe dial like every other index consumer.
    */
  def hardNegativesIndexed(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, candLabels: DataFrame, k: Int,
      nProbes: Int = 4, asOf: Option[Long] = None): DataFrame = {
    val (centroids, assigned) = readIndexPair(spark, indexDir, asOf)
    val scored = probeScored(queries.select(col("id"), col("vec")),
      centroids, assigned, nProbes)
    val qLab = queries.select(col("id").as("query_id"), col("label").as("q_label"))
    val cLab = candLabels.select(col("id").as("cand_id"), col("label").as("cand_label"))
    scored
      .join(broadcast(qLab), Seq("query_id"))
      .join(cLab, Seq("cand_id"))
      .filter(col("cand_label") =!= col("q_label"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cand_label"), col("sim"))
  }

  /** Build the IVF index ONCE and persist it as two
    * [[graft.sources.Versioned]] tables under `indexDir`
    * (`centroids/`, `assignment/`): a real 100 TB deployment builds the
    * index in one batch job and probes it many times — recomputing
    * seeds, Lloyd passes, and the full corpus assignment per query
    * batch (the inline [[ivfTopK]] shape) would rescan the corpus every
    * time. Both tables commit atomically-enough for this engine's
    * single-writer builds: one `overwrite` version each per build, so
    * version N of `centroids/` pairs with version N of `assignment/` —
    * and time travel (`asOf`) reproduces any historical index exactly.
    * Returns the committed version.
    */
  /** Commit an index assignment table in the chosen physical layout:
    * "bucket" (default) co-locates by centroid — per-centroid work and
    * shuffle-fallback probe joins run Exchange-free on the corpus-sized
    * side; "partition" lays each centroid in its own directory — a
    * probe join against a storage-backed query batch DYNAMICALLY
    * prunes to the probed centroids' directories (Spark DPP), so a
    * probe reads ~nProbes/nCentroids of the assignment BYTES, the
    * byte-level lever bucketing cannot give a data-dependent join.
    */
  private def commitAssignment(assigned: DataFrame, table: String,
                               layout: String, nBuckets: Int): Long =
    layout match {
      case "bucket" => graft.sources.Versioned.overwriteBucketed(
        assigned, table, "centroid_id", nBuckets)
      case "partition" => graft.sources.Versioned.overwritePartitioned(
        assigned, table, "centroid_id")
      case other => throw new IllegalArgumentException(
        s"assignment layout must be bucket or partition, got $other")
    }

  /** Append to an assignment table honoring its DECLARED layout: a
    * partitioned table's batches must land partitioned (plain appends
    * are refused by [[graft.sources.Versioned]]); bucketed/plain tables
    * append plain and compact later.
    */
  private def appendAssignment(rows: DataFrame, table: String): Long = {
    val spark = rows.sparkSession
    if (graft.sources.Versioned.declaredLayout(spark, table)
        .startsWith("part:"))
      graft.sources.Versioned.appendPartitioned(rows, table, "centroid_id")
    else graft.sources.Versioned.append(rows, table)
  }

  def buildIvfIndex(candidates: DataFrame, indexDir: String,
                    nCentroids: Int = 16, lloydIters: Int = 0,
                    nBuckets: Int = 8,
                    assignmentLayout: String = "bucket",
                    metaCols: Seq[String] = Nil): Long = {
    val c = prepCandidates(candidates)
    val (centroids, assigned0) = centroidsAndAssignment(c, nCentroids, lloydIters)
    // metadata gates ride the assignment rows ([[withMeta]]): one build-
    // cadence join so [[queryIvfIndexFiltered]] probes pay neither a
    // join nor a distance eval for gated candidates
    val assigned = withMeta(assigned0, candidates, metaCols)
    val vc = graft.sources.Versioned.overwrite(centroids, s"$indexDir/centroids")
    val va = commitAssignment(assigned, s"$indexDir/assignment",
      assignmentLayout, nBuckets)
    require(vc == va, s"index tables diverged: centroids v$vc vs assignment v$va " +
      s"(was $indexDir written by something other than buildIvfIndex?)")
    vc
  }

  /** Append a vector batch to a persisted IVF index WITHOUT rebuilding:
    * the new vectors are assigned to the EXISTING (frozen) centroids —
    * one map-side pass over the batch, no seed resample, no Lloyd
    * passes, no touch of the already-assigned corpus. This is standard
    * IVF maintenance (FAISS `add` does the same): centroids drift from
    * the corpus distribution as appends accumulate, and the operator
    * leaves rebuild cadence to the caller ([[buildIvfIndex]] again when
    * recall decays). The centroid table re-commits its unchanged rows
    * so both tables stay version-lockstep — `asOf = n` still snapshots
    * a coherent (centroids, assignment) pair after any append.
    * Returns the committed version.
    */
  def appendToIvfIndex(batch: DataFrame, indexDir: String): Long = {
    val spark = batch.sparkSession
    require(!new java.io.File(indexDir, "codebook").exists(),
      s"$indexDir is an IVF-PQ index (has codebook/) — use appendToIvfPqIndex; " +
        "a float-schema append would corrupt the code-row assignment table")
    require(graft.sources.Versioned.latestVersion(spark, s"$indexDir/centroids")
        == graft.sources.Versioned.latestVersion(spark, s"$indexDir/assignment"),
      s"$indexDir tables out of lockstep — a prior append crashed between " +
        "commits; run repairIvfIndex, then retry this append")
    val centroids = graft.sources.Versioned.read(spark, s"$indexDir/centroids")
    // an SQ8 index carries the quantization scale on its centroid rows;
    // its assignment stores codes, so the appended rows must be
    // quantized on the SAME stored scale (a float-schema append would
    // silently replace the table schema and corrupt every probe)
    val isSq8 = centroids.columns.contains("s")
    val c = prepCandidates(batch)
    // dim guard (in-plan, the pqGuard discipline): an append whose
    // vectors' length differs from the build's would land wrong-length
    // vectors in the assignment table and silently corrupt every
    // subsequent cosine probe. The reference length is DERIVED from the
    // index itself (the stored centroid vectors), never the caller, and
    // the guard rides the CENTROIDS re-commit — the append's FIRST
    // write job — so a tripped guard fails before anything commits: a
    // refused append is a no-op, not a repairable wedge. (Cost: the
    // batch is scanned once inside the centroids job — maintenance-
    // cadence work, not a probe-path tax.)
    val sz = (co: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.size(co)
    val badDims = c
      .crossJoin(broadcast(centroids
        .agg(org.apache.spark.sql.functions.max(sz(col("centv")))
          .as("__dim"))))
      .filter(sz(col("cv")) =!= col("__dim"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__bad"))
    val guardedCentroids = centroids.crossJoin(broadcast(badDims))
      .filter(org.apache.spark.sql.functions.assert_true(
        col("__bad") === 0L,
        lit(s"IVF append dim mismatch on $indexDir: the batch carries " +
          "vectors whose length differs from the index's stored centroid " +
          "dim — re-embed the batch with the build's encoder/dim; " +
          "nothing was committed")).isNull)
      .drop("__bad")
    val assignedNew = {
      val a = assignTo(c,
        centroids.select(col("centroid_id"), col("centv"), col("cent_norm_sq")))
      if (!isSq8) a
      else a.select(col("centroid_id"), col("cand_id"))
        .join(sq8Apply(c.select(col("cand_id"), col("cv").as("v")),
          centroids.select(col("s")).limit(1)), Seq("cand_id"))
        .select(col("centroid_id"), col("cand_id"), col("q").as("cq"))
    }
    // a metadata-carrying index keeps its filtered-probe contract
    // through appends: the batch must supply the SAME baked columns
    // (rows without them would silently pass every gate)
    val meta = assignmentMetaCols(
      graft.sources.Versioned.read(spark, s"$indexDir/assignment"))
    val metaMissing = meta.filterNot(batch.columns.contains)
    require(metaMissing.isEmpty,
      s"$indexDir assignment carries metadata column(s) " +
        s"${meta.mkString(", ")} (filtered-probe gates); the append batch " +
        s"must supply them — missing: ${metaMissing.mkString(", ")}")
    val assignedNewM = withMeta(assignedNew, batch, meta)
    val vc = graft.sources.Versioned.overwrite(guardedCentroids,
      s"$indexDir/centroids")
    val va = appendAssignment(assignedNewM, s"$indexDir/assignment")
    require(vc == va, s"index tables diverged: centroids v$vc vs assignment v$va")
    // gatecounts sidecar (if present): fold the batch in additively —
    // a crash before this lands leaves it stale, which probes detect
    // (fall back to adaptive) and compact/rebuild re-derive
    maintainGateCountsAfterAppend(spark, indexDir, assignedNewM,
      vaPrev = va - 1, vaNew = va)
    vc
  }

  /** Repair an IVF / IVF-SQ8 / IVF-PQ index wedged by a crash between
    * an APPEND's table commits (the [[graft.operators.Retrieval
    * .repairBm25Index]] discipline applied to the ANN family). An
    * append re-commits the frozen centroids (and codebook) with
    * IDENTICAL content before appending the assignment, so the crash
    * shape is "centroids/codebook ahead by one, content unchanged,
    * assignment behind" — and because the batch's assignment rows died
    * with the crashed process, the repair is a catch-up: empty-append
    * the assignment back into lockstep, leaving the index exactly at
    * its pre-append state. The caller then re-appends the batch whole
    * (nothing of it committed — unlike BM25, where postings land first
    * and repair COMPLETES the append instead).
    *
    * Safety gate: the repair verifies the advanced tables' content is
    * IDENTICAL to their previous version (centroid/codebook tables are
    * nCentroids/m·ks rows — the comparison is trivial). A crashed
    * REBUILD leaves the same version shape but with CHANGED content,
    * and an empty-append "repair" there would silently pair new
    * centroids with the old corpus's assignment — that shape refuses
    * loudly; rebuild recovers. A missing/behind centroids table (build
    * crash) also refuses: the assignment IS the data, nothing to
    * recompute from. Returns the restored lockstep version; no-op when
    * intact.
    */
  def repairIvfIndex(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String): Long = {
    import graft.sources.Versioned
    require(Versioned.exists(spark, s"$indexDir/assignment"),
      s"$indexDir has no assignment table — a build crashed before its " +
        "data landed; rebuild the index")
    if (Versioned.exists(spark, s"$indexDir/vectors"))
      return repairPqVectorsIndex(spark, indexDir)
    val va = Versioned.latestVersion(spark, s"$indexDir/assignment")
    val heads = Seq("centroids", "codebook")
      .filter(t => Versioned.exists(spark, s"$indexDir/$t"))
      .map(t => t -> Versioned.latestVersion(spark, s"$indexDir/$t"))
    require(heads.nonEmpty, s"$indexDir has no centroids table — not a " +
      "persisted IVF index")
    if (heads.forall(_._2 == va)) return va // intact
    // the append commit order is centroids → codebook → assignment, so
    // a crash leaves a PREFIX of the heads advanced by exactly one
    // (centroids alone, or centroids + codebook) and the rest behind
    require(heads.forall(h => h._2 == va || h._2 == va + 1) &&
        heads.head._2 == va + 1,
      s"$indexDir tables are not in the crashed-append shape " +
        s"(assignment v$va, ${heads.map(h => s"${h._1} v${h._2}")
          .mkString(", ")}) — no append/build commit order produces " +
        "this; rebuild into a fresh directory")
    heads.filter(_._2 == va + 1).foreach { case (t, v) =>
      val now  = Versioned.read(spark, s"$indexDir/$t", Some(v))
      val prev = Versioned.read(spark, s"$indexDir/$t", Some(v - 1))
      require(now.exceptAll(prev).isEmpty && prev.exceptAll(now).isEmpty,
        s"$indexDir/$t v$v CHANGED content vs v${v - 1} — a crashed " +
          "REBUILD, not a crashed append: an empty-assignment catch-up " +
          "would pair new centroids with the old assignment; rebuild " +
          "into a fresh directory")
    }
    // catch-up: lagging heads re-commit their unchanged content (a
    // crash after the centroids alone left the codebook behind) and
    // the assignment gains an empty commit, honoring the declared
    // layout — the index lands exactly at its pre-append state and the
    // caller re-appends the whole batch
    heads.filter(_._2 == va).foreach { case (t, v) =>
      Versioned.overwrite(
        Versioned.read(spark, s"$indexDir/$t", Some(v)),
        s"$indexDir/$t"): Unit
    }
    val empty = Versioned.read(spark, s"$indexDir/assignment", Some(va))
      .limit(0)
    appendAssignment(empty, s"$indexDir/assignment")
  }

  /** [[repairIvfIndex]] for the IVF-PQ-with-vectors format (four
    * lockstep tables, full-precision vectors committed FIRST). Because
    * the raw data lands before anything derived, a crashed APPEND is
    * COMPLETED from the orphan vectors slice — the
    * [[graft.operators.Retrieval.repairBm25Index]] postings-first
    * discipline, where the three-table format could only catch up to
    * the pre-append state (codes are lossy; the batch died with the
    * crash). Encode parameters (m, sub, residual) derive from the
    * persisted codebook itself, so the repair needs no caller-supplied
    * knobs. A crashed COMPACTION (vectors overwritten with identical
    * (cand_id, cv) content — vec_part is re-derivable layout metadata)
    * heals with content-identical catch-up commits; a crashed REBUILD
    * (changed content) refuses loudly. Also re-stamps a stale
    * vec_parts sidecar once lockstep holds.
    */
  private def repairPqVectorsIndex(spark: org.apache.spark.sql.SparkSession,
                                   indexDir: String): Long = {
    import graft.sources.Versioned
    require(Versioned.exists(spark, s"$indexDir/centroids") &&
        Versioned.exists(spark, s"$indexDir/codebook"),
      s"$indexDir has a vectors table but no centroids/codebook — a " +
        "build crashed before its index tables landed; rebuild with " +
        "buildIvfPqIndex")
    val va = Versioned.latestVersion(spark, s"$indexDir/assignment")
    val vv = Versioned.latestVersion(spark, s"$indexDir/vectors")
    val heads = Seq("centroids", "codebook")
      .map(t => t -> Versioned.latestVersion(spark, s"$indexDir/$t"))
    if (vv == va && heads.forall(_._2 == va)) {
      // intact lockstep — but a crashed compaction may still have died
      // between the vectors overwrite and the sidecar re-stamp
      restampVecParts(spark, indexDir)
      return va
    }
    // commit order (append and compaction alike): vectors → centroids →
    // codebook → assignment, so the only crash shape is vectors ahead
    // by exactly one, a PREFIX of the heads advanced, assignment behind
    require(vv == va + 1 &&
        heads.forall(h => h._2 == va || h._2 == va + 1) &&
        heads.head._2 >= heads.last._2,
      s"$indexDir tables are not in a crashed-commit shape (vectors " +
        s"v$vv, ${heads.map(h => s"${h._1} v${h._2}").mkString(", ")}, " +
        s"assignment v$va) — no commit order here produces this; " +
        "rebuild into a fresh directory")
    // advanced heads must be content-identical to their prior version
    // (a crashed REBUILD advances them with CHANGED content — an
    // automated repair would pair new centroids with the old
    // assignment; refuse)
    heads.filter(_._2 == va + 1).foreach { case (t, v) =>
      val now  = Versioned.read(spark, s"$indexDir/$t", Some(v))
      val prev = Versioned.read(spark, s"$indexDir/$t", Some(v - 1))
      require(now.exceptAll(prev).isEmpty && prev.exceptAll(now).isEmpty,
        s"$indexDir/$t v$v CHANGED content vs v${v - 1} — a crashed " +
          "REBUILD, not a crashed append/compaction; rebuild into a " +
          "fresh directory")
    }
    val headAction = Versioned.history(spark, s"$indexDir/vectors").last._2
    if (headAction == "overwrite") {
      // a COMPACTION died mid-way: verify the vectors overwrite added
      // nothing and removed at most TOMBSTONED rows (a pure rewrite, or
      // a tombstone merge — [[compactIvfIndex]] drops pending deletes),
      // then catch the lagging tables up. Anything else is a crashed
      // REBUILD and refuses.
      val now  = Versioned.read(spark, s"$indexDir/vectors", Some(vv))
        .select(col("cand_id"), col("cv"))
      val prev = Versioned.read(spark, s"$indexDir/vectors", Some(vv - 1))
        .select(col("cand_id"), col("cv"))
      require(now.exceptAll(prev).isEmpty,
        s"$indexDir/vectors v$vv ADDED content vs v${vv - 1} — a " +
          "crashed REBUILD, not a crashed compaction; rebuild into a " +
          "fresh directory")
      val gone = prev.exceptAll(now).select(col("cand_id")).distinct()
      val goneUntombed = Tombstones.of(spark, indexDir) match {
        case None => gone
        case Some(t) => gone.join(
          broadcast(t.select(col("doc_id").as("__ts_doc"))),
          Retrieval.docKeyExpr(spark, indexDir, col("cand_id"))
            === col("__ts_doc"), "left_anti")
      }
      require(goneUntombed.isEmpty,
        s"$indexDir/vectors v$vv REMOVED non-tombstoned rows vs " +
          s"v${vv - 1} — a crashed REBUILD, not a crashed compaction or " +
          "tombstone merge; rebuild into a fresh directory")
      val wasDrop = !gone.isEmpty
      heads.filter(_._2 == va).foreach { case (t, v) =>
        Versioned.overwrite(
          Versioned.read(spark, s"$indexDir/$t", Some(v)),
          s"$indexDir/$t"): Unit
      }
      // complete the merge on the assignment: a crashed tombstone drop
      // re-applies the CURRENT tombstone set (a superset of the crashed
      // run's is safe — gates already hide those rows everywhere, and
      // the vectors rows they orphan drop at the next compaction); a
      // pure compaction catches up with an empty append as before
      val out =
        if (!wasDrop) appendAssignment(
          Versioned.read(spark, s"$indexDir/assignment", Some(va)).limit(0),
          s"$indexDir/assignment")
        else Versioned.overwriteLike(
          Tombstones.gate(spark, indexDir,
            Versioned.read(spark, s"$indexDir/assignment", Some(va)),
            Retrieval.docKeyExpr(spark, indexDir, col("cand_id"))),
          s"$indexDir/assignment")
      restampVecParts(spark, indexDir)
      return out
    }
    // a crashed APPEND: the orphan full-precision slice IS the batch —
    // COMPLETE the append by re-encoding it on the frozen centroids +
    // codebook (new-id-only append invariant makes cand_id membership
    // the delta)
    // the orphan slice carries the baked metadata too (the build/append
    // write it onto the vectors table precisely so this repair can
    // restore a meta-carrying assignment row set)
    val metaR = assignmentMetaCols(
      Versioned.read(spark, s"$indexDir/assignment", Some(va)))
    val orphan = Versioned.read(spark, s"$indexDir/vectors", Some(vv))
      .select((col("cand_id") +: col("cv") +: metaR.map(col)): _*)
      .join(Versioned.read(spark, s"$indexDir/vectors", Some(va))
        .select(col("cand_id")), Seq("cand_id"), "left_anti")
    val cb = Versioned.read(spark, s"$indexDir/codebook")
    val spec = cb.agg(
      (org.apache.spark.sql.functions.max(col("j")) + 1).cast("int"),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.size(col("cb"))).cast("int")).head
    val m = spec.getInt(0)
    val sub = spec.getInt(1)
    val residual = cb.columns.contains("res") &&
      cb.select(col("res")).head.getBoolean(0)
    val centroids = Versioned.read(spark, s"$indexDir/centroids")
    val c = orphan.withColumn("c_norm_sq", VectorOps.normSq(col("cv")))
    val assignedB = assignTo(c, centroids
      .select(col("centroid_id"), col("centv"), col("cent_norm_sq")))
    val encBase = if (residual) residualsOf(assignedB, centroids) else c
    val delta0 = assignedB.select(col("centroid_id"), col("cand_id"))
      .join(withPqCodes(encBase, cb, m, sub)
        .select(col("cand_id"), col("pqcode")), Seq("cand_id"))
      .select(col("centroid_id"), col("cand_id"), col("pqcode"))
    val delta =
      if (metaR.isEmpty) delta0
      else delta0.join(
        orphan.select((col("cand_id") +: metaR.map(col)): _*), Seq("cand_id"))
    heads.filter(_._2 == va).foreach { case (t, v) =>
      Versioned.overwrite(
        Versioned.read(spark, s"$indexDir/$t", Some(v)),
        s"$indexDir/$t"): Unit
    }
    appendAssignment(delta, s"$indexDir/assignment")
  }

  private def restampVecParts(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String): Unit =
    Retrieval.restampModSidecar(spark, indexDir, "vec_parts", "vectors",
      "cand_id", "vec_part", n => Some(autoVecShards(n)))

  /** Compact a persisted IVF / IVF-SQ8 / IVF-PQ index after appends:
    * re-establishes the assignment table's bucketed-by-centroid layout
    * (appended batches land as plain files, demoting reads until the
    * rewrite) and keeps EVERY table of the index in version lockstep —
    * compacting just one would make all consumers refuse. Same crash
    * contract as build/append: a failure between table commits wedges
    * the index and a rebuild recovers.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String): Long = {
    val tables = Seq("centroids", "codebook", "assignment")
      .filter(t => graft.sources.Versioned.exists(spark, s"$indexDir/$t"))
    require(tables.contains("assignment"),
      s"$indexDir is not a persisted IVF index (no assignment/ table)")
    val docX = Retrieval.docKeyExpr(spark, indexDir, col("cand_id"))
    val hasTomb = Tombstones.of(spark, indexDir).nonEmpty
    // the vectors table compacts FIRST (mirroring the append order, so
    // a mid-way crash leaves the repairable vectors-ahead shape) and
    // RE-DERIVES its shard modulus from the grown corpus: a compaction
    // rewrites the snapshot anyway, so the re-shard is free — probed
    // shard bytes stay flat as appends accumulate instead of growing
    // with the corpus. Pending deletes ([[Tombstones]]) drop here too —
    // this is the index family's merge step; centroids/codebook are
    // corpus-level models, untouched until the rebuild cadence.
    val vVec =
      if (!graft.sources.Versioned.exists(spark, s"$indexDir/vectors"))
        Seq.empty[Long]
      else {
        // every column except the re-derived vec_part survives the
        // rewrite: baked metadata rides the vectors table precisely so
        // the crashed-append repair and post-compaction appends can
        // restore/extend a meta-carrying assignment (a bare
        // (cand_id, cv) projection here would silently strip it)
        val all = graft.sources.Versioned.read(spark, s"$indexDir/vectors")
        val cur = Tombstones.gate(spark, indexDir,
          all.select(all.columns.filterNot(_ == "vec_part").map(col): _*),
          docX)
        val n = autoVecShards(cur.count())
        val v = graft.sources.Versioned.overwritePartitioned(
          cur.withColumn("vec_part", pmod(col("cand_id"), lit(n.toLong))),
          s"$indexDir/vectors", "vec_part")
        Retrieval.writeShardSidecar(spark, indexDir, "vec_parts", n, v)
        Seq(v)
      }
    val names = (if (vVec.nonEmpty) Seq("vectors") else Nil) ++ tables
    val vs = vVec ++ tables.map {
      case "assignment" if hasTomb =>
        graft.sources.Versioned.overwriteLike(
          Tombstones.gate(spark, indexDir,
            graft.sources.Versioned.read(spark, s"$indexDir/assignment"),
            docX),
          s"$indexDir/assignment")
      case t => graft.sources.Versioned.compact(spark, s"$indexDir/$t")
    }
    require(vs.distinct.size == 1, s"index compaction left tables out of " +
      s"lockstep (${names.zip(vs).map { case (t, v) => s"$t v$v" }
        .mkString(", ")}) — run repairIvfIndex")
    // the merge is where tombstoned rows leave the data — re-derive the
    // gatecounts sidecar so one-shot probes stay byte-tight (and heal
    // any staleness a crashed append left)
    refreshGateCountsIfPresent(spark, indexDir)
    vs.head
  }

  // ------------------------------------------------- retrain-cadence rebuild

  /** REBUILD a float IVF index's centroids from its CURRENT corpus —
    * the retrain-cadence maintenance FAISS-add semantics defer to the
    * caller: centroids freeze at build, appended batches assign to them,
    * and recall decays as the corpus drifts from the training
    * distribution; nothing turned that dial until this stage. The
    * corpus is the index's OWN assignment rows (float assignments carry
    * full-precision cv), so no external table is consulted — the
    * [[graft.operators.Bpe]] retrain discipline: a fresh lockstep
    * overwrite version; pinned `asOf` consumers keep their epoch (the
    * per-epoch sidecar history), and pending tombstones drop here too
    * (a rebuild is the strongest merge).
    *
    * Crash safety: a prior rebuild that died between its two overwrites
    * leaves versions skewed; this pads the lagging table with
    * content-identical commits until both sit one below a common
    * target, then rebuilds — the pad versions are gap versions that
    * never existed as consistent pairs (the [[graft.operators.Retrieval
    * .repairBm25Index]] catch-up precedent: pin at or before the gap,
    * or at the rebuilt head). SQ8 indexes refuse (codes only — the
    * original vectors are gone); IVF-PQ uses [[rebuildIvfPqIndex]].
    */
  def rebuildIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, lloydIters: Int = 0): Long = {
    import graft.sources.Versioned
    val ts = Seq("centroids", "assignment")
    require(ts.forall(t => Versioned.exists(spark, s"$indexDir/$t")),
      s"$indexDir is not a persisted IVF index (centroids/ + assignment/)")
    require(!Versioned.exists(spark, s"$indexDir/codebook"),
      s"$indexDir is an IVF-PQ index — use rebuildIvfPqIndex")
    val vLock = ts.map(t => Versioned.latestVersion(spark, s"$indexDir/$t")).min
    val cents = Versioned.read(spark, s"$indexDir/centroids", Some(vLock))
    require(!cents.columns.contains("s"),
      s"$indexDir is an SQ8 index — its assignment stores codes, not " +
        "vectors; rebuild from the original corpus with buildIvfSq8Index")
    val rows = Tombstones.gate(spark, indexDir,
      Versioned.read(spark, s"$indexDir/assignment", Some(vLock)),
      Retrieval.docKeyExpr(spark, indexDir, col("cand_id")))
    val meta = assignmentMetaCols(rows)
    val nCent = cents.count().toInt // nCentroids rows — bounded
    val cand = rows.select((col("cand_id").as("id") +:
      col("cv").as("vec") +: meta.map(col)): _*)
    val (layoutName, nBuckets) = assignLayoutOf(spark, indexDir)
    val target = padToLockstepTarget(spark, indexDir, ts)
    val v = buildIvfIndex(cand, indexDir, nCent, lloydIters, nBuckets,
      layoutName, meta)
    require(v == target, s"$indexDir rebuild landed at v$v, expected " +
      s"v$target — a concurrent writer interleaved; verify lockstep")
    refreshGateCountsIfPresent(spark, indexDir)
    v
  }

  /** [[rebuildIvfIndex]] for the four-table IVF-PQ format: centroids
    * AND codebook retrain from the index's own full-precision `vectors`
    * table; every encode parameter (m, ks, dim, residual) derives from
    * the persisted codebook itself, so the rebuild needs no
    * caller-supplied knobs and cannot drift from the build's contract.
    */
  def rebuildIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, pqLloydIters: Int = 0,
                        lloydIters: Int = 0): Long = {
    import graft.sources.Versioned
    val ts = Seq("vectors", "centroids", "codebook", "assignment")
    require(ts.forall(t => Versioned.exists(spark, s"$indexDir/$t")),
      s"$indexDir is not a four-table IVF-PQ index " +
        "(vectors/ centroids/ codebook/ assignment/)")
    val vLock = ts.map(t => Versioned.latestVersion(spark, s"$indexDir/$t")).min
    val cb = Versioned.read(spark, s"$indexDir/codebook", Some(vLock))
    val spec = cb.agg(
      (org.apache.spark.sql.functions.max(col("j")) + 1).cast("int"),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.size(col("cb"))).cast("int"),
      count(lit(1))).head
    val m = spec.getInt(0)
    val sub = spec.getInt(1)
    val ks = (spec.getLong(2) / m).toInt
    val residual = cb.columns.contains("res") &&
      cb.select(col("res")).head.getBoolean(0)
    val nCent = Versioned.read(spark, s"$indexDir/centroids", Some(vLock))
      .count().toInt
    val meta = assignmentMetaCols(
      Versioned.read(spark, s"$indexDir/assignment", Some(vLock)))
    val vecs = Tombstones.gate(spark, indexDir,
      Versioned.read(spark, s"$indexDir/vectors", Some(vLock)),
      Retrieval.docKeyExpr(spark, indexDir, col("cand_id")))
    val cand = vecs.select((col("cand_id").as("id") +:
      col("cv").as("vec") +: meta.map(col)): _*)
    val (layoutName, nBuckets) = assignLayoutOf(spark, indexDir)
    val target = padToLockstepTarget(spark, indexDir, ts)
    val v = buildIvfPqIndex(cand, indexDir, nCent, m, ks, pqLloydIters,
      lloydIters, m * sub, residual, nBuckets, layoutName, metaCols = meta)
    require(v == target, s"$indexDir rebuild landed at v$v, expected " +
      s"v$target — a concurrent writer interleaved; verify lockstep")
    v
  }

  /** The assignment table's declared physical layout, as
    * (buildIvfIndex's layout name, nBuckets). */
  private def assignLayoutOf(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String): (String, Int) =
    graft.sources.Versioned.declaredLayout(spark, s"$indexDir/assignment") match {
      case l if l.startsWith("bucket:") => ("bucket", l.split(":")(2).toInt)
      case l if l.startsWith("part:") => ("partition", 8)
      case _ => ("bucket", 8)
    }

  /** Pad each table with content-identical commits until all sit one
    * below a common target version, so a multi-table build's overwrites
    * land in lockstep even after a crashed prior rebuild skewed them.
    * Pad versions are documented gap versions (never consistent pairs).
    */
  private def padToLockstepTarget(spark: org.apache.spark.sql.SparkSession,
                                  indexDir: String,
                                  tables: Seq[String]): Long = {
    import graft.sources.Versioned
    val target = tables
      .map(t => Versioned.latestVersion(spark, s"$indexDir/$t")).max + 1
    tables.foreach { t =>
      val tab = s"$indexDir/$t"
      while (Versioned.latestVersion(spark, tab) < target - 1)
        Versioned.overwriteLike(Versioned.read(spark, tab), tab): Unit
    }
    target
  }

  /** Probe a persisted IVF index: identical output to the [[ivfTopK]]
    * call whose corpus/params built it, but the only work per query
    * batch is probe selection + the bucket-equality scan — no seed
    * sample, no Lloyd passes, no corpus assignment. `asOf` time-travels
    * to a historical index version (both tables pin the same version).
    */
  /** Read the (centroids, assignment) pair of a persisted index.
    * Latest-version reads REFUSE an out-of-lockstep pair (a build or
    * append that crashed between its two commits): probing new
    * centroids against a stale assignment silently drops vectors. The
    * index is a derived artifact — repair is a rebuild; pinned `asOf`
    * reads of intact historical versions keep working.
    */
  private def readIndexPair(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, asOf: Option[Long]): (DataFrame, DataFrame) = {
    if (asOf.isEmpty) {
      val vc = graft.sources.Versioned.latestVersion(spark, s"$indexDir/centroids")
      val va = graft.sources.Versioned.latestVersion(spark, s"$indexDir/assignment")
      require(vc == va, s"index tables out of lockstep (centroids v$vc, " +
        s"assignment v$va) — a build/append crashed between commits; " +
        "run repairIvfIndex, or pin an intact version with asOf")
    }
    // document deletion ([[Tombstones]]): pending deletes gate the
    // candidate rows BEFORE scoring/ranking (survivors fill k — no
    // starvation); the physical drop happens at [[compactIvfIndex]].
    // Gates read the LATEST tombstones even under asOf — takedown is
    // retroactive. Chunk-grain indexes (composite ck keys) gate on the
    // decoded doc id.
    (graft.sources.Versioned.read(spark, s"$indexDir/centroids", asOf),
     Tombstones.gate(spark, indexDir,
       graft.sources.Versioned.read(spark, s"$indexDir/assignment", asOf),
       Retrieval.docKeyExpr(spark, indexDir, col("cand_id"))))
  }

  def queryIvfIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: DataFrame, k: Int, nProbes: Int = 4,
                    asOf: Option[Long] = None): DataFrame = {
    val (centroids, assigned) = readIndexPair(spark, indexDir, asOf)
    probeIndex(queries, centroids, assigned, k, nProbes)
  }

  /** Predicate-FILTERED IVF probe — filtered vector search, the
    * metadata-gate + ANN composition every RAG deployment hits
    * (language / date / license gates on candidates). The predicate
    * applies to the FULL probed-candidate stream BEFORE scoring and
    * ranking — the [[hardNegativesIndexed]] lesson: a post-filter on an
    * already-truncated top-k starves a query whose nearest neighbors
    * are gated — and it rides the probed-bucket SCAN itself: the gate
    * columns were baked into the assignment rows at build
    * ([[buildIvfIndex]] `metaCols`), so gated candidates die at the
    * scan (simple comparisons push into parquet) without paying a join
    * OR a distance evaluation. A predicate naming a column the index
    * does not carry REFUSES loudly ([[requirePredicateCols]]); the
    * fallback for un-baked gates is the separate (id, label) relation
    * joined post-probe, [[hardNegativesIndexed]]'s shape, at the cost
    * of a corpus-keyed join per serve batch.
    *
    * With nProbes = nCentroids the output is EXACTLY the brute-force
    * top-k over the filtered corpus (spec-proven); at lower probe
    * counts recall follows the probe dial measured against that
    * filtered brute force — NOT against unfiltered brute force, whose
    * gated neighbors no probe count could return.
    */
  def queryIvfIndexFiltered(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, queries: DataFrame, k: Int,
                            predicate: Column, nProbes: Int = 4,
                            asOf: Option[Long] = None): DataFrame = {
    val (centroids, assigned) = readIndexPair(spark, indexDir, asOf)
    requirePredicateCols(indexDir, assigned, predicate)
    probeIndex(queries, centroids, assigned.filter(predicate), k, nProbes)
  }

  /** [[queryIvfIndexFiltered]] with ADAPTIVE probe widening — the
    * filtered-ANN starvation fix (the problem ACORN and FAISS's
    * selectivity-aware probing address): a highly selective gate (a
    * rare language, a narrow date) can leave fewer than k eligible
    * candidates inside the probed buckets while eligible vectors sit in
    * UNprobed ones — the fixed-probe result underfills k at full
    * correctness but poor recall. When any query underfills, the probe
    * count DOUBLES and the probe re-runs, until every query fills k or
    * the scan is exhaustive (nProbes = nCentroids, where the result is
    * EXACTLY the filtered brute force). Escalation cost is geometric:
    * the final round dominates, total probed bytes ≤ 2× the bytes the
    * right probe count would have paid, and a query batch that fills k
    * at the starting width pays exactly [[queryIvfIndexFiltered]]'s
    * plan plus one |Q|-row underfill check. The check is a bounded
    * control read (|Q| rows), the documented Scheduler-style exception.
    */
  def queryIvfIndexFilteredAdaptive(spark: org.apache.spark.sql.SparkSession,
                                    indexDir: String, queries: DataFrame,
                                    k: Int, predicate: Column,
                                    nProbes: Int = 4,
                                    asOf: Option[Long] = None): DataFrame = {
    val (centroids, assigned) = readIndexPair(spark, indexDir, asOf)
    requirePredicateCols(indexDir, assigned, predicate)
    val gated = assigned.filter(predicate)
    val nCent = centroids.count().toInt // nCentroids rows — bounded
    adaptiveWiden(queries, k, math.max(1, nProbes), nCent,
      p => probeIndex(queries, centroids, gated, k, p))
  }

  // --------------------------------------------- gate-count sidecar
  //
  // The one-shot alternative to [[adaptiveWiden]]'s geometric re-scan
  // for CATEGORICAL gates (the ACORN-style selectivity statistic): a
  // per-(gate column, value, centroid) eligible-candidate count table
  // beside the index, consulted at probe time to pick each query's
  // probe width in ONE round — the widening loop's re-scans (bounded
  // ≤2× final-round bytes, plus one driver round-trip per doubling)
  // collapse to the final round alone.

  /** Derive and commit the `gatecounts` sidecar table from the CURRENT
    * assignment: (gate_col, gate_val, centroid_id, n) per categorical
    * gate value, tombstone-gated so the counts reflect what a probe
    * can actually return, stamped with the assignment version they
    * describe (`src_v` — the staleness check readers apply). Called at
    * build cadence by the operator owner; [[appendToIvfIndex]] merges
    * batches additively, [[compactIvfIndex]]/[[rebuildIvfIndex]]
    * re-derive. Counts are (nCentroids × gate cardinality) rows —
    * broadcast-sized by the categorical-gate contract.
    */
  def refreshGateCounts(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, gateCols: Seq[String]): Long = {
    require(gateCols.nonEmpty, "at least one gate column")
    val va = graft.sources.Versioned.latestVersion(spark,
      s"$indexDir/assignment")
    val asg = Tombstones.gate(spark, indexDir,
      graft.sources.Versioned.read(spark, s"$indexDir/assignment"),
      Retrieval.docKeyExpr(spark, indexDir, col("cand_id")))
    val meta = assignmentMetaCols(asg)
    val missing = gateCols.filterNot(meta.contains)
    require(missing.isEmpty, s"$indexDir assignment does not carry " +
      s"gate column(s) ${missing.mkString(", ")} — bake them at build " +
      s"(metaCols); available: ${meta.mkString(", ")}")
    graft.sources.Versioned.overwrite(
      gateCountsOf(asg, gateCols).withColumn("src_v", lit(va)),
      s"$indexDir/gatecounts")
  }

  private def gateCountsOf(rows: DataFrame,
                           gateCols: Seq[String]): DataFrame =
    gateCols.map(g => rows
        .groupBy(col("centroid_id"), col(g).cast("string").as("gate_val"))
        .agg(count(lit(1)).as("n"))
        .select(lit(g).as("gate_col"), col("gate_val"),
          col("centroid_id"), col("n")))
      .reduce(_ unionByName _)

  /** Re-derive the gatecounts sidecar over the columns it already
    * tracks — the compact/rebuild-cadence heal (also repairs a sidecar
    * gone stale after a crashed append). No-op without a sidecar.
    */
  private def refreshGateCountsIfPresent(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Unit = {
    val t = s"$indexDir/gatecounts"
    if (!graft.sources.Versioned.exists(spark, t)) return
    val gcols = graft.sources.Versioned.read(spark, t)
      .select(col("gate_col")).distinct()
      .collect().map(_.getString(0)).toSeq // bounded: few gate columns
    if (gcols.nonEmpty) refreshGateCounts(spark, indexDir, gcols): Unit
  }

  /** Fold an appended batch's counts into a FRESH gatecounts sidecar
    * (src_v = the pre-append assignment version); a stale sidecar is
    * left stale — probes degrade to the adaptive path (correct,
    * slower) and the compact/rebuild cadence re-derives. Crash between
    * the assignment append and this overwrite = exactly that stale
    * shape. No-op when the index has no sidecar.
    */
  private def maintainGateCountsAfterAppend(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      batchAssigned: DataFrame, vaPrev: Long, vaNew: Long): Unit = {
    val t = s"$indexDir/gatecounts"
    if (!graft.sources.Versioned.exists(spark, t)) return
    val cur = graft.sources.Versioned.read(spark, t)
    // 1-row control read (bounded: the sidecar is broadcast-sized)
    val srcV = cur.select(max(col("src_v"))).head.getLong(0)
    if (srcV != vaPrev) return // stale — heal at compact/rebuild
    val gateCols = cur.select(col("gate_col")).distinct()
      .collect().map(_.getString(0)).toSeq // bounded: few gate columns
    val merged = cur.drop("src_v")
      .unionByName(gateCountsOf(batchAssigned, gateCols))
      .groupBy(col("gate_col"), col("gate_val"), col("centroid_id"))
      .agg(sum(col("n")).as("n"))
      .withColumn("src_v", lit(vaNew))
    graft.sources.Versioned.overwrite(merged, t): Unit
  }

  /** [[queryIvfIndexFiltered]] for a CATEGORICAL gate with the probe
    * width chosen in ONE shot from the gatecounts sidecar: each query
    * ranks the centroids as usual, then takes the shortest prefix
    * whose cumulative eligible count reaches k+1 (one row of headroom
    * for the self-match exclusion — a query that is itself an eligible
    * corpus member is counted but never scored) — per-query widths, no
    * widening loop, probed bytes ≈ the adaptive path's final round
    * alone. Guarantees: the gate applies to the full probed stream
    * before ranking (never a post-filter); a gate value the counts
    * never saw — or a total eligible count below k — degrades to the
    * exhaustive scan, which is EXACTLY the filtered brute force; a
    * STALE sidecar (appends since the last refresh, or a pinned asOf)
    * falls back to [[queryIvfIndexFilteredAdaptive]] — correctness
    * never rides the sidecar, only the byte bound does. Tombstones
    * added since the refresh can make counts overcount; the |Q|-row
    * underfill backstop re-routes exactly those batches to the
    * adaptive path.
    */
  def queryIvfIndexFilteredCounted(spark: org.apache.spark.sql.SparkSession,
                                   indexDir: String, queries: DataFrame,
                                   k: Int, gateCol: String, gateVal: Any,
                                   asOf: Option[Long] = None): DataFrame = {
    val predicate = col(gateCol) === lit(gateVal)
    def adaptive() = queryIvfIndexFilteredAdaptive(spark, indexDir,
      queries, k, predicate, asOf = asOf)
    val t = s"$indexDir/gatecounts"
    if (asOf.nonEmpty || !graft.sources.Versioned.exists(spark, t))
      return adaptive()
    val cur = graft.sources.Versioned.read(spark, t)
    val head = cur.select(max(col("src_v"))).head // 1-row control read
    val fresh = !head.isNullAt(0) && head.getLong(0) ==
      graft.sources.Versioned.latestVersion(spark, s"$indexDir/assignment")
    if (!fresh) return adaptive()
    val (centroids, assigned) = readIndexPair(spark, indexDir, None)
    requirePredicateCols(indexDir, assigned, predicate)
    val counts = cur
      .filter(col("gate_col") === gateCol &&
        col("gate_val") === lit(gateVal).cast("string"))
      .select(col("centroid_id"), col("n"))
    val r = probeIndexCounted(queries, centroids,
      assigned.filter(predicate), k, counts)
      .localCheckpoint(eager = false) // shares the underfill check
    val qids = queries.select(col("id").as("query_id")).distinct()
    val underfilled = !qids
      .join(r.groupBy(col("query_id")).agg(count(lit(1)).as("__n")),
        Seq("query_id"), "left")
      .filter(coalesce(col("__n"), lit(0L)) < k)
      .isEmpty
    // under-count only happens when tombstones landed after the last
    // refresh — route those (rare) batches through the widening loop;
    // but an EXHAUSTIVE one-shot (total eligible ≤ k ⇒ the k+1 target
    // was unreachable and the prefix took every centroid) is already
    // the filtered brute force and must return as-is, not re-probe
    val totalEligible = counts.agg(coalesce(sum(col("n")), lit(0L)))
      .head.getLong(0) // 1-row control read
    if (underfilled && totalEligible > k.toLong) adaptive() else r
  }

  /** The one-round counted probe: rank centroids per query, cut the
    * prefix at cumulative eligible count ≥ k (an ordered left fold over
    * the broadcast centroid array — the lambda binds everything it
    * dereferences), explode to per-query probe sets, scan, rank.
    */
  private def probeIndexCounted(queries: DataFrame, centroids: DataFrame,
                                gated: DataFrame, k: Int,
                                counts: DataFrame): DataFrame = {
    val centsN = centroids
      .join(counts, Seq("centroid_id"), "left")
      .select(col("centroid_id"), col("centv"), col("cent_norm_sq"),
        coalesce(col("n"), lit(0L)).as("n"))
      .agg(collect_list(struct(col("centroid_id"), col("centv"),
        col("cent_norm_sq"), col("n"))).as("cents"))
    val q = queries
      .select(col("id").as("query_id"),
        VectorOps.toDoubleArray(col("vec")).as("qv"))
      .withColumn("q_norm_sq", VectorOps.normSq(col("qv")))
    val scoredN = transform(col("cents"), ct => struct(
      coalesce(VectorOps.cosineWithNorms(col("qv"), ct("centv"),
        col("q_norm_sq"), ct("cent_norm_sq")),
        lit(Double.NegativeInfinity)).as("sim"),
      ct("centroid_id").as("centroid_id"),
      ct("n").as("n")))
    val emptyIds = typedLit(Seq.empty[Long])
    val probes = q
      .join(broadcast(centsN), lit(true))
      .withColumn("__probe_ids", aggregate(
        array_sort(scoredN, bySimDescIdAsc),
        struct(lit(0L).as("cum"), emptyIds.as("ids")),
        // target k+1, not k: a query that is itself an eligible corpus
        // member is counted by the sidecar but excluded from scoring
        // (cand_id <> query_id), so a bare-k prefix underfills by one
        // exactly when the query's own row sits in the probed buckets
        (acc, x) => when(acc("cum") >= k + 1, acc)
          .otherwise(struct((acc("cum") + x("n")).as("cum"),
            concat(acc("ids"), array(x("centroid_id"))).as("ids"))),
        acc => acc("ids")))
      .select(col("query_id"), explode(col("__probe_ids")).as("centroid_id"),
        col("qv"), col("q_norm_sq"))
    val scored = gated.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", VectorOps.cosineWithNorms(
        col("qv"), col("cv"), col("q_norm_sq"), col("c_norm_sq")))
      .select(col("query_id"), col("cand_id"), col("sim"))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("sim").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("sim"))
      .orderBy(col("query_id"), col("sim").desc, col("cand_id"))
  }

  /** [[queryIvfPqIndexFiltered]] with the same adaptive widening over
    * the compressed ADC scan; with escalation exhausted the output is
    * exactly the filtered [[pqTopK]]. */
  def queryIvfPqIndexFilteredAdaptive(spark: org.apache.spark.sql.SparkSession,
                                      indexDir: String, queries: DataFrame,
                                      k: Int, predicate: Column,
                                      nProbes: Int = 4,
                                      asOf: Option[Long] = None, m: Int = 8,
                                      ks: Int = 16, dim: Int = 64,
                                      residual: Boolean = false): DataFrame = {
    val nCent = graft.sources.Versioned
      .read(spark, s"$indexDir/centroids", asOf).count().toInt
    adaptiveWiden(queries, k, math.max(1, nProbes), nCent,
      p => queryIvfPqIndexWhere(spark, indexDir, queries, k, p, asOf, m, ks,
        dim, residual, Some(predicate)))
  }

  /** The escalation loop: run the probe at width p, return when every
    * query has k rows or the scan is exhaustive; else double. The
    * result stages through a lazy localCheckpoint so the underfill
    * check and the returned rows share one computation. Underfill
    * detection joins from the QUERY side (a query with ZERO eligible
    * probed candidates has no result group at all — a result-side
    * group-count would miss it and never escalate exactly where
    * escalation matters most).
    */
  private def adaptiveWiden(queries: DataFrame, k: Int, startProbes: Int,
                            nCent: Int,
                            probe: Int => DataFrame): DataFrame = {
    val qids = queries.select(col("id").as("query_id")).distinct()
    var p = math.min(startProbes, math.max(1, nCent))
    while (true) {
      val r = probe(p).localCheckpoint(eager = false)
      if (p >= nCent) return r
      val underfilled = !qids
        .join(r.groupBy(col("query_id")).agg(count(lit(1)).as("__n")),
          Seq("query_id"), "left")
        .filter(coalesce(col("__n"), lit(0L)) < k)
        .isEmpty
      if (!underfilled) return r
      p = math.min(nCent, p * 2)
    }
    sys.error("unreachable")
  }

  /** Build an IVF index whose buckets store SQ8 CODES instead of float
    * vectors — the two ANN scale levers combined: probes prune the scan
    * to nProbes/nCentroids of the corpus (IVF) and the pruned scan
    * streams byte-width integer codes (SQ8's 4–8× bandwidth cut), so a
    * probe moves ~nProbes/nCentroids ÷ 4 of the float-index bytes.
    * Centroids stay full-precision (probe selection quality is the
    * recall dial; their size is nCentroids rows — irrelevant), and each
    * centroid row carries the ONE global quantization scale (max |x|
    * over the corpus, the ranking-preserving shared scale q109 uses).
    * Assignment runs in full precision BEFORE quantization, so bucket
    * membership is identical to [[buildIvfIndex]]'s.
    */
  def buildIvfSq8Index(candidates: DataFrame, indexDir: String,
                       nCentroids: Int = 16, lloydIters: Int = 0,
                       nBuckets: Int = 8,
                       assignmentLayout: String = "bucket"): Long = {
    val c = prepCandidates(candidates)
    val (centroids, assigned) = centroidsAndAssignment(c, nCentroids, lloydIters)
    val scale = sq8Scale(c.select(col("cv").as("v")))
    val codes = sq8Apply(c.select(col("cand_id"), col("cv").as("v")), scale)
    val assignedQ = assigned.select(col("centroid_id"), col("cand_id"))
      .join(codes, Seq("cand_id"))
      .select(col("centroid_id"), col("cand_id"), col("q").as("cq"))
    val vc = graft.sources.Versioned.overwrite(
      centroids.crossJoin(broadcast(scale)), s"$indexDir/centroids")
    val va = commitAssignment(assignedQ, s"$indexDir/assignment",
      assignmentLayout, nBuckets)
    require(vc == va, s"index tables diverged: centroids v$vc vs assignment v$va")
    vc
  }

  /** Probe an SQ8 IVF index: probe selection in full precision against
    * the stored centroids, queries quantized on the STORED scale, and
    * the pruned bucket scan scored on the exact INTEGER code dot
    * ([[graft.plans.IntDotProductExpr]] — bit-identical in any engine).
    * Output (query_id, cand_id, qdot), ranked qdot DESC, id ASC.
    * With nProbes = nCentroids this degenerates to exactly
    * [[sq8TopK]]'s full quantized scan (spec-proven).
    */
  def queryIvfSq8Index(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                       queries: DataFrame, k: Int, nProbes: Int = 4,
                       asOf: Option[Long] = None): DataFrame = {
    val (cents, assigned) = readIndexPair(spark, indexDir, asOf)
    val scale = cents.select(col("s").as("s")).limit(1)

    val q = queries
      .select(col("id").as("query_id"), VectorOps.toDoubleArray(col("vec")).as("qv"))
      .withColumn("q_norm_sq", VectorOps.normSq(col("qv")))
    val probes = q
      .join(broadcast(centArray(
        cents.select(col("centroid_id"), col("centv"), col("cent_norm_sq")))), lit(true))
      .withColumn("__probe", explode(slice(
        array_sort(scoredCents(col("qv"), col("q_norm_sq")), bySimDescIdAsc),
        1, nProbes)))
      .select(col("query_id"), col("__probe")("centroid_id").as("centroid_id"))
    val qq = sq8Apply(q.select(col("query_id"), col("qv").as("v")), scale)
      .select(col("query_id"), col("q").as("qq"))
      .join(probes, Seq("query_id"))

    val scored = assigned.join(broadcast(qq), Seq("centroid_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("qdot", VectorOps.dotInt(col("qq"), col("cq")))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("qdot").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("qdot"))
      .orderBy(col("query_id"), col("qdot").desc, col("cand_id"))
  }

  /** Global quantization scale of a corpus: max |component| across
    * every vector — ONE broadcast scalar. The scale is deliberately
    * global, not per-dimension: a shared scale multiplies every code
    * dot by the same constant, so the quantized ranking tracks the
    * exact dot ranking up to rounding noise. A per-dimension grid
    * (the first cut here) reweights each dimension by 1/range² and
    * DESTROYS the ranking — measured recall 0.06 vs 1.0.
    */
  private def sq8Scale(base: DataFrame): DataFrame = base
    .select(explode(col("v")).as("x"))
    .agg(max(abs(col("x"))).as("s"))

  /** Quantize `v` on the shared scale: q_i = round(x_i/s·127) ∈
    * [−127, 127] as INT — byte-width codes, the 4–8× storage/bandwidth
    * cut that keeps a brute-force scan viable at 100 TB. An all-zero
    * corpus (s = 0) quantizes to all-zero codes, not NaNs.
    */
  private def sq8Apply(base: DataFrame, scale: DataFrame): DataFrame = base
    .crossJoin(broadcast(scale))
    .withColumn("q", transform(col("v"), x =>
      when(col("s") === 0.0, lit(0))
        .otherwise(round(x / col("s") * 127).cast("int"))))
    .drop("v", "s")

  // -------------------------------------------------------------------
  // Product quantization (PQ) — the third compression tier.
  // SQ8 cuts the scan to 1 byte/dimension; PQ cuts it to m CODES for
  // the whole vector (64 float32 dims = 256 B → m = 8 codes ≈ 8 B, a
  // ~32× reduction): the vector space is split into m subspaces, each
  // quantized against its own ks-entry codebook, and a vector is stored
  // as its m nearest-codebook-entry indices. Scoring is ADC
  // (asymmetric distance computation, Jégou et al. 2011): the QUERY
  // stays full-precision, a per-query lookup table holds
  // dot(query_subvector, codebook_entry) for all m·ks entries, and a
  // candidate's score is m table lookups + adds — no per-pair float
  // math at all. At 100 TB this is the difference between scanning the
  // corpus and scanning 3% of its bytes with ~1/8 the multiplies.
  //
  // Everything is deterministic and cross-engine reproducible, same
  // contract as IVF/SQ8: seeds are the md5-sampled corpus rows (code =
  // rank in the sample order), Lloyd refinement per subspace runs its
  // per-dimension means in DECIMAL(27,10), nearest-entry assignment
  // breaks L2 ties toward the smaller code, and every float fold (L2
  // distances, LUT dots, the final m-term score sum) is a sequential
  // in-order left fold — so the whole PQ ranking hash-matches in SQL.
  // -------------------------------------------------------------------

  /** In-order squared-L2 fold — same sequential accumulation DuckDB's
    * `list_sum(list_transform(...))` uses, so distances (and therefore
    * tie-broken assignments) are bit-identical cross-engine.
    */
  private def pqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Comparator = distance ASC, code ASC — deterministic assignment
    * under exact-tie subvectors.
    */
  private val byDistAscCodeAsc = (l: Column, r: Column) =>
    when(l("d") < r("d"), lit(-1)).when(l("d") > r("d"), lit(1))
      .when(l("code") < r("code"), lit(-1))
      .when(l("code") > r("code"), lit(1)).otherwise(lit(0))

  /** Train the PQ codebook: (j, code, cb) rows — subspace j ∈ [0, m),
    * code ∈ [0, ks), cb = the `sub`-dim codebook entry. Seeds are the
    * ks smallest-md5-key corpus rows (code = rank in that order, the
    * same deterministic sample family as IVF seeds), sliced into their
    * m subvectors. Each Lloyd pass reassigns every corpus subvector to
    * its nearest entry and replaces entries by DECIMAL-exact
    * per-dimension means; empty cells drop identically in any engine.
    */
  private def pqCodebook(c: DataFrame, m: Int, sub: Int, ks: Int,
                         lloydIters: Int): DataFrame = {
    val sampleKey =
      conv(substring(md5(col("cand_id").cast("string")), 1, 8), 16, 10).cast("long")
    // BOUNDED single-partition window: the input is limit(ks) rows
    // (the codebook seed sample, a small constant). The
    // [[BoundedWindow]] key keeps the identical global rank while
    // stating the bound (and keeping WindowExec's corpus-scale
    // warning meaningful elsewhere).
    val seeds = c.orderBy(sampleKey.asc, col("cand_id").asc).limit(ks)
      .withColumn("code",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(BoundedWindow.key(col("cand_id")))
          .orderBy(sampleKey.asc, col("cand_id").asc)) - 1)
    val seedCb = seeds
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .select(col("j"), col("code"),
        slice(col("cv"), col("j") * sub + 1, lit(sub)).as("cb"))
    (1 to lloydIters).foldLeft(seedCb) { (cb, _) =>
      withPqCodes(c, cb, m, sub)
        .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
        .select(col("j"), element_at(col("pqcode"), col("j") + 1).as("code"),
          posexplode(element_at(col("subs"), col("j") + 1)))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(sum(col("col").cast("decimal(27,10)")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("j"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s").cast("double") / col("n")).as("m")))),
          x => x("m")).as("cb"))
    }
  }

  /** Codebook as ONE row: cbs[j+1] = the subspace-j entries as an array
    * of (code, cb) structs sorted by code — broadcast onto the corpus
    * so encoding is a per-row zip over subspaces, zero shuffles (the
    * centArray discipline applied to the codebook).
    */
  private def pqCbNested(cb: DataFrame): DataFrame = cb
    .groupBy(col("j"))
    .agg(array_sort(collect_list(struct(col("code"), col("cb")))).as("ent"))
    .agg(transform(array_sort(collect_list(struct(col("j"), col("ent")))),
      x => x("ent")).as("cbs"))

  /** Guard: the broadcast codebook must carry exactly the m subspaces
    * the caller's slice arithmetic assumes — a PQ index probed with the
    * wrong m would silently slice wrong, so it fails loudly in-plan
    * instead (the nbScore bucket-recovery discipline).
    */
  private def pqGuard(df: DataFrame, m: Int): DataFrame = df
    .filter(assert_true(size(col("cbs")) === m,
      lit(s"PQ codebook subspace count != caller's m = $m")).isNull)

  /** Guard: the caller's residual flag must match the flag the codebook
    * was BUILT with (persisted on every codebook row). Scoring residual
    * codes without the centroid base term — or raw codes with it —
    * would be silently wrong by roughly one centroid dot, so a mismatch
    * fails loudly in-plan (same discipline as [[pqGuard]]).
    */
  private def pqResGuard(cb: DataFrame, residual: Boolean): DataFrame =
    if (!cb.columns.contains("res")) {
      // Index dir persisted before the residual flag existed: those
      // codebooks were always raw-encoded, so residual=false reads them
      // unchanged; residual=true gets a real message instead of an
      // unresolved-column AnalysisException.
      require(!residual, "this codebook predates residual encoding (no " +
        "'res' column): it was built raw — query/append with " +
        "residual=false, or rebuild the index to use by_residual")
      cb
    } else cb
      .filter(assert_true(col("res") === lit(residual),
        lit(s"PQ codebook residual flag != caller's residual = $residual")).isNull)

  /** Residual vectors: cand − its assigned centroid, the relation a
    * residual codebook trains on and encodes (FAISS-IVFPQ's
    * `by_residual`). Centroids broadcast; the subtraction is map-side.
    */
  private def residualsOf(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), Seq("centroid_id"))
      .select(col("centroid_id"), col("cand_id"),
        zip_with(col("cv"), col("centv"), (x, c) => x - c).as("cv"))

  /** Encode: attach `subs` (the row's m subvectors) and `pqcode` (the m
    * nearest-entry codes, L2 ties → smaller code) — one map-side pass
    * against the broadcast codebook. The lambda chain binds everything
    * it dereferences (subs/cbs zip per subspace, entries per code), so
    * nothing re-evaluates per array element.
    */
  private def withPqCodes(c: DataFrame, cb: DataFrame, m: Int, sub: Int): DataFrame =
    pqGuard(c.join(broadcast(pqCbNested(cb)), lit(true)), m)
      .withColumn("subs", transform(sequence(lit(0), lit(m - 1)), j =>
        slice(col("cv"), j * sub + 1, lit(sub))))
      .withColumn("pqcode", zip_with(col("subs"), col("cbs"), (xj, ent) =>
        element_at(array_sort(transform(ent, e =>
          struct(pqL2(xj, e("cb")).as("d"), e("code").as("code"))),
          byDistAscCodeAsc), 1)("code")))

  /** Per-query ADC lookup table: lut[j+1][code+1] =
    * dot(query_subvector_j, codebook[j][code]) — m·ks dots computed
    * ONCE per query (missing codes → null, never referenced: no vector
    * encodes to a dropped cell). Scoring a candidate is then m lookups.
    */
  private def withPqLut(q: DataFrame, cb: DataFrame, m: Int, sub: Int,
                        ks: Int): DataFrame =
    pqGuard(q.join(broadcast(pqCbNested(cb)), lit(true)), m)
      .withColumn("qsubs", transform(sequence(lit(0), lit(m - 1)), j =>
        slice(col("qv"), j * sub + 1, lit(sub))))
      .withColumn("lut", zip_with(col("qsubs"), col("cbs"), (qj, ent) =>
        transform(sequence(lit(0), lit(ks - 1)), i =>
          // get() (0-based) is null on an empty cell in BOTH ANSI
          // modes — element_at threw under ANSI when a Lloyd pass
          // starved a cell (residual codebooks concentrate near zero,
          // so dropped cells are the NORM there, not a corner case)
          get(transform(filter(ent, e => e("code") === i),
            e => VectorOps.dot(qj, e("cb"))), lit(0)))))
      .drop("cbs", "qsubs")

  /** ADC score: the m LUT lookups summed in subspace order (in-order
    * left fold — cross-engine exact given identical LUT doubles).
    */
  private def pqScore(code: Column, lut: Column): Column =
    aggregate(zip_with(code, lut, (cd, lj) => element_at(lj, cd + 1)),
      lit(0.0), (acc, v) => acc + v)

  /** PQ brute-force top-k — the compressed-scan path one tier beyond
    * [[sq8TopK]]: the codebook trains on the candidate corpus, the scan
    * streams m-code rows (~32× smaller than float32 vectors), and
    * ranking is ADC dot (score DESC, cand_id ASC). Output:
    * (query_id, cand_id, pqdot). Approximation error is the PQ
    * reconstruction error; when every candidate IS a codebook entry
    * (corpus ≤ ks) the score equals the exact dot (spec-proven).
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
             m: Int = 8, ks: Int = 16, lloydIters: Int = 0,
             dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val c = prepCandidates(candidates)
    val cb = pqCodebook(c, m, sub, ks, lloydIters)
    val codes = withPqCodes(c, cb, m, sub).select(col("cand_id"), col("pqcode"))
    val q = queries.select(col("id").as("query_id"),
      VectorOps.toDoubleArray(col("vec")).as("qv"))
    val qlut = withPqLut(q, cb, m, sub, ks).select(col("query_id"), col("lut"))
    val scored = codes.join(broadcast(qlut), lit(true))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("pqdot", pqScore(col("pqcode"), col("lut")))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("pqdot").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("pqdot"))
      .orderBy(col("query_id"), col("pqdot").desc, col("cand_id"))
  }

  /** Build a persisted IVF-PQ index — the full FAISS-IVFPQ production
    * shape, both scale levers at their strongest: probes prune the scan
    * to nProbes/nCentroids of the corpus (IVF) AND the pruned buckets
    * stream m-code rows (PQ's ~32× cut), so a probe moves
    * ~nProbes/nCentroids ÷ 32 of the float-index bytes. THREE Versioned
    * tables in lockstep (`centroids/`, `codebook/`, `assignment/`):
    * IVF centroids stay full-precision (probe quality), the codebook is
    * m·ks tiny rows, and the assignment stores (centroid_id, cand_id,
    * pqcode). Bucket membership is assigned in full precision BEFORE
    * quantization, identical to [[buildIvfIndex]]'s.
    *
    * A FOURTH lockstep table, `vectors/`, persists the full-precision
    * vectors the build already computed to encode the codes —
    * cand_id-sharded directories (`vec_part = pmod(cand_id,
    * nVecParts)`, the forward-index discipline, modulus in a stamped
    * `vec_parts` sidecar) so the exact re-rank
    * ([[queryIvfPqIndexReranked]]) DPP-fetches its |Q|·k·alpha
    * shortlist instead of scanning (or worse, recomputing) the
    * full-precision corpus per serving batch — at 100 TB the re-rank
    * fetch was the last corpus-sized read on the serving path, and with
    * a real neural encoder an in-plan re-embed is not merely slow but
    * impossible. The table also removes the caller-supplied-corpus
    * staleness hazard: the index serves re-ranks from its OWN snapshot,
    * in version lockstep by construction. `nVecParts = 0` auto-sizes
    * the modulus from the corpus row count (target: a few thousand
    * rows — a couple of row-groups — per shard directory, so probed
    * bytes stay flat as the corpus grows).
    */
  def buildIvfPqIndex(candidates: DataFrame, indexDir: String,
                      nCentroids: Int = 16, m: Int = 8, ks: Int = 16,
                      pqLloydIters: Int = 0, lloydIters: Int = 0,
                      dim: Int = 64, residual: Boolean = false,
                      nBuckets: Int = 8,
                      assignmentLayout: String = "bucket",
                      nVecParts: Int = 0,
                      metaCols: Seq[String] = Nil): Long = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val c = prepCandidates(candidates)
    val (centroids, assigned) = centroidsAndAssignment(c, nCentroids, lloydIters)
    // residual=true is FAISS-IVFPQ's by_residual: the codebook trains on
    // (cand − assigned centroid) and codes store the residual, so the
    // quantizer spends its ks cells on the WITHIN-bucket spread instead
    // of re-describing bucket placement — markedly better reconstruction
    // on clustered corpora at identical code bytes. Scoring adds the
    // centroid base dot per probe (see queryIvfPqIndex). The flag is
    // persisted on every codebook row and guarded at query/append time.
    val encBase = if (residual) residualsOf(assigned, centroids) else c
    val cb = pqCodebook(encBase, m, sub, ks, pqLloydIters)
      .withColumn("res", lit(residual))
    val codes = withPqCodes(encBase, cb, m, sub).select(col("cand_id"), col("pqcode"))
    // metadata gates ride BOTH the code rows (the filtered-probe scan)
    // and the vectors table (so the crashed-append repair, which
    // re-derives the batch from the orphan vectors slice, can restore
    // them — meta that lived only in the crashed caller would be gone)
    val assignedQ = withMeta(
      assigned.select(col("centroid_id"), col("cand_id"))
        .join(codes, Seq("cand_id"))
        .select(col("centroid_id"), col("cand_id"), col("pqcode")),
      candidates, metaCols)
    // the full-precision table lands FIRST (the postings-first
    // discipline: a crash after it leaves the raw data on disk, from
    // which repairIvfIndex COMPLETES the operation)
    val nVec = if (nVecParts > 0) nVecParts else autoVecShards(c.count())
    val vv = graft.sources.Versioned.overwritePartitioned(
      withMeta(c.select(col("cand_id"), col("cv")), candidates, metaCols)
        .withColumn("vec_part", pmod(col("cand_id"), lit(nVec.toLong))),
      s"$indexDir/vectors", "vec_part")
    val vc = graft.sources.Versioned.overwrite(centroids, s"$indexDir/centroids")
    val vb = graft.sources.Versioned.overwrite(cb, s"$indexDir/codebook")
    val va = commitAssignment(assignedQ, s"$indexDir/assignment",
      assignmentLayout, nBuckets)
    require(vv == vc && vc == vb && vb == va,
      s"index tables diverged: vectors v$vv / centroids v$vc / " +
        s"codebook v$vb / assignment v$va")
    Retrieval.writeShardSidecar(candidates.sparkSession, indexDir,
      "vec_parts", nVec, vv)
    vc
  }

  /** Auto-sized vec_part modulus: ~128 vectors (~64 KB of float64 at
    * dim 64) per shard directory, capped at 4096 directories (past the
    * cap shards fatten with the corpus and a probe still reads ≤
    * |shortlist|/4096 of it). The shard count must OUTNUMBER a serving
    * batch's |Q|·k·alpha shortlist for the probe to prune — with
    * count-proportional shards the probed bytes are bounded by
    * |shortlist| × shardBytes, flat in the corpus. Sized at BUILD time
    * from the actual corpus; [[compactIvfIndex]] re-derives it when
    * appends have outgrown the layout.
    */
  private def autoVecShards(count: Long): Int =
    math.max(4L, math.min(4096L, (count + 127L) / 128L)).toInt

  /** Append a batch to a persisted IVF-PQ index without rebuilding:
    * assign to the FROZEN centroids, encode on the FROZEN codebook —
    * one map-side pass over the batch (FAISS `add` semantics; codebook
    * drift vs the growing corpus is the caller's rebuild dial). All
    * four tables commit so versions stay lockstep, FULL-PRECISION
    * VECTORS FIRST (the postings-first discipline): a crash after the
    * vectors append leaves the raw batch on disk, from which
    * [[repairIvfIndex]] COMPLETES the append (re-encoding the orphan
    * slice on the frozen centroids + codebook) — the reverse order was
    * unwedgeable, the codes being lossy. The dim guard rides the
    * vectors append (the FIRST write), so a wrong-dimension batch
    * refuses before anything commits.
    */
  def appendToIvfPqIndex(batch: DataFrame, indexDir: String,
                         m: Int = 8, dim: Int = 64,
                         residual: Boolean = false): Long = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val spark = batch.sparkSession
    require(Seq("vectors", "centroids", "codebook", "assignment")
        .filter(t => graft.sources.Versioned.exists(spark, s"$indexDir/$t"))
        .map(t => graft.sources.Versioned.latestVersion(spark, s"$indexDir/$t"))
        .distinct.size == 1,
      s"$indexDir tables out of lockstep — a prior append crashed between " +
        "commits; run repairIvfIndex, then retry this append")
    val nVec = vecPartsOf(spark, indexDir).getOrElse(sys.error(
      s"$indexDir vectors table's vec_parts sidecar is absent or stale " +
        "— run repairIvfIndex (a pre-vectors index must rebuild with " +
        "buildIvfPqIndex: the exact re-rank serves from the index's own " +
        "full-precision table)"))
    val centroids = graft.sources.Versioned.read(spark, s"$indexDir/centroids")
    val cb = pqResGuard(
      graft.sources.Versioned.read(spark, s"$indexDir/codebook"), residual)
    val c = prepCandidates(batch)
    // dim guard in-plan, riding the FIRST write job: a batch whose
    // vectors' length differs from the index's would corrupt both the
    // codes and every exact re-rank dot — refused before any commit
    val sz = (co: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.size(co)
    val badDims = c
      .crossJoin(broadcast(centroids
        .agg(org.apache.spark.sql.functions.max(sz(col("centv"))).as("__dim"))))
      .filter(sz(col("cv")) =!= col("__dim"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__bad"))
    // a metadata-carrying index keeps its filtered-probe contract
    // through appends (see appendToIvfIndex): the batch must supply the
    // baked columns, and they land on BOTH tables, matching the build
    val meta = assignmentMetaCols(
      graft.sources.Versioned.read(spark, s"$indexDir/assignment"))
    val metaMissing = meta.filterNot(batch.columns.contains)
    require(metaMissing.isEmpty,
      s"$indexDir assignment carries metadata column(s) " +
        s"${meta.mkString(", ")} (filtered-probe gates); the append batch " +
        s"must supply them — missing: ${metaMissing.mkString(", ")}")
    val guardedVecs = withMeta(c.select(col("cand_id"), col("cv")), batch, meta)
      .withColumn("vec_part", pmod(col("cand_id"), lit(nVec.toLong)))
      .crossJoin(broadcast(badDims))
      .filter(org.apache.spark.sql.functions.assert_true(
        col("__bad") === 0L,
        lit(s"IVF-PQ append dim mismatch on $indexDir: the batch carries " +
          "vectors whose length differs from the index's stored centroid " +
          "dim — re-embed the batch with the build's encoder/dim; " +
          "nothing was committed")).isNull)
      .drop("__bad")
    val assignedB = assignTo(c, centroids)
    val encBase = if (residual) residualsOf(assignedB, centroids) else c
    val assignedNew = withMeta(assignedB
      .select(col("centroid_id"), col("cand_id"))
      .join(withPqCodes(encBase, cb, m, sub).select(col("cand_id"), col("pqcode")),
        Seq("cand_id"))
      .select(col("centroid_id"), col("cand_id"), col("pqcode")),
      batch, meta)
    val vv = graft.sources.Versioned.appendPartitioned(guardedVecs,
      s"$indexDir/vectors", "vec_part")
    val vc = graft.sources.Versioned.overwrite(centroids, s"$indexDir/centroids")
    val vb = graft.sources.Versioned.overwrite(cb, s"$indexDir/codebook")
    val va = appendAssignment(assignedNew, s"$indexDir/assignment")
    require(vv == vc && vc == vb && vb == va,
      s"index tables diverged: vectors v$vv / centroids v$vc / " +
        s"codebook v$vb / assignment v$va")
    vc
  }

  private def vecPartsOf(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String): Option[Int] =
    Retrieval.shardSidecarOf(spark, indexDir, "vec_parts", "vectors")

  /** Probe a persisted IVF-PQ index: probe selection in full precision
    * against the stored centroids, then an ADC scan of only the probed
    * buckets' code rows. With nProbes = nCentroids and identical
    * codebook params this degenerates to exactly [[pqTopK]]
    * (spec-proven, and how the oracle checks it). Latest-version reads
    * refuse an out-of-lockstep triple, same as [[queryIvfIndex]].
    */
  def queryIvfPqIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                      queries: DataFrame, k: Int, nProbes: Int = 4,
                      asOf: Option[Long] = None, m: Int = 8, ks: Int = 16,
                      dim: Int = 64, residual: Boolean = false): DataFrame =
    queryIvfPqIndexWhere(spark, indexDir, queries, k, nProbes, asOf, m, ks,
      dim, residual, None)

  /** [[queryIvfPqIndex]] with the [[queryIvfIndexFiltered]] metadata
    * gate riding the probed code-row scan — the predicate applies to
    * the full ADC-scored stream BEFORE the compressed ranking, so the
    * shortlist is drawn from eligible candidates only (no starvation),
    * and a predicate column the index does not carry refuses loudly.
    */
  def queryIvfPqIndexFiltered(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String, queries: DataFrame, k: Int,
                              predicate: Column, nProbes: Int = 4,
                              asOf: Option[Long] = None, m: Int = 8,
                              ks: Int = 16, dim: Int = 64,
                              residual: Boolean = false): DataFrame =
    queryIvfPqIndexWhere(spark, indexDir, queries, k, nProbes, asOf, m, ks,
      dim, residual, Some(predicate))

  private def queryIvfPqIndexWhere(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String,
                      queries: DataFrame, k: Int, nProbes: Int,
                      asOf: Option[Long], m: Int, ks: Int,
                      dim: Int, residual: Boolean,
                      pred: Option[Column]): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    if (asOf.isEmpty) {
      val ts = Seq("vectors", "centroids", "codebook", "assignment")
        .filter(t => graft.sources.Versioned.exists(spark, s"$indexDir/$t"))
      val vs = ts.map(t =>
        graft.sources.Versioned.latestVersion(spark, s"$indexDir/$t"))
      require(vs.distinct.size == 1, s"index tables out of lockstep " +
        s"(${ts.zip(vs).map { case (t, v) => s"$t v$v" }.mkString(", ")}) — " +
        "a build/append crashed between commits; run repairIvfIndex or pin asOf")
    }
    val centroids = graft.sources.Versioned.read(spark, s"$indexDir/centroids", asOf)
    val cb = pqResGuard(
      graft.sources.Versioned.read(spark, s"$indexDir/codebook", asOf), residual)
    // takedown gate before scoring, as in [[readIndexPair]]
    val assignedAll = Tombstones.gate(spark, indexDir,
      graft.sources.Versioned.read(spark, s"$indexDir/assignment", asOf),
      Retrieval.docKeyExpr(spark, indexDir, col("cand_id")))
    pred.foreach(requirePredicateCols(indexDir, assignedAll, _))
    val assigned = pred.map(assignedAll.filter).getOrElse(assignedAll)

    val q = queries
      .select(col("id").as("query_id"), VectorOps.toDoubleArray(col("vec")).as("qv"))
      .withColumn("q_norm_sq", VectorOps.normSq(col("qv")))
    val probesRaw = q
      .join(broadcast(centArray(centroids)), lit(true))
      .withColumn("__probe", explode(slice(
        array_sort(scoredCents(col("qv"), col("q_norm_sq")), bySimDescIdAsc),
        1, nProbes)))
      .select(col("query_id"), col("__probe")("centroid_id").as("centroid_id"),
        col("qv"))
    // residual ADC: score(q, x) ≈ dot(q, c) + dot(q, x − c hat) — the
    // centroid base dot is ONE extra term per (query, probe), computed
    // against the broadcast centroid table; raw mode scores from the
    // LUT alone.
    val probes =
      if (!residual) probesRaw.select(col("query_id"), col("centroid_id"))
        .withColumn("cdot", lit(0.0))
      else probesRaw.join(broadcast(centroids), Seq("centroid_id"))
        .select(col("query_id"), col("centroid_id"),
          VectorOps.dot(col("qv"), col("centv")).as("cdot"))
    val qlut = withPqLut(q.select(col("query_id"), col("qv")), cb, m, sub, ks)
      .select(col("query_id"), col("lut"))
      .join(probes, Seq("query_id"))

    val scored = assigned.join(broadcast(qlut), Seq("centroid_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("pqdot",
        if (residual) col("cdot") + pqScore(col("pqcode"), col("lut"))
        else pqScore(col("pqcode"), col("lut")))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("pqdot").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("pqdot"))
      .orderBy(col("query_id"), col("pqdot").desc, col("cand_id"))
  }

  /** TWO-STAGE retrieval over a persisted IVF-PQ index — the standard
    * serving composition (FAISS's refine / re-rank stage): stage 1
    * shortlists `k·alpha` candidates per query with the compressed ADC
    * scan ([[queryIvfPqIndex]] — probe-pruned, code-width bytes); stage
    * 2 re-scores ONLY the shortlist with the exact full-precision dot
    * and keeps the top k. This closes PQ's reconstruction-error recall
    * gap at probe-bounded cost: the exact math touches |Q|·k·alpha
    * rows, never the corpus — the full-precision vectors come from the
    * index's OWN `vectors/` table ([[buildIvfPqIndex]] persists them
    * cand_id-sharded at build time), so the fetch is a broadcast
    * equality join the shortlist DPP-prunes to its shard directories:
    * re-rank BYTES are bounded by the probed doc set, independent of
    * corpus size, and the vectors are the indexed snapshot by
    * construction (no caller-supplied corpus to drift stale). The
    * shortlist stages through a constraint-free seam so the shard-range
    * guard survives composition (SPARK-39748). `alpha` is the recall
    * dial (how far past k the compressed ranking must place a true
    * neighbor to be recovered). Output: (query_id, cand_id, dot) —
    * exact dots, so ties and order are engine-exact.
    */
  def queryIvfPqIndexReranked(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String, queries: DataFrame,
                              k: Int, alpha: Int = 4,
                              nProbes: Int = 4, asOf: Option[Long] = None,
                              m: Int = 8, ks: Int = 16, dim: Int = 64,
                              residual: Boolean = false): DataFrame =
    queryIvfPqIndexRerankedWhere(spark, indexDir, queries, k, alpha, nProbes,
      asOf, m, ks, dim, residual, None)

  /** [[queryIvfPqIndexReranked]] with the metadata gate on the ADC
    * shortlist stage ([[queryIvfPqIndexFiltered]]): the k·alpha
    * shortlist is drawn from ELIGIBLE candidates only, so the exact
    * re-rank's top-k can never starve on gated neighbors — and the
    * re-rank fetch needs no second gate (its input is already a subset
    * of the filtered stream).
    */
  def queryIvfPqIndexRerankedFiltered(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String, queries: DataFrame,
                              k: Int, predicate: Column, alpha: Int = 4,
                              nProbes: Int = 4, asOf: Option[Long] = None,
                              m: Int = 8, ks: Int = 16, dim: Int = 64,
                              residual: Boolean = false): DataFrame =
    queryIvfPqIndexRerankedWhere(spark, indexDir, queries, k, alpha, nProbes,
      asOf, m, ks, dim, residual, Some(predicate))

  private def queryIvfPqIndexRerankedWhere(
                              spark: org.apache.spark.sql.SparkSession,
                              indexDir: String, queries: DataFrame,
                              k: Int, alpha: Int,
                              nProbes: Int, asOf: Option[Long],
                              m: Int, ks: Int, dim: Int,
                              residual: Boolean,
                              pred: Option[Column]): DataFrame = {
    require(alpha >= 1, s"alpha must be >= 1, got $alpha")
    require(graft.sources.Versioned.exists(spark, s"$indexDir/vectors"),
      s"$indexDir has no vectors table — the exact re-rank serves the " +
        "shortlist from the index's own full-precision snapshot; rebuild " +
        "this (pre-vectors) index with buildIvfPqIndex")
    val shortlist = Retrieval.constraintFreeStage(
      queryIvfPqIndexWhere(spark, indexDir, queries, k * alpha,
          nProbes, asOf, m, ks, dim, residual, pred)
        .select(col("query_id"), col("cand_id")))
    val q = queries.select(col("id").as("query_id"),
      VectorOps.toDoubleArray(col("vec")).as("qv"))
    val scored = vectorsFor(spark, indexDir, shortlist, asOf)
      .join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("dot", VectorOps.dot(col("qv"), col("cv")))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("dot").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("dot"))
      .orderBy(col("query_id"), col("dot").desc, col("cand_id"))
  }

  /** Full-precision rows for a bounded candidate set — the
    * [[Retrieval.forwardFor]] discipline on the vectors table: the
    * set's distinct cand_ids broadcast ONTO the partitioned scan, and
    * on a trusted vec_parts sidecar the join carries the shard key
    * (with the in-range guard PartitionPruning needs as its selective
    * predicate) so Spark DPP prunes unprobed shard DIRECTORIES at run
    * time. An untrusted sidecar or a time-travel read degrades to the
    * unpruned-but-correct cand_id join.
    */
  private def vectorsFor(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, candSet: DataFrame,
                         asOf: Option[Long]): DataFrame = {
    val vt = graft.sources.Versioned.read(spark, s"$indexDir/vectors", asOf)
    val ids = candSet.select(col("cand_id")).distinct()
    Retrieval.shardSidecarFor(spark, indexDir, "vec_parts", "vectors",
        asOf) match {
      case Some(n) =>
        val probe = ids
          .withColumn("vec_part", pmod(col("cand_id"), lit(n.toLong)))
          .filter(col("vec_part").between(0, n - 1))
        vt.select(col("vec_part"), col("cand_id"), col("cv"))
          .join(broadcast(probe), Seq("vec_part", "cand_id"))
          .drop("vec_part")
      case None =>
        vt.select(col("cand_id"), col("cv"))
          .join(broadcast(ids), Seq("cand_id"))
    }
  }

  /** SQ8-quantized brute-force top-k — the compressed-scan ANN path:
    * both sides quantize on the CANDIDATE corpus's global scale, and
    * ranking runs on the INTEGER dot product of the codes (|qdot| ≤
    * 127²·dims ≈ 1.0M per pair — exact in double, so the score is
    * bit-identical in any engine, unlike float cosines). Same
    * broadcast-queries × stream-corpus shape as [[bruteForceTopK]],
    * but the streamed payload is byte-width codes, not float32s.
    * Output: query_id, cand_id, qdot (BIGINT).
    */
  def sq8TopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val cb = candidates.select(col("id").as("cand_id"),
      VectorOps.toDoubleArray(col("vec")).as("v"))
    val qb = queries.select(col("id").as("query_id"),
      VectorOps.toDoubleArray(col("vec")).as("v"))
    val ranges = sq8Scale(cb)
    val cq = sq8Apply(cb, ranges).withColumnRenamed("q", "cq")
    val qq = sq8Apply(qb, ranges).withColumnRenamed("q", "qq")
    // scoring stays INTEGER end-to-end (IntDotProductExpr): codes are
    // never widened back to double arrays per pair, so the compressed
    // scan keeps its bandwidth AND compute win
    val scored = cq.join(broadcast(qq), lit(true))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("qdot", VectorOps.dotInt(col("qq"), col("cq")))
    Ranking.topPerGroup(scored, Seq(col("query_id")),
        Seq(col("qdot").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"), col("qdot"))
      .orderBy(col("query_id"), col("qdot").desc, col("cand_id"))
  }
}
