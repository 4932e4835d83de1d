package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md). Parquet carries its own schema in the footer, so no
  * inference pass is needed — this is the scale-friendly path the
  * reference's `inferSchema=true` JSON scan (reference README.md:344-348)
  * is NOT.
  *
  * All loaders take the scale-factor directory so the same query code
  * runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench).
  */
object Tables {
  /** Resolved-relation cache keyed by (session, path). `spark.read`
    * builds a fresh InMemoryFileIndex per call — file listing + parquet
    * footer reads repeated for every query that touches the table. A
    * production deployment amortizes that through the metastore/catalog;
    * this cache plays the same role for the path-addressed tables here.
    * Only the *plan* (relation + file index) is cached, never row data.
    *
    * CONTRACT: cached paths are immutable source tables. The cached
    * file index goes stale if the files under a path are rewritten, so
    * anything mutable goes AROUND this cache — compaction output and
    * CDC snapshots read via `spark.read` directly (Maintenance,
    * StreamJobs do), or the writer calls [[invalidate]] after the swap.
    * Entries pinned by stopped sessions are evicted on the next access,
    * so the cache is bounded by live-session tables, not process
    * lifetime.
    */
  private val relationCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    relationCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) relationCache.remove(k): Unit
    }
    relationCache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Drop cached relations for `path` (every session) — REQUIRED after
    * rewriting files under a cached path, or readers keep serving the
    * old file index (missing-file errors or stale rows).
    */
  def invalidate(path: String): Unit =
    relationCache.keys.filter(_._2 == path).foreach(relationCache.remove(_): Unit)

  /** Drop every cached relation (session teardown / test isolation). */
  def invalidateAll(): Unit = relationCache.clear()

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** events.parquet has shipped `ts` in two physical layouts across
    * testdata generations: TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects, so it is read as LONG nanos (legacy conf) and
    * converted — and plain TIMESTAMP(MICROS) without timezone, which
    * reads natively as TIMESTAMP_NTZ. Both normalize to a microsecond
    * TimestampType column with identical values (session TZ is UTC, so
    * the NTZ→LTZ cast is value-preserving).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→LTZ cast below evaluates LAZILY under the session
    // timezone and is only value-preserving under UTC. Fail fast
    // instead of silently shifting `ts` (or silently mutating the
    // caller's session-wide timezone as a read side effect): every
    // graft entry point sets UTC; a library caller must too.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC: the " +
        "TIMESTAMP_NTZ->TIMESTAMP normalization is timezone-sensitive " +
        "and evaluates lazily under the session config")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` = integral division. `/` would promote to DOUBLE, and
        // 2024+ epoch-nanos (~1.7e18) exceed a double's 2^53 integer
        // range — ~1.6% of values would come back off by 1 µs after the
        // truncating cast.
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
