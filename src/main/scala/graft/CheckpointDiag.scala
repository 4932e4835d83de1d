package graft

import org.apache.spark.sql.SparkSession

/** Boot-variance diagnostic for the localCheckpoint-heavy iterative
  * queries (judge round-10 task #7): q154 (PageRank — per-round
  * shuffle + localCheckpoint) and q117 (incremental curation — state
  * commits + checkpoints) measured ~2× across boots on identical
  * plans (q154 3.6–8.0 s, q117 5–7 s).
  *
  * Two candidate mechanisms, separable by experiment:
  *  - BLOCK/SPILL I/O: localCheckpoint blocks and every round's
  *    shuffle files land in `spark.local.dir` — if the variance is
  *    device I/O, pointing local.dir at a tmpfs (/dev/shm) collapses
  *    it and the disk runs stay wide.
  *  - SCHEDULER/GC AMBIENT: if tmpfs runs wobble identically, the
  *    variance is not storage at all.
  *
  * Usage (one JVM per boot sample; vary the device via run.sh's
  * SPARK_GRAFT_JVM_OPTS passthrough):
  *
  *   SPARK_GRAFT_JVM_OPTS="-Dspark.local.dir=/dev/shm/graft_local" \
  *     SPARK_GRAFT_CPUS=32 bash tools/run.sh graft.CheckpointDiag \
  *     /root/testdata/sf0.1 3
  *
  * Prints one line per timed run: query, run index, seconds, and the
  * effective local.dir — grep-friendly for the ROUNDLOG table.
  */
object CheckpointDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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
    val localDir = spark.sparkContext.getConf.get("spark.local.dir",
      System.getProperty("java.io.tmpdir"))
    Bench.force(SparkEntry.entry(spark)) // JVM/codegen warmup
    Seq("q154_pagerank", "q117_incremental_curation").foreach { name =>
      val fn = SparkEntry.queries(name)
      Bench.force(fn(spark, sfDir)) // per-query warm (codegen, broadcasts)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        Bench.force(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[ckptdiag] $name run$i $t%.2fs local.dir=$localDir")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
