package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators.
  *
  * The reference's sink writes ONE S3 object per record
  * (`flush.size=1`, reference README.md:155) — the small-file pathology
  * that makes every downstream scan pay per-object listing and open
  * costs. Compaction is the standing repair: rewrite a directory into
  * size-targeted files. At 100 TB this runs per partition (compact
  * yesterday's partition after the day closes), so the rewrite touches
  * one day's data, never the table.
  */
object Maintenance {

  /** Total byte size of the data files under `dir` (driver-side file
    * metadata only — no row data).
    */
  private def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** Rewrite the parquet directory at `inDir` to `outDir` with files
    * targeting `targetBytes` each (default 128 MB — one HDFS/S3 block,
    * one scan task). Uses coalesce when shrinking the file count: no
    * shuffle, each output task concatenates input splits.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val nFiles = math.max(1, math.ceil(dataBytes(spark, inDir).toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(nFiles).write.mode("overwrite").parquet(outDir)
  }

  /** Compact ONE partition of a partitioned table in place (by swap):
    * the 100 TB cadence — yesterday's partition compacts after the day
    * closes; the rest of the table is never read or rewritten. The
    * rewritten files land in a staging directory first and rename over
    * the partition only when complete (write-audit-publish, same as the
    * CDC snapshot swap).
    */
  def compactPartition(spark: SparkSession, tableDir: String, partition: String,
                       targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val partDir = s"$tableDir/$partition"
    val part = new Path(partDir)
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(part), s"no such partition: $partDir")
    val staging = new Path(s"$tableDir/.compact-staging-${partition.replace('/', '_')}")
    val nFiles = math.max(1, math.ceil(dataBytes(spark, partDir).toDouble / targetBytes).toInt)
    spark.read.parquet(partDir).coalesce(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    // rename-aside publish: a live copy exists at every instant, and
    // every rename's boolean is checked (never delete-then-rename — a
    // crash or a false rename there loses the partition)
    Publish.swap(fs, staging, part)
  }

  /** Map `x` onto a `bits`-wide bucket of its [lo, hi] range (constant
    * columns collapse to bucket 0). The fixed-point grid makes the
    * Z-value deterministic and layout-independent — no sampling, no
    * rand(), so a re-run clusters identically.
    */
  private def bucketN(x: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi === lo, lit(0)).otherwise(
      least(lit((1 << bits) - 1),
        floor((x.cast("double") - lo) / (hi - lo) * (1 << bits)).cast("int")))

  /** Bit-interleave N `bits`-wide bucket values into one Z-value — the
    * Morton curve: close in Z ⇒ close in EVERY dimension. A plain
    * OR-fold of N·bits shift/mask terms; stays inside whole-stage
    * codegen. Earlier columns take the higher interleave positions
    * (they prune hardest — order columns by filter frequency).
    * Interleaves in LONG space: the top 2-column bit lands at position
    * 31, which in int arithmetic is the sign bit — an int Z-value would
    * sort the top half of the curve FIRST and split one curve tile
    * across the wrap (the pre-round-8 form did exactly that).
    */
  private def mortonN(bs: Seq[Column], bits: Int): Column = {
    val n = bs.size
    val lbs = bs.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      lbs.zipWithIndex.map { case (b, k) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + (n - 1 - k)) }
    }.reduce(_.bitwiseOR(_))
  }

  /** The Z-value expression over declared per-column [lo, hi] ranges —
    * exactly the key [[zorderWrite]] sorts by, exposed for callers that
    * keep their own range stats (a lakehouse manifest) and for
    * cross-engine verification (q148 replays the bucket arithmetic and
    * the full bit-interleave in SQL).
    */
  def zKey(cols: Seq[(Column, Column, Column)]): Column = {
    require(cols.size >= 2 && cols.size <= 4, "z-order takes 2-4 columns")
    val bits = 32 / cols.size
    mortonN(cols.map { case (c, lo, hi) => bucketN(c, lo, hi, bits) }, bits)
  }

  /** Z-ORDER CLUSTERED REWRITE — the multi-dimensional data-skipping
    * layout: rows sort along the Morton curve of 2–4 columns, so every
    * output file covers a narrow range of EACH column and parquet
    * min/max footer stats prune scans filtered on ANY of them. A
    * single-column sort gives perfect skipping on that column and none
    * on the others; Z-order trades a little of the first for locality
    * on all — the standard layout for a fact table queried by
    * (time, key) interchangeably. The bit budget (32 total) splits
    * evenly across columns: 16/16 for two, 10 each for three. One
    * range shuffle on the Z-value (the same cost as any global sort),
    * local sort within files, no driver-side data movement; at 100 TB
    * this runs per partition, like [[compactPartition]].
    */
  def zorderWrite(df: DataFrame, cols: Seq[Column], outDir: String,
                  numFiles: Int): Unit = {
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      min(c).cast("double").as(s"__lo$i"), max(c).cast("double").as(s"__hi$i")) }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zKey(cols.zipWithIndex.map { case (c, i) =>
        (c, col(s"__lo$i"), col(s"__hi$i")) }))
      .drop(cols.indices.flatMap(i => Seq(s"__lo$i", s"__hi$i")): _*)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Two-column form (16-bit buckets each). */
  def zorderWrite(df: DataFrame, colA: Column, colB: Column,
                  outDir: String, numFiles: Int): Unit =
    zorderWrite(df, Seq(colA, colB), outDir, numFiles)

  /** Count of data files in a directory (spec/report helper). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.endsWith(".crc"))
  }
}
