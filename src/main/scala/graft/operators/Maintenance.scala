package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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

  /** Count of data files in a directory (spec/report helper). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.endsWith(".crc"))
  }
}
