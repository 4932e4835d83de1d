package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Maintenance
import graft.sources.Sources

/** Table-maintenance surface: small-file compaction (the repair for the
  * reference's flush.size=1 layout) and schema-evolution reads.
  */
class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("compaction collapses a many-small-files table without changing its rows") {
    val base = Files.createTempDirectory("graft-compact").toString
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    // simulate the reference's pathology: scatter into many tiny files
    df.repartition(64).write.parquet(s"$base/small")
    assert(Maintenance.dataFileCount(spark, s"$base/small") >= 64)

    Maintenance.compactParquet(spark, s"$base/small", s"$base/compact")
    val after = Maintenance.dataFileCount(spark, s"$base/compact")
    assert(after < 64 / 4, s"expected strong compaction, got $after files")

    val a = spark.read.parquet(s"$base/small")
    val b = spark.read.parquet(s"$base/compact")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("mergeSchema surfaces late-added columns as nulls on old files") {
    val base = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.parquet(s"$base/t/batch=0")
    Seq((3L, "c", 9.5), (4L, "d", 8.5)).toDF("id", "s", "score")
      .write.parquet(s"$base/t/batch=1")

    val merged = Sources.parquetMergeSchema(spark, s"$base/t")
    assert(merged.columns.toSet == Set("id", "s", "score", "batch"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
    assert(rows(3L).contains(9.5) && rows(4L).contains(8.5))
  }
}
