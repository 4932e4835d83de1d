package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.sources.Sinks

/** The 100 TB layout story, verified structurally: data written
  * date-partitioned is read back with partition pruning (a day filter
  * touches one directory, not the table), and dynamic partition pruning
  * kicks in when the filter arrives through a join.
  */
class PartitionPruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("day filter on a date-partitioned table prunes to matching partitions") {
    val out = Files.createTempDirectory("graft-prune").toString + "/events_by_day"
    val events = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
    Sinks.parquet(events, out, partitionBy = Seq("day"))

    val nDays = events.select("day").distinct().count()
    val oneDay = events.agg(min(col("day"))).head.getDate(0)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.read.parquet(out).filter(col("day") === lit(oneDay))
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      val meta = scan.toString
      // the partition filter is applied at file-listing time
      assert(meta.contains("PartitionFilters"), s"no PartitionFilters in: $meta")
      // and the scan's file count is the single matching partition
      val files = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .map(_.files.length).sum }.get
      val allFiles = spark.read.parquet(out).queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(Nil, Nil).map(_.files.length).sum }.get
      assert(files < allFiles, s"pruned scan reads $files of $allFiles files")
      assert(files <= allFiles / nDays * 2, "pruning should cut to ~one day's files")
      // correctness: pruned read returns exactly that day's rows
      assert(q.count() == events.filter(col("day") === lit(oneDay)).count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dynamic partition pruning fires when the day filter arrives via a join") {
    val base = Files.createTempDirectory("graft-dpp").toString
    val events = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
    Sinks.parquet(events, s"$base/facts", partitionBy = Seq("day"))

    // a tiny dimension selecting one day — the classic star-schema probe
    import spark.implicits._
    val oneDay = events.agg(min(col("day"))).head.getDate(0)
    // DPP requires a selective predicate on the dimension side, and the
    // dim must come from storage — a filtered in-memory relation is
    // constant-folded into a LocalTableScan the DPP heuristic can't see
    Seq((oneDay, "keep"), (java.sql.Date.valueOf("1970-01-01"), "drop"))
      .toDF("day", "tag").write.mode("overwrite").parquet(s"$base/dim")
    val dimDf = spark.read.parquet(s"$base/dim").filter(col("tag") === "keep")
    val facts = spark.read.parquet(s"$base/facts")
    val joined = facts.join(broadcast(dimDf), Seq("day"))
    val plan = joined.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning"), "no dynamic partition pruning in join plan")
    assert(joined.count() == events.filter(col("day") === lit(oneDay)).count())
  }
}
