package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Co-located join via bucketed tables: both sides written with the same
  * bucket spec join with no exchange — the shuffle is paid once at write
  * time (SURVEY.md "Partitioning & shuffle" posture).
  */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  test("equi-join of co-bucketed sorted tables plans without Exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "payload")
    val dims = (0 to 96).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Sinks.parquetBucketed(facts, "bj_facts", "k", nBuckets = 8)
    Sinks.parquetBucketed(dims, "bj_dims", "k", nBuckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the exchange-elision is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("bj_facts").join(spark.table("bj_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bj_facts")
      spark.sql("DROP TABLE IF EXISTS bj_dims")
    }
  }
}
