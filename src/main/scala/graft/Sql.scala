package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface: registers the engine's tables as temp views so
  * users can address the same data through `spark.sql(...)` that the
  * Column API addresses through [[Tables]]. Combined with
  * [[GraftExtensions]] (native function registration, e.g. `vec_dot`),
  * this is the full SQL-first path — a reference user who writes SQL
  * instead of DataFrame code runs unchanged.
  *
  * The views are plan-level aliases of the cached relations in
  * [[Tables]] — no data copy, and Catalyst sees identical plans whether
  * a query arrives as SQL text or as Column-API calls.
  */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table under its bare name. `events` goes
    * through [[Tables.events]] so SQL sees the converted microsecond
    * timestamp column, same as the Column API.
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n        => Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** One-call SQL entry: register views for `dir`, run the query. */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }
}
