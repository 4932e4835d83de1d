package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a deterministic DataFrame program over
  * the TESTDATA parquet tables; [[oracleSql]] holds the DuckDB twin the
  * driver hash-compares against. Conventions that make hash-matching
  * robust (FIXTURES.md "canonicalization"):
  *
  *  - every query ends in an ORDER BY that is a total order (explicit
  *    tie-break keys), so row order is identical in both engines;
  *  - sums over monetary doubles go through DECIMAL(18,2) (exact,
  *    order-independent) and are cast back to DOUBLE at the end;
  *  - integer aggregates are cast to BIGINT on the DuckDB side (DuckDB
  *    sum(int) is HUGEINT, Spark's is LONG);
  *  - column aliases match exactly between the Spark plan and the SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ ExtQueries.all ++ SimQueries.all ++ StatQueries.all ++ WideQueries.all ++ PipelineQueries.all ++ SubQueries.all ++ TpchQueries.all ++ RetrievalQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracle ++ ExtQueries.oracle ++ SimQueries.oracle ++ StatQueries.oracle ++ WideQueries.oracle ++ PipelineQueries.oracle ++ SubQueries.oracle ++ TpchQueries.oracle ++ RetrievalQueries.oracle
}
