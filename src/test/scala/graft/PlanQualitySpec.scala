package graft

import org.apache.spark.sql.execution.ExplainMode

/** Engine-wide physical-plan invariants, enforced over EVERY query in
  * the declared surface. These are the properties that decide whether a
  * plan survives a 100× scale-up — checked structurally, not by timing:
  *
  *  - no CartesianProduct, ever (an O(n·m) shuffle explosion at scale);
  *  - BroadcastNestedLoopJoin only where the algorithm declares a tiny
  *    broadcast side (brute-force ANN baselines, 1-row aggregates);
  *  - every query keeps at least one whole-stage-codegen span;
  *  - selective predicates reach the parquet scan as PushedFilters.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Plan with AQE disabled: the pre-execution AdaptiveSparkPlan hides
    * codegen stages (they materialize per query-stage at runtime), so
    * structural assertions need the statically compiled plan.
    */
  private def planOf(name: String): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Nested-loop joins that ARE the declared algorithm: the build side
    * is constant-sized (query vectors q31, centroid table q37, 1-row
    * aggregate q53/q69), so the "loop" is O(n·k) with tiny k — the
    * standard scale shape for scan-scoring, not an accident.
    */
  private val intentionalNestedLoop = Set(
    "q31_cosine_topk", "q37_ann_ivf", "q53_scalar_subquery", "q69_tfidf")

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!planOf(name).contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("nested-loop joins appear only where the algorithm declares them") {
    SparkEntry.queries.keys.filterNot(intentionalNestedLoop).foreach { name =>
      assert(!planOf(name).contains("BroadcastNestedLoopJoin"),
        s"$name plans an undeclared BroadcastNestedLoopJoin — " +
          "a join key is missing or a broadcast side grew")
    }
  }

  test("every query keeps a whole-stage-codegen span") {
    SparkEntry.queries.keys.foreach { name =>
      assert(planOf(name).contains("[codegen id :"),
        s"$name fell entirely out of codegen")
    }
  }

  test("correlated subqueries decorrelate to joins, never per-row execution") {
    // EXISTS → left semi; IN → left semi; NOT IN → (null-aware) anti;
    // correlated scalar agg → aggregate-then-join. If Catalyst ever
    // left a correlated subquery in the physical plan it would surface
    // as an InSubquery/exists subquery node or a nested-loop — both
    // absent here, so each of these is ONE join keyed on the
    // correlation column (the shape that survives 100 TB).
    assert(planOf("q85_exists_correlated").contains("LeftSemi"))
    assert(planOf("q86_in_subquery").contains("LeftSemi"))
    val q87 = planOf("q87_not_in_null")
    assert(q87.contains("LeftAnti"))
    assert(!q87.contains("NestedLoop"), "null-aware anti fell to nested loop")
    val q88 = planOf("q88_scalar_correlated")
    assert(q88.contains("HashAggregate") &&
      (q88.contains("BroadcastHashJoin") || q88.contains("SortMergeJoin")))
    val q92 = planOf("q92_not_exists")
    assert(q92.contains("LeftAnti") && !q92.contains("NestedLoop"))
    // multi-key correlation: BOTH equality predicates become join keys
    val q93 = planOf("q93_multikey_exists")
    assert(q93.contains("LeftSemi") && !q93.contains("NestedLoop"))
  }

  test("runtime bloom-filter pruning injects on selective shuffle joins at scale thresholds") {
    // The 100 TB shape: a big fact scan sort-merge-joined to a filtered
    // side gets a bloom filter injected on the fact side, so shuffle
    // input drops before the exchange. Spark gates the rewrite on the
    // application-side scan size (default 10 GB) — at toy scale it
    // correctly declines, so the spec pins BOTH behaviors.
    import org.apache.spark.sql.functions._
    def planWith(scanThreshold: String): String = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", scanThreshold)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val li = Tables.lineitem(spark, dir)
        val sel = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
        li.join(sel, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus")).count()
          .queryExecution.optimizedPlan.toString
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    assert(planWith("1KB").contains("bloom"),
      "no bloom filter injected despite scale-like thresholds")
    assert(!planWith("10GB").contains("bloom"),
      "bloom filter injected below the cost threshold — the gate is off")
  }

  test("selective predicates reach the parquet scans as pushed filters") {
    val pushed = raw"PushedFilters: \[[^\]]".r
    Seq("q02_filter_project", "q60_regexp_extract", "q66_shipping_priority")
      .foreach { name =>
        assert(pushed.findFirstIn(planOf(name)).isDefined,
          s"$name: no non-empty PushedFilters on any scan")
      }
  }
}
