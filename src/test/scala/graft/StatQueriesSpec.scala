package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the statistical / multi-dimensional / outer-join
  * surface (StatQueries q46–q57). Query-level assertions run on the
  * sf0.001 testdata; the tricky frames are cross-checked against
  * brute-force recomputations of the same semantics.
  */
class StatQueriesSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q47 cube emits all four grouping combinations with correct flags") {
    val r = StatQueries.q47Cube(spark, dir).collect()
    val combos = r.map(x => (x.getAs[Long]("g_status"), x.getAs[Long]("g_priority"))).toSet
    assert(combos == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    // grouping()=1 ⇔ the key is rolled up (NULL because aggregated, not data)
    r.foreach { x =>
      assert((x.getAs[Long]("g_status") == 1L) == x.isNullAt(x.fieldIndex("o_orderstatus")))
      assert((x.getAs[Long]("g_priority") == 1L) == x.isNullAt(x.fieldIndex("o_orderpriority")))
    }
    // the grand-total row counts every order exactly once
    val total = r.filter(x => x.getAs[Long]("g_status") == 1L &&
      x.getAs[Long]("g_priority") == 1L)
    assert(total.length == 1)
    assert(total.head.getAs[Long]("n_orders") == Tables.orders(spark, dir).count())
    // each grouping level partitions the same row universe
    val byLevel = r.groupBy(x => (x.getAs[Long]("g_status"), x.getAs[Long]("g_priority")))
      .map { case (k, rows) => k -> rows.map(_.getAs[Long]("n_orders")).sum }
    assert(byLevel.values.toSet.size == 1, s"per-level totals differ: $byLevel")
  }

  test("q49 range frame matches a brute-force 600-second self-join") {
    val got = StatQueries.q49RangeFrame(spark, dir)
      .select("event_id", "w_cnt").as[(Long, Long)].collect().toMap
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val want = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("b.sec").between(col("a.sec") - 600, col("a.sec")))
      .groupBy(col("a.event_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("q55 sliding windows bucket every event into exactly two windows") {
    val events = Tables.events(spark, dir)
    val r = StatQueries.q55SlidingWindow(spark, dir)
    assert(r.agg(sum(col("n"))).as[Long].head() == 2 * events.count())
    // window starts are epoch-aligned multiples of the 5-minute slide
    val misaligned = r.filter(unix_timestamp(col("w_start")) % 300 =!= 0).count()
    assert(misaligned == 0)
    // spot-check membership: every event's ts falls in [w_start, w_start+10m)
    // for both windows it maps to
    val byWindow = r.groupBy("w_start").agg(sum("n").as("n")).orderBy("w_start")
      .as[(java.sql.Timestamp, Long)].collect()
    val recomputed = events
      .select(explode(array(
        expr("timestamp_seconds((unix_timestamp(ts) div 300) * 300)"),
        expr("timestamp_seconds((unix_timestamp(ts) div 300) * 300 - 300)"))).as("w_start"))
      .groupBy("w_start").agg(count(lit(1)).as("n")).orderBy("w_start")
      .as[(java.sql.Timestamp, Long)].collect()
    assert(byWindow.toSeq == recomputed.toSeq)
  }

  test("q56 left join keeps order-less customers with NULL aggregates") {
    val r = StatQueries.q56OuterJoin(spark, dir).collect()
    assert(r.length == Tables.customer(spark, dir).count())
    val without1998 = r.filter(_.isNullAt(r.head.fieldIndex("n_1998")))
    assert(without1998.nonEmpty, "fixture should contain customers with no 1998 orders")
    // NULL rows are all-or-nothing: n_1998 and spend_1998 go null together
    r.foreach { x =>
      assert(x.isNullAt(x.fieldIndex("n_1998")) == x.isNullAt(x.fieldIndex("spend_1998")))
    }
    val n1998 = r.filter(!_.isNullAt(r.head.fieldIndex("n_1998")))
      .map(_.getAs[Long]("n_1998")).sum
    assert(n1998 == Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1998).count())
  }

  test("q57 full outer join keeps one-sided nations with NULL on the other side") {
    val r = StatQueries.q57FullOuter(spark, dir).collect()
    val iCust = r.head.fieldIndex("n_cust")
    val iSupp = r.head.fieldIndex("n_supp")
    val custOnly = r.count(x => !x.isNullAt(iCust) && x.isNullAt(iSupp))
    assert(custOnly > 0, "fixture should contain nations with no >7000-balance supplier")
    // no row may be NULL on both sides, and per-side totals reconcile
    assert(!r.exists(x => x.isNullAt(iCust) && x.isNullAt(iSupp)))
    val nCust = r.filter(!_.isNullAt(iCust)).map(_.getAs[Long]("n_cust")).sum
    assert(nCust == Tables.customer(spark, dir).filter(col("c_acctbal") > 7000).count())
    val nSupp = r.filter(!_.isNullAt(iSupp)).map(_.getAs[Long]("n_supp")).sum
    assert(nSupp == Tables.supplier(spark, dir).filter(col("s_acctbal") > 7000).count())
  }

  test("q53 exact decimal threshold partitions orders into above/not-above") {
    val r = StatQueries.q53ScalarSubquery(spark, dir)
    val nAbove = r.agg(sum(col("n_above"))).as[Long].head()
    // recompute with exact decimal arithmetic on the driver
    val o = Tables.orders(spark, dir)
      .select(col("o_totalprice").cast("decimal(18,2)").as("p")).as[java.math.BigDecimal]
      .collect()
    val total = o.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val n = java.math.BigDecimal.valueOf(o.length.toLong)
    val expected = o.count(p => p.multiply(n).compareTo(total) > 0)
    assert(nAbove == expected)
  }

  test("q48 distribution windows: quartiles valid, priciest_key is the true argmax") {
    val r = StatQueries.q48WindowDist(spark, dir).collect()
    assert(r.forall(x => (1L to 4L).contains(x.getAs[Long]("quartile"))))
    assert(r.forall { x =>
      val p = x.getAs[Double]("pct_rank"); p >= 0.0 && p <= 1.0
    })
    // last_value over the full frame = key of max (o_totalprice, o_orderkey)
    val want = Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("k"))
      .as[(String, Long)].collect().toMap
    val got = r.map(x => x.getAs[String]("o_orderstatus") -> x.getAs[Long]("priciest_key"))
      .toMap
    assert(got == want)
  }

  test("q94 distributed exact percentiles ≡ the buffered percentile function") {
    val dist = StatQueries.q94PercentileDist(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("qty_p25"), r.getAs[Double]("qty_p50"),
          r.getAs[Double]("qty_p75"))).toMap
    val buffered = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("q"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> {
        val q = r.getSeq[Double](1); (q(0), q(1), q(2))
      }).toMap
    assert(dist == buffered)
    // the scale property: no Percentile aggregation buffer, and no
    // per-group window funnel — every window is either keyed by a
    // (partition, group) SLICE (bounded by range-partition size) or
    // runs over the already-aggregated O(partitions·groups) side table.
    // sparkPlan, not executedPlan: AQE hides the tree behind an
    // AdaptiveSparkPlanExec wrapper until runtime.
    val physical = StatQueries.q94PercentileDist(spark, dir)
      .queryExecution.sparkPlan
    val plan = physical.toString
    assert(!plan.contains("percentile("), s"q94 must rank, not buffer:\n$plan")
    val windows = physical.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "rank-interval computation should be window-shaped")
    windows.foreach { w =>
      val sliceKeyed = w.partitionSpec.size >= 2
      val overSideTable = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty
      assert(sliceKeyed || overSideTable,
        s"a window funnels whole groups through one task:\n$w")
    }
  }

  test("exactPercentiles: unique values, duplicates, null groups, many partitions") {
    import graft.operators.Stats
    // adversarial shape: continuous values (distinct == rows), a null
    // group, heavy duplicates in one group — exercised across enough
    // rows that the collapsed table spans many range partitions
    val rows = (1 to 5000).map(i => ("a", i.toDouble)) ++          // unique
      (1 to 3000).map(i => ("b", (i % 7).toDouble)) ++             // 7 distinct
      (1 to 100).map(i => (null.asInstanceOf[String], i.toDouble)) // null group
    val df = rows.toDF("k", "x")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val got = Stats.exactPercentiles(df, col("k"), col("x"), ps)
      .collect()
      .map(r => (Option(r.getAs[String]("g")), r.getAs[Double]("p")) ->
        r.getAs[Double]("pct")).toMap
    val want = df.groupBy(col("k"))
      .agg(expr(s"percentile(x, array(${ps.mkString("D,")}D))").as("q"))
      .collect()
      .flatMap { r =>
        val q = r.getSeq[Double](1)
        ps.zipWithIndex.map { case (p, i) =>
          (Option(r.getAs[String]("k")), p) -> q(i)
        }
      }.toMap
    assert(got.keySet == want.keySet, "group/percentile keys differ")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"$k: got $v want ${want(k)}")
    }
  }

  test("heavyHitters: every item above n/(k+1) surfaces with its exact " +
      "count; at-threshold excluded; layout-independent; candidates bounded") {
    import graft.operators.Stats
    // planted stream, n = 1000, k = 9 → threshold n/(k+1) = 100:
    // hot (400) and warm (120) are true heavy hitters; edge sits AT the
    // threshold (strict >, so excluded); 380 cold singletons are noise
    val items = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      Seq.fill(100)("edge") ++ (1 to 380).map(i => s"cold$i")
    val df = items.toDF("item")
    val hh = Stats.heavyHitters(df, col("item"), 9)
      .as[(String, Long)].collect().toSeq
    assert(hh == Seq(("hot", 400L), ("warm", 120L)),
      s"expected exactly the two true heavy hitters with exact counts, got $hh")
    // the answer is layout-independent even though the SKETCH contents
    // are order-dependent — the exact recount absorbs the difference
    for (parts <- Seq(1, 7, 31)) {
      val r = Stats.heavyHitters(df.repartition(parts), col("item"), 9)
        .as[(String, Long)].collect().toSeq
      assert(r == hh, s"layout $parts changed the answer: $r")
    }

    // aggregator-level MG invariants, no Spark: buffer never exceeds k,
    // and the inclusion guarantee holds under an adversarial merge order
    val agg = new graft.functions.MisraGriesAggregator(9)
    val shuffled = new scala.util.Random(7).shuffle(items)
    val partitions = shuffled.grouped(97).toSeq
    val partials = partitions.map(_.foldLeft(agg.zero)(agg.reduce))
    partials.foreach(b => assert(b.size <= 9, "partial buffer exceeded k"))
    // merge right-to-left (worst case vs Spark's arbitrary fetch order)
    val merged = partials.reverse.reduce((a, b) => agg.merge(b, a))
    assert(merged.size <= 9)
    assert(merged.contains("hot") && merged.contains("warm"),
      s"MG must retain every item above n/(k+1), buffer: $merged")
    // counter underestimates by at most n/(k+1)
    assert(merged("hot") >= 400 - 100 && merged("hot") <= 400)
    assert(merged("warm") >= 120 - 100 && merged("warm") <= 120)
  }

  test("heavyHittersByGroup: per-group thresholds are independent — an " +
      "item heavy in one group never leaks into another") {
    import graft.operators.Stats
    // group A: 'hot' at 50%; group B: same token at 1% (cold there)
    val a = Seq.fill(100)(("A", "hot")) ++ (1 to 100).map(i => ("A", s"ca$i"))
    val b = Seq.fill(2)(("B", "hot")) ++ Seq.fill(80)(("B", "warm")) ++
      (1 to 118).map(i => ("B", s"cb$i"))
    val df = (a ++ b).toDF("g", "item")
    val hh = Stats.heavyHittersByGroup(df, col("g"), col("item"), 9)
      .as[(String, String, Long)].collect().toSeq
    // thresholds: each group has n_g = 200 → cutoff 20
    assert(hh == Seq(("A", "hot", 100L), ("B", "warm", 80L)),
      s"got $hh")
    // layout-independent
    assert(Stats.heavyHittersByGroup(df.repartition(17), col("g"),
      col("item"), 9).as[(String, String, Long)].collect().toSeq == hh)
  }
}
