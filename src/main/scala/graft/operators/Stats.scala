package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical operators.
  *
  * [[exactPercentiles]] is the EXACT-percentile scale path: Spark's
  * `percentile` (and DuckDB's `quantile_cont`) buffer every group value
  * in one aggregation buffer — per-group memory grows with the data, an
  * executor OOM by design at 100 TB. A per-group rank window
  * (`Window.partitionBy(g).orderBy(v)`) fixes memory but not
  * parallelism: it funnels each group through ONE task, so 100 TB
  * across 3 groups sorts ~33 TB per task (measured: the round-5 form
  * was the slowest query in the suite, 35× DuckDB at sf0.1). This form
  * keeps exact interpolated semantics with every core busy and only one
  * full pass over the data:
  *
  *   1. ONE full scan, collapsed by a hash aggregation to distinct
  *      (group, value) rows with multiplicities — map-side partial
  *      combine makes the shuffle O(distinct), and every later step
  *      runs on this collapsed table;
  *   2. a range shuffle on (group, value) places contiguous value
  *      slices on partitions — a big group spans MANY partitions, so
  *      no task ever owns a whole group;
  *   3. weighted cumulative counts within each (partition, group)
  *      slice + cross-slice offsets from an O(partitions·groups)
  *      side table give every distinct value its exact global rank
  *      interval, and an aggregation over only the interval-boundary
  *      rows interpolates the answer.
  *
  * The collapsed table is materialized once via `localCheckpoint`
  * (same device as [[Graph]]'s per-round checkpoint and the
  * zipWithIndex partition-count exchange in [[Ids]]): range-partition
  * boundaries are SAMPLED, so two independent executions of the same
  * range exchange may disagree on partition assignment — the slice
  * offsets and the rank join must read the SAME physical placement,
  * which only a materialization point guarantees. The checkpoint is
  * O(distinct(group, value)) — bounded by the input projected to two
  * columns in the worst case (all values unique), typically orders of
  * magnitude smaller; storage is disk-backed, shuffle-comparable.
  * Construction is therefore eager (it runs the collapse + placement
  * jobs); timing the operator includes them by design.
  */
object Stats {

  /** Exact interpolated percentiles (quantile_cont semantics: target
    * rank `1 + p·(n−1)`, linear interpolation between the two bounding
    * ranks) per group, one output row per (group, p). Null values are
    * ignored, matching `percentile` / `quantile_cont`. Null GROUPS are
    * kept (null-safe rank join), matching SQL GROUP BY.
    *
    * Duplicate values collapse to one row covering the rank interval
    * (cum_lo, cum_hi]; a boundary rank inside the interval reads the
    * same value a row-number form would, so results are identical to
    * the uncollapsed sort — and deterministic, because the collapsed
    * (group, value) rows are unique (no tie order exists at all).
    */
  /** Exact global rank interval per distinct (group, value): one row
    * per distinct value with (cum_lo, cum_hi] — the ranks it covers —
    * and the group total n. The shared core of both percentile forms.
    *
    * `boundaryPs`: the percentile fractions the caller will read.
    * Both forms only consume rows whose interval covers a target rank
    * t(p) = 1 + p·(n−1) (floor or ceil), and a row's interval is
    * contained in its slice's global rank range — so every slice whose
    * range contains NO target rank is dropped BEFORE the cumulative
    * window. Group totals still fold over ALL slices (the side table),
    * so the pruning is invisible to the arithmetic; it just shrinks
    * the window + join input from O(distinct) rows to the boundary
    * slices (O(|groups|·|ps|) of them — at 10k partitions, ~all of the
    * post-collapse work disappears).
    */
  private def rankIntervals(df: DataFrame, group: Column, value: Column,
                            boundaryPs: Seq[Double]): DataFrame = {
    val base = df.select(group.as("g"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)

    // 1. the ONLY full-data pass: collapse to weighted distinct rows.
    // Checkpointed so the range sampler and the range shuffle don't
    // each rescan the input (measured: dropping this checkpoint and
    // letting shuffle reuse re-run the reduce agg is ~25% SLOWER at
    // sf0.1 — round 8).
    val counts = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()

    // 2. contiguous (g, v) slices, partition id stamped, materialized
    // ONCE — both consumers below must agree on the sampled placement.
    val ranged = counts
      .repartitionByRange(col("g"), col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()

    // Cross-slice offsets + group totals from the O(partitions·groups)
    // side table; the only windows over it are tiny by construction.
    val slices = ranged.groupBy(col("pid"), col("g"))
      .agg(sum(col("cnt")).as("scnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("pid"))
    val offsets = slices.select(col("pid").as("o_pid"), col("g").as("o_g"),
      col("scnt"),
      coalesce(sum(col("scnt"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("off"),
      sum(col("scnt"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("n"))

    // Boundary-slice pruning: keep a slice iff some target rank lands
    // in its global range (off, off + scnt]. Every rank in [1, n] is
    // covered by exactly one slice, so each (group, p) survives.
    val inSlice = (k: Column) => k > col("off") && k <= col("off") + col("scnt")
    val keep = boundaryPs.map { p =>
      val t = lit(1.0) + lit(p) * (col("n") - lit(1))
      inSlice(floor(t)) || inSlice(ceil(t))
    }.reduce(_ || _)
    val cells = offsets.filter(keep).drop("scnt")

    // 3. weighted running count within the surviving slices, then pure
    // arithmetic. The offsets join moved BEFORE the window (round 8):
    // RangePartitioning(g, v) cannot satisfy the window's (pid, g)
    // clustering, so this window is a shuffle — pruning first means it
    // moves only boundary-slice rows, not the whole collapsed table.
    // The window key is (partition, group) — a slice, bounded by
    // range-partition size, NEVER a whole group — parallel at any
    // scale.
    val slice = Window.partitionBy(col("pid"), col("g")).orderBy(col("v"))
    ranged
      .join(broadcast(cells),
        col("pid") === col("o_pid") && col("g") <=> col("o_g"))
      .withColumn("cum_in_slice",
        sum(col("cnt"))
          .over(slice.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("v"),
        (col("off") + col("cum_in_slice") - col("cnt")).as("cum_lo"),
        (col("off") + col("cum_in_slice")).as("cum_hi"),
        col("n"))
  }

  private def covers(k: Column): Column =
    k > col("cum_lo") && k <= col("cum_hi")

  /** Long form: one output row per (group, p) with columns (g, p, pct). */
  def exactPercentiles(df: DataFrame, group: Column, value: Column,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    rankIntervals(df, group, value, ps)
      .select(col("g"), col("v"), col("cum_lo"), col("cum_hi"), col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("t", lit(1.0) + col("p") * (col("n") - lit(1)))
      // only the interval-boundary rows per (group, p) survive — the
      // aggregation input is O(|groups|·|ps|), not O(distinct)
      .filter(covers(floor(col("t"))) || covers(ceil(col("t"))))
      .groupBy(col("g"), col("p"))
      .agg(
        min(when(covers(floor(col("t"))), col("v"))).as("vlo"),
        min(when(covers(ceil(col("t"))), col("v"))).as("vhi"),
        min(col("t")).as("t"))
      .select(col("g"), col("p"),
        (col("vlo") + (col("t") - floor(col("t"))) * (col("vhi") - col("vlo")))
          .as("pct"))
  }

  /** Wide form: one output row per group, one named column per p —
    * the report shape. ps is static, so the explode + per-(g, p)
    * aggregation of the long form fold into ONE grouped aggregation
    * (two fewer shuffles; at bench scale the tail is pure stage
    * latency, at 100 TB the filter still reduces the input to
    * O(|groups|·|ps|) boundary rows before the only exchange).
    */
  def exactPercentilesWide(df: DataFrame, group: Column, value: Column,
                           ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    require(names.length == ps.length, "one output name per percentile")
    def t(p: Double): Column = lit(1.0) + lit(p) * (col("n") - lit(1))
    val boundary = ps.map(p => covers(floor(t(p))) || covers(ceil(t(p))))
      .reduce(_ || _)
    val aggs = ps.zipWithIndex.flatMap { case (p, i) => Seq(
      min(when(covers(floor(t(p))), col("v"))).as(s"_vlo$i"),
      min(when(covers(ceil(t(p))), col("v"))).as(s"_vhi$i"),
      min(t(p)).as(s"_t$i"))
    }
    val outs = ps.indices.map { i =>
      (col(s"_vlo$i") + (col(s"_t$i") - floor(col(s"_t$i"))) *
        (col(s"_vhi$i") - col(s"_vlo$i"))).as(names(i))
    }
    rankIntervals(df, group, value, ps)
      .filter(boundary)
      .groupBy(col("g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("g") +: outs: _*)
  }

  /** HEAVY HITTERS, two-pass (Misra–Gries candidates + exact recount) —
    * every item whose true count exceeds n/(k+1), with its EXACT count.
    * Pass 1 sketches the stream at k bounded counters per partition
    * ([[graft.functions.MisraGriesAggregator]] — map-side partials, a
    * k-entry shuffle); the MG guarantee says the surviving candidate
    * set CONTAINS every true heavy hitter, whatever the arrival/merge
    * order. Pass 2 recounts ONLY the ≤ k candidates exactly (they ride
    * a broadcast equality join onto a second scan — the corpus-wide
    * groupBy over ALL distinct items never happens), and the threshold
    * filter `count·(k+1) > n` runs on exact integers. The recount is
    * what makes the output DETERMINISTIC (sketch contents are
    * order-dependent; the recounted answer is not) — and therefore
    * SQL-replayable, unlike the raw sketch.
    *
    * Output: (item, n_occ) for true heavy hitters, count desc, item asc.
    */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k > 0, s"heavy hitters need k >= 1, got $k")
    val items = df.select(item.cast("string").as("item"))
    val mg = udaf(new graft.functions.MisraGriesAggregator(k),
      org.apache.spark.sql.Encoders.STRING)
    val cands = items.agg(mg(col("item")).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c._1").as("item"))
    val total = items.agg(count(lit(1)).as("n_total"))
    items.join(broadcast(cands), Seq("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_occ"))
      .crossJoin(broadcast(total))
      .filter(col("n_occ") * lit(k + 1L) > col("n_total"))
      .select(col("item"), col("n_occ"))
      .orderBy(col("n_occ").desc, col("item").asc)
  }

  /** [[heavyHitters]] PER GROUP — per-domain/per-source top tokens, the
    * report a mixture designer reads: every (group, item) whose count
    * exceeds that group's n_g/(k+1). Pass 1 is ONE grouped aggregation
    * whose buffers stay k-bounded on every partial (the aggregator's
    * map-side merge — the shuffle carries ≤ k entries per group per
    * partition, never the items); pass 2 recounts the exploded
    * candidates via a broadcast equality join on (group, item) and
    * filters against per-group totals. Deterministic for the same
    * reason as the global form. Output: (g, item, n_occ).
    */
  def heavyHittersByGroup(df: DataFrame, group: Column, item: Column,
                          k: Int): DataFrame = {
    require(k > 0, s"heavy hitters need k >= 1, got $k")
    val base = df.select(group.as("g"), item.cast("string").as("item"))
    val mg = udaf(new graft.functions.MisraGriesAggregator(k),
      org.apache.spark.sql.Encoders.STRING)
    val cands = base.groupBy(col("g")).agg(mg(col("item")).as("sk"))
      .select(col("g"), explode(col("sk")).as("c"))
      .select(col("g"), col("c._1").as("item"))
    val totals = base.groupBy(col("g")).agg(count(lit(1)).as("n_g"))
    base.join(broadcast(cands), Seq("g", "item"))
      .groupBy(col("g"), col("item")).agg(count(lit(1)).as("n_occ"))
      .join(broadcast(totals), Seq("g"))
      .filter(col("n_occ") * lit(k + 1L) > col("n_g"))
      .select(col("g"), col("item"), col("n_occ"))
      .orderBy(col("g").asc, col("n_occ").desc, col("item").asc)
  }
}
