package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over edge DataFrames — the transitive
  * closure step a dedup pipeline needs AFTER pair generation: near-dup
  * PAIRS (MinHash/SimHash/Jaccard/edit-distance) become dedup CLUSTERS,
  * and one representative survives per cluster.
  */
object Graph {

  /** Connected components by min-label propagation: every node
    * repeatedly adopts the smallest label among itself and its
    * neighbors until a fixpoint. Converges in O(component diameter)
    * rounds — near-dup clusters are shallow (dups of a common original),
    * so few iterations in practice, with `maxIter` as the backstop.
    *
    * Each round is one shuffle join + aggregation; the per-round
    * `changed` count is the only driver-side value (a scalar action for
    * loop control — the same shape GraphFrames' CC uses). Output:
    * (node, component) where component = min node id of the component.
    *
    * THROWS if the fixpoint is not reached within `maxIter` rounds:
    * partially propagated labels are silently WRONG clusters (every
    * dedup consumer would keep too many "representatives"), so
    * non-convergence is an error, never a result. Components converge
    * in O(diameter) rounds — raise `maxIter` for deep path-shaped
    * graphs (the exception says how far propagation got).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.toDF("s", "d")
      .unionByName(edges.toDF("d", "s").select(col("s"), col("d")))
      .distinct()
      .persist()
    // Lineage MUST be cut every round: the updated plan references the
    // previous labels twice (once through the neighbor join, once for
    // the carry-over), so an uncheckpointed loop doubles the plan per
    // iteration — exponential analysis/planning cost that OOMs around a
    // dozen rounds. localCheckpoint materializes the round's result and
    // restarts the plan from the stored blocks (the standard shape for
    // iterative algorithms on Spark; GraphX/GraphFrames do the same).
    var labels = nodes.toDF("node")
      .withColumn("label", col("node"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    var lastChanged = 0L
    while (!converged && iter < maxIter) {
      val neighborMin = sym.join(labels, sym("d") === labels("node"))
        .groupBy(sym("s").as("nbr_node"))
        .agg(min(col("label")).as("nmin"))
      // The changed? flag rides the update projection itself, so
      // convergence is an aggregate of the SAME pass that produces the
      // new labels: the count below is the round's ONE action — it
      // materializes the lazily-marked checkpoint (per-partition, as the
      // scan computes) and tallies changes in the same job. No second
      // join against the previous labels, no second shuffle per round.
      val updated = labels
        .join(neighborMin, labels("node") === neighborMin("nbr_node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          coalesce(col("nmin") < col("label"), lit(false)).as("changed"))
        .localCheckpoint(eager = false)
      val changed = updated.filter(col("changed")).count()
      labels = updated.select(col("node"), col("label"))
      lastChanged = changed
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter iterations " +
          s"($lastChanged labels still changing) — partial labels would be " +
          s"WRONG clusters; raise maxIter above the component diameter")
    labels.withColumnRenamed("label", "component")
  }

  /** PageRank (Brin & Page 1998), fixed-iteration form — the
    * link-importance signal web-corpus curation stacks weight documents
    * by (Common Crawl's host ranking; CCNet/RefinedWeb-style quality
    * priors): r'(v) = (1 − d) + d · (Σ_{u→v} r(u)/outdeg(u) + D/|V|),
    * starting from r = 1, where D = Σ_{dangling u} r(u) is the mass of
    * nodes with NO out-edges, redistributed uniformly each round (the
    * standard dangling-node treatment). On a real web/host graph —
    * this operator's stated use case — dangling pages are endemic, and
    * without the D term ranks systematically deflate; with it the total
    * Σr = |V| is conserved exactly: Σr' = |V|(1−d) + d·Σr. The D/|V|
    * factor rides ONE 1-row broadcast per iteration (dangling sum ×
    * node count, both DECIMAL-safe), so the per-round plan shape is
    * unchanged. A graph where every node has out-edges gets D = 0 and
    * bit-identical ranks to the plain damping form.
    *
    * Shape per iteration: ONE shuffle (the contribution aggregation) —
    * the edge table is staged once with out-degrees attached, each
    * round joins it to the current rank vector and re-aggregates by
    * destination; rounds are `localCheckpoint`ed (the
    * [[connectedComponents]] lineage discipline), and the whole loop
    * runs exactly `iters` times with NO driver-side data values.
    *
    * Deterministic and cross-engine replayable: per-destination
    * contribution sums ride DECIMAL(27,10) (order-independent), so
    * after any number of iterations the double ranks are bit-identical
    * in any engine — a chained-CTE SQL replay hash-matches (q154).
    *
    * Output: (id, pr).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iters: Int = 5, d: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val out = edges.toDF("src", "dst")
      .groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // The edge table is LOOP-INVARIANT, so it gets the [[connectedComponents]]
    // sym treatment — persist(), NOT localCheckpoint: a checkpoint would
    // erase the hash partitioning on src, and every round's rank join
    // would re-shuffle the FULL edge table (measured ~25% slower at
    // sf0.1 with ~1M edges; at graph scale it is iters extra edge
    // shuffles). Partitioned-and-persisted, each round shuffles only
    // the node-sized rank vector to meet it. (r17 note: staging the
    // cached partitions SORTED on src — hoping each round's SMJ would
    // reuse the order — measured +0.9 s on q154 / +0.3 s on q157 over
    // two boots; the cached columnar scan does not repay the staging
    // sort here, so the unsorted form stays.)
    val e = edges.toDF("src", "dst").join(out, Seq("src"))
      .repartition(col("src"))
      .persist()
    val ids = nodes.toDF("id").localCheckpoint(eager = false)
    // loop-invariant: which nodes are dangling (no out-edge), and |V|.
    // The dangling verdict rides the rank vector as a FLAG (r17): each
    // round's dangling mass is then a filter+sum over the round's own
    // checkpoint instead of a semi-join against a separate table — one
    // join and one broadcast build fewer per iteration, same DECIMAL
    // sum over the same rows.
    val nV = ids.agg(count(lit(1)).cast("double").as("n_v"))
      .localCheckpoint(eager = false)
    var ranks = ids
      .join(out.select(col("src").as("id"), lit(true).as("__o")), Seq("id"),
        "left")
      .select(col("id"), col("__o").isNull.as("dang"))
      .withColumn("pr", lit(1.0))
      .localCheckpoint(eager = false)
    for (i <- 1 to iters) {
      val dm = ranks.filter(col("dang"))
        .agg(coalesce(sum(col("pr").cast("decimal(27,10)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(27,10)")).as("dmass"))
        .crossJoin(broadcast(nV))
        .select((col("dmass").cast("double") / col("n_v")).as("dshare"))
      val contrib = e.join(ranks, e("src") === ranks("id"))
        .select(e("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
      ranks = ranks.select(col("id"), col("dang"))
        .join(contrib.groupBy(col("id"))
            .agg(sum(col("c").cast("decimal(27,10)")).as("s")),
          Seq("id"), "left")
        .crossJoin(broadcast(dm))
        .select(col("id"), col("dang"),
          (lit(1.0 - d) +
            lit(d) * (coalesce(col("s").cast("double"), lit(0.0)) +
              col("dshare"))).as("pr"))
        // final round EAGER: materialize the result while the persisted
        // edge table is still alive, so unpersisting below can never
        // force a from-scratch recompute in the caller's first action
        .localCheckpoint(eager = i == iters)
    }
    e.unpersist()
    ranks.select(col("id"), col("pr"))
  }

  /** PageRank run to CONVERGENCE instead of a fixed round count: stops
    * when the largest per-node change |pr' − pr| falls below `tol`
    * (L∞ — the classic power-iteration stop), with `maxIter` as the
    * [[connectedComponents]]-style backstop that THROWS rather than
    * return a half-converged ranking. The per-round max-delta is the
    * round's one driver-side scalar, tallied in the SAME action that
    * materializes the round's checkpoint — no second pass. Semantics
    * per round are identical to [[pageRank]] (dangling mass folded
    * back), so `pageRankUntil(tol = 0)` after n stable rounds equals
    * `pageRank(iters = n)` bit for bit.
    */
  def pageRankUntil(nodes: DataFrame, edges: DataFrame, tol: Double = 1e-6,
                    maxIter: Int = 50, d: Double = 0.85): DataFrame = {
    require(tol >= 0, s"tol must be non-negative, got $tol")
    val out = edges.toDF("src", "dst")
      .groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.toDF("src", "dst").join(out, Seq("src"))
      .repartition(col("src"))
      .persist()
    val ids = nodes.toDF("id").localCheckpoint(eager = false)
    val nV = ids.agg(count(lit(1)).cast("double").as("n_v"))
      .localCheckpoint(eager = false)
    // dangling flag rides the rank vector — the [[pageRank]] shape
    var ranks = ids
      .join(out.select(col("src").as("id"), lit(true).as("__o")), Seq("id"),
        "left")
      .select(col("id"), col("__o").isNull.as("dang"))
      .withColumn("pr", lit(1.0))
      .localCheckpoint(eager = false)
    var iter = 0
    var unsettled = Long.MaxValue
    while (unsettled > 0 && iter < maxIter) {
      val dm = ranks.filter(col("dang"))
        .agg(coalesce(sum(col("pr").cast("decimal(27,10)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(27,10)")).as("dmass"))
        .crossJoin(broadcast(nV))
        .select((col("dmass").cast("double") / col("n_v")).as("dshare"))
      val updated = ranks.withColumnRenamed("pr", "pr_prev")
        .join(e.join(ranks, e("src") === ranks("id"))
            .select(e("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
            .groupBy(col("id"))
            .agg(sum(col("c").cast("decimal(27,10)")).as("s")),
          Seq("id"), "left")
        .crossJoin(broadcast(dm))
        .select(col("id"), col("dang"), col("pr_prev"),
          (lit(1.0 - d) +
            lit(d) * (coalesce(col("s").cast("double"), lit(0.0)) +
              col("dshare"))).as("pr"))
        .localCheckpoint(eager = false)
      // the convergence tally IS the action that materializes the
      // round's checkpoint (the connectedComponents discipline): one
      // job per round, loop control is a count, never collected data
      unsettled = updated.filter(abs(col("pr") - col("pr_prev")) > tol).count()
      ranks = updated.select(col("id"), col("dang"), col("pr"))
      iter += 1
    }
    e.unpersist()
    if (unsettled > 0)
      throw new IllegalStateException(
        s"pageRankUntil: no convergence after $maxIter iterations " +
          s"($unsettled nodes still moving more than tol = $tol) — a " +
          "half-converged ranking would silently misweight documents; " +
          "raise maxIter or tol")
    ranks.select(col("id"), col("pr"))
  }
}
