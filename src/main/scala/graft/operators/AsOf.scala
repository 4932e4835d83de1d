package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join and event sessionization —
  * time-series operators Spark lacks as built-ins (SURVEY.md §2.3 J5
  * noted them absent in the reference; added as [EXT] rows for the
  * engine surface).
  *
  * Both are implemented as single-shuffle window passes — NOT range
  * joins: a range-condition join explodes to |L|·|R| per key before
  * filtering, while the union+sort form here is O((|L|+|R|) log) with
  * exactly one exchange on the key, which is the shape that survives
  * 100 TB.
  */
object AsOf {

  /** For each left row, attach the right row with the greatest `rightTs
    * <= leftTs` for the same key (strictly most-recent-at-or-before;
    * null columns when no such row).
    *
    * Mechanics: tag and union both sides, sort within each key by
    * (ts, side) so a right row at ts T sorts before a left row at the
    * same T, then carry the last non-null right values forward with
    * `last(_, ignoreNulls = true)` over an unbounded-preceding window,
    * and keep only left rows.
    *
    * The right side must be unique per (key, ts) — pre-aggregate it if
    * not (the as-of result is otherwise ambiguous; DuckDB's ASOF JOIN
    * has the same requirement for determinism).
    *
    * @param valueCols right-side columns to attach (by name)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    // side 0 = right, 1 = left: at equal ts the right row sorts first,
    // so "at-or-before" includes same-timestamp right rows.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val taggedRight = right
      // SQL equality never matches NULL keys: a null-key right row must
      // not donate values to null-key left rows (which the window's
      // null partition would otherwise do)
      .filter(col(key).isNotNull)
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct of all value columns: carrying each column
    // independently would stitch together values from different right
    // rows whenever a value column is null in the most recent row.
    taggedLeft.unionByName(taggedRight)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        valueCols.map(c => col(s"__r.$c").as(c))): _*)
  }

  /** Range-count join: for each left row, count right rows with the
    * same key whose timestamp falls in `[leftTs - windowSeconds,
    * leftTs)`. Left rows with no matches are kept with count 0.
    *
    * Scale shape: a naive inequality join degenerates to a per-key
    * cross product. Here both sides are bucketed to `windowSeconds`-wide
    * time bins; each left row probes its own and the previous bin (which
    * together cover the whole window), so matching is an EQUALITY join
    * on (key, bin) with an exact range filter after — per-pair work is
    * bounded by bin occupancy, not key cardinality.
    */
  def rangeCountJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                     windowSeconds: Long, countAs: String = "n_in_range"): DataFrame = {
    val binMicros = windowSeconds * 1000000L
    val leftBinned = left
      // per-row identity BEFORE the bin explode: grouping by the left
      // columns alone would collapse duplicate left rows into one output
      // row with a summed count (the id never leaves this function, so
      // its run-to-run instability is harmless)
      .withColumn("__row", monotonically_increasing_id())
      .withColumn("__bin", explode(array(
        floor(unix_micros(col(ts)) / binMicros).cast("long") - 1,
        floor(unix_micros(col(ts)) / binMicros).cast("long"))))
      .withColumn("__lts", unix_micros(col(ts)))
    val rightBinned = right
      .select(col(key), unix_micros(col(ts)).as("__rts"))
      .withColumn("__bin", floor(col("__rts") / binMicros).cast("long"))
    val leftKeys = left.columns.map(col).toSeq
    leftBinned
      .join(rightBinned, Seq(key, "__bin"), "left")
      .withColumn("__hit",
        when(col("__rts").isNotNull &&
          col("__rts") >= col("__lts") - lit(binMicros) &&
          col("__rts") < col("__lts"), 1L).otherwise(0L))
      .groupBy((leftKeys :+ col("__row")): _*)
      .agg(sum(col("__hit")).as(countAs))
      .drop("__row")
  }

  /** Assign session ids within each key: a new session starts when the
    * gap to the previous event exceeds `gapSeconds`. `session_seq` is
    * the per-key session ordinal (1-based, in time order) — deterministic
    * given the data, but an ordinal: filtering the input shifts it, so
    * join sessions across runs on (key, min(ts)) aggregates, not on the
    * ordinal.
    *
    * One window pass: lag to mark session starts, running sum of the
    * marker to number sessions.
    */
  def sessionize(events: DataFrame, key: Column, ts: Column, gapSeconds: Long,
                 tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.asc +: tieBreak.map(_.asc): _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // gaps in microseconds: unix_micros is exact on TimestampType, so
    // both engines compare the same integers (second-truncation would
    // diverge from an oracle computing fractional-second gaps).
    events
      .withColumn("__prev_ts", lag(ts, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_micros(ts) - unix_micros(col("__prev_ts")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(cum))
      .drop("__prev_ts", "__new_session")
  }
}
