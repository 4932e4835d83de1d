package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982) as a typed
  * Aggregator — the classic mergeable frequency summary beside HLL
  * (distinct counts) and KLL-ish quantiles: at most `k` counters per
  * buffer at EVERY stage, so map-side partial aggregation bounds both
  * memory and shuffle to k entries per partition however large the
  * stream.
  *
  * Guarantees (the textbook ones, preserved under merging — Agarwal et
  * al., "Mergeable Summaries", PODS 2012):
  *  - every item with true count > n/(k+1) is IN the sketch
  *    (n = total items seen);
  *  - each surviving counter underestimates its item's true count by at
  *    most n/(k+1).
  *
  * The sketch CONTENTS (which sub-threshold items ride along, and the
  * exact counter values) depend on arrival and merge order — Spark's
  * shuffle-fetch order is nondeterministic, so consumers that need a
  * deterministic answer must treat the output as a CANDIDATE set and
  * recount it exactly ([[graft.operators.Stats.heavyHitters]], the
  * standard two-pass composition). What IS order-independent is the
  * inclusion guarantee above, and that is what the two-pass form
  * builds on.
  *
  * `finish` emits entries sorted (count desc, item asc).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, "Misra-Gries needs k >= 1 counters")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < k => buf.updated(v, 1L)
      case None =>
        // the decrement step: every counter pays one, zeros evicted —
        // O(k), amortized O(1) per stream item (each decrement round
        // cancels k+1 arrivals)
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  /** Mergeable-summaries merge: sum counts, and if more than k counters
    * survive, subtract the (k+1)-th largest count from all (the batch
    * form of the decrement step) and drop non-positives. Error bounds
    * add: err ≤ (n₁ + n₂)/(k+1).
    */
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val combined = y.foldLeft(x) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (i, c) =>
        if (c > cut) Some(i -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
