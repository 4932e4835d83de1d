package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator (SURVEY.md §2.9 U2) —
  * the SCALE form of [[graft.operators.Ranking.topPerGroup]]: the
  * window form shuffles EVERY row of every group to rank them; this
  * aggregator keeps at most k (measure, id) pairs in its buffer at
  * every stage, so map-side partial aggregation bounds the shuffle to
  * k rows per group per partition. At 100 TB a top-3-per-segment over
  * a fact table moves O(k · partitions · groups) rows instead of the
  * whole table.
  *
  * Ordering: measure DESC, then id ASC (the deterministic tie-break
  * every top-k in this engine uses). `finish` emits the buffer already
  * sorted, rank 1 first.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "top-k needs k >= 1")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  // INVARIANT: every buffer is sorted best-first (zero trivially; reduce
  // inserts in place; merge interleaves two sorted runs) — so inserts
  // are a binary search + splice, O(log k + k) per row, not the
  // O(k log k) re-sort of the first cut (which is quadratic-ish pain at
  // k=1000, see SkewAggSpec's property case).

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
                      v: (Double, Long)): Seq[(Double, Long)] =
    // cheap pre-filter: a full buffer whose worst entry beats v is
    // unchanged (the common case on sorted-ish data)
    if (buf.size == k && better(buf.last, v)) buf
    else {
      val b = buf.toIndexedSeq
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(b(mid), v)) lo = mid + 1 else hi = mid
      }
      val out = (b.take(lo) :+ v) ++ b.drop(lo)
      if (out.length > k) out.take(k) else out
    }

  override def merge(x: Seq[(Double, Long)],
                     y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val a = x.toIndexedSeq
    val b = y.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
