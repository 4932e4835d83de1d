package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.operators.NearDup

/** Typed UDAF surface (SURVEY.md §2.9 U2): the MinHash signature as an
  * `Aggregator[IN, BUF, OUT]` over exploded shingle hashes.
  *
  * This is the 100 TB-layout companion to
  * [[graft.operators.NearDup.minhashSignature]] (the array-expression
  * form): when a document's shingle set is stored EXPLODED — one
  * (doc_id, shingle_hash) row per shingle, the layout that partitions
  * cleanly when single documents are huge — the signature is computed by
  * `groupBy(doc_id).agg(udaf(new MinHashAggregator(n))(col))` with
  * map-side partial aggregation (`reduce`) and shuffle-side `merge`,
  * instead of collecting the shingles back into an array first.
  *
  * Both forms share [[NearDup.permCoefs]] (fixed seed), so signatures
  * are interchangeable; the equivalence is pinned in MinHashAggSpec.
  *
  * Input values must already be reduced mod [[NearDup.P]] (as
  * `pmod(xxhash64(shingle), P)` produces).
  */
class MinHashAggregator(nPerms: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val coefs = NearDup.permCoefs(nPerms)

  override def zero: Array[Long] = Array.fill(nPerms)(NearDup.P)

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    var i = 0
    while (i < nPerms) {
      val (a, b) = coefs(i)
      val h = java.lang.Math.floorMod(hash * a + b, NearDup.P)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nPerms) {
      if (y(i) < x(i)) x(i) = y(i)
      i += 1
    }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
