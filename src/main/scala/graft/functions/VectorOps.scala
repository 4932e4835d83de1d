package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order array functions (zip_with/aggregate/transform) so the
  * whole computation stays inside Catalyst — no UDF round-trips, and
  * the fold order is the same sequential left-fold DuckDB's list
  * functions use, which keeps cross-engine doubles bit-identical.
  *
  * All math is done in DOUBLE regardless of the storage type (float32
  * storage halves the 100 TB footprint; float64 math keeps ranking
  * stable).
  */
object VectorOps {

  /** array<float> → array<double>. */
  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two float/double arrays — a native codegen'd
    * Catalyst expression ([[graft.plans.DotProductExpr]]): one fused
    * loop, no intermediate arrays, stays inside whole-stage codegen.
    * Same sequential left-fold accumulation (in double) as the
    * higher-order-function form it replaced, so results are
    * bit-identical.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** The pre-native HOF form, kept for differential testing. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Integer dot of two array<int> code columns → BIGINT
    * ([[graft.plans.IntDotProductExpr]]): the SQ8 scoring kernel, exact
    * long accumulation with no per-pair widening to double arrays.
    */
  def dotInt(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.IntDotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Squared L2 norm (kept un-rooted so callers can defer the sqrt). */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity of two double arrays (not pre-normalized). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine when squared norms are precomputed columns — the join-side
    * form: norms are computed once per row before the pair join instead
    * of once per pair.
    */
  def cosineWithNorms(a: Column, b: Column, aNormSq: Column, bNormSq: Column): Column =
    dot(a, b) / (sqrt(aNormSq) * sqrt(bNormSq))
}
