package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd MinHash signature over an `array<long>` of shingle hashes
  * (SURVEY.md §2.4 A8). The higher-order-function fold
  * (`aggregate(…, zip_with(…))`) it replaces is a CodegenFallback: every
  * shingle allocates an nPerms-element index sequence plus a zipped
  * array, all evaluated interpreted. Here the whole sketch is one fused
  * pair of loops over a stack `long[]` — no allocation per element, and
  * the expression participates in whole-stage codegen.
  *
  * `coefsA`/`coefsB` are baked into the generated code as class-level
  * array fields (one instance per codegen'd class, not per row).
  *
  * Semantics (identical to NearDup.minhashSignatureFromHashes):
  * sig[i] = min over shingles h of ((h mod P) * a_i + b_i) mod P, with
  * empty input → all-P signature, null input → null. Null elements are
  * skipped (shingle hash arrays never contain nulls).
  */
case class MinHashSignatureExpr(child: Expression, coefsA: Seq[Long], coefsB: Seq[Long])
    extends UnaryExpression {

  private val P = 2147483647L
  private def nPerms = coefsA.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if coefsA.length == coefsB.length && coefsA.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure("coefsA and coefsB must be non-empty and equal-length")
    case dt =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(nPerms)(P)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = java.lang.Math.floorMod(arr.getLong(j), P)
        var i = 0
        while (i < nPerms) {
          val v = java.lang.Math.floorMod(h * coefsA(i) + coefsB(i), P)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aField = ctx.addReferenceObj("minhashCoefsA", coefsA.toArray, "long[]")
    val bField = ctx.addReferenceObj("minhashCoefsB", coefsB.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$nPerms];
         |java.util.Arrays.fill($mins, ${P}L);
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    long $h = java.lang.Math.floorMod($arr.getLong($j), ${P}L);
         |    for (int $i = 0; $i < $nPerms; $i++) {
         |      long $v = java.lang.Math.floorMod($h * $aField[$i] + $bField[$i], ${P}L);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash over an `array<long>` of token hashes: bit k
  * of the output is the sign of Σ_tokens (±1 by bit k of the token
  * hash). Replaces a per-token 64-element zip_with fold (interpreted,
  * one array allocation per token) with two fused loops over a stack
  * `int[64]`. Null elements are skipped; null array → null.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    long $h = $arr.getLong($j);
         |    for (int $k = 0; $k < 64; $k++) {
         |      if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
