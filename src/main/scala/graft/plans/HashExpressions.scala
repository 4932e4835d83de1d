package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static md5-prefix hashing for the cross-engine hash family
  * (NearDup.tokenHash63 / shingleHashes3Md5): digest bytes are consumed
  * directly, where the Column-DSL form materializes a 32-char hex
  * string per token and re-parses 8 of its chars through `conv` — two
  * allocations and a base-16 parse per token that disappear here.
  * One `MessageDigest` per thread (reset per call), zero per-row
  * allocation beyond the digest's own 16-byte output.
  */
object Md5Hash {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 digest bytes as an unsigned 32-bit value — exactly
    * `conv(substring(md5(s), 1, 8), 16, 10)`.
    */
  def prefix32(s: UTF8String): Long = {
    val d = local.get(); d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** The 63-bit token hash: (prefix32 mod 2³¹)·2³² + bytes[4..8) —
    * exactly NearDup.tokenHash63, one digest instead of two.
    */
  def hash63(s: UTF8String): Long = {
    val d = local.get(); d.reset()
    val h = d.digest(s.getBytes)
    val a = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    val b = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) | ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    (a % 2147483648L) * 4294967296L + b
  }
}

/** Per-element md5 hashing of an `array<string>` in one fused loop.
  *
  * The Column-DSL form (`transform(tokens, t => …md5…)`) evaluates the
  * lambda INTERPRETED per element (higher-order functions are
  * CodegenFallback) and allocates a hex string per token; this
  * expression is a plain codegen'd loop calling [[Md5Hash]] statics.
  *
  * `mod63 = false`: element i = prefix32(t[i]) mod `modulus` — the
  * shingleHashes3Md5 token hash (modulus = P).
  * `mod63 = true`: element i = hash63(t[i]) (modulus ignored) — the
  * simhash64Md5 token hash.
  *
  * Null elements hash to null; null array → null. Semantics match the
  * HOF forms bit-for-bit (the DuckDB oracle replays both).
  */
case class Md5TokenHashesExpr(child: Expression, modulus: Long, mod63: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if mod63 || modulus > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("modulus must be positive")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        out(i) = if (mod63) Md5Hash.hash63(s) else Md5Hash.prefix32(s) % modulus
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val hashCall =
        if (mod63) s"graft.plans.Md5Hash.hash63($arr.getUTF8String($i))"
        else s"graft.plans.Md5Hash.prefix32($arr.getUTF8String($i)) % ${modulus}L"
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $out[$i] = $hashCall;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5TokenHashesExpr =
    copy(child = newChild)
}

/** Distinct 3-gram polynomial shingle roll over an `array<long>` of
  * token hashes in [0, P): s[i] = ((h[i]·K + h[i+1]) mod P · K + h[i+2])
  * mod P, first-occurrence distinct, <3 tokens → empty. One codegen'd
  * loop + hash set, replacing two interpreted zip_with folds plus
  * array_distinct (each of which allocates per element). Every
  * intermediate stays under 2⁵² — the strict-BIGINT bound that lets the
  * DuckDB oracle replay the roll. Null elements are treated as absent
  * (token-hash arrays never contain nulls); null array → null.
  *
  * `distinct = false` keeps every 3-gram INSTANCE in token order
  * (element i is the shingle starting at token i), the form the
  * span-level dup signals need: positions survive a `posexplode`.
  */
case class ShingleRoll3Expr(child: Expression, modulus: Long, k: Long,
                            distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if modulus > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure("modulus and k must be positive")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_roll3"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long](n)
      var i = 0
      while (i + 2 < n) {
        val s = ((arr.getLong(i) * k + arr.getLong(i + 1)) % modulus * k +
          arr.getLong(i + 2)) % modulus
        seen.add(s)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n - 2)
      var i = 0
      while (i + 2 < n) {
        out(i) = ((arr.getLong(i) * k + arr.getLong(i + 1)) % modulus * k +
          arr.getLong(i + 2)) % modulus
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val it = ctx.freshName("it")
      val fill =
        if (distinct)
          s"""
             |  java.util.LinkedHashSet<Long> $seen = new java.util.LinkedHashSet<Long>($n);
             |  for (int $i = 0; $i + 2 < $n; $i++) {
             |    long $s = (($arr.getLong($i) * ${k}L + $arr.getLong($i + 1)) % ${modulus}L
             |      * ${k}L + $arr.getLong($i + 2)) % ${modulus}L;
             |    $seen.add($s);
             |  }
             |  $out = new long[$seen.size()];
             |  int $j = 0;
             |  for (java.util.Iterator<Long> $it = $seen.iterator(); $it.hasNext(); $j++) {
             |    $out[$j] = ((Long) $it.next()).longValue();
             |  }
           """.stripMargin
        else
          s"""
             |  $out = new long[$n - 2];
             |  for (int $i = 0; $i + 2 < $n; $i++) {
             |    $out[$i] = (($arr.getLong($i) * ${k}L + $arr.getLong($i + 1)) % ${modulus}L
             |      * ${k}L + $arr.getLong($i + 2)) % ${modulus}L;
             |  }
           """.stripMargin
      s"""
         |int $n = $arr.numElements();
         |long[] $out;
         |if ($n < 3) {
         |  $out = new long[0];
         |} else {
         |$fill
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleRoll3Expr =
    copy(child = newChild)
}

/** Adjacent-pair polynomial roll over an `array<long>` of token hashes
  * in [0, P): element i = (h[i]·K + h[i+1]) mod P, instances in token
  * order, <2 tokens → empty. The bigram-key twin of
  * [[ShingleRoll3Expr]] (the corpus-LM model space): one codegen'd
  * loop, replacing an interpreted zip_with lambda (higher-order
  * functions are CodegenFallback). Every intermediate stays under 2⁵²
  * — the strict-BIGINT bound the DuckDB oracle replays. Null array →
  * null; token-hash arrays never contain null elements.
  */
case class PairRollExpr(child: Expression, modulus: Long, k: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if modulus > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure("modulus and k must be positive")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pair_roll"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 1)
    var i = 0
    while (i + 1 < n) {
      out(i) = (arr.getLong(i) * k + arr.getLong(i + 1)) % modulus
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |long[] $out;
         |if ($n < 2) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$n - 1];
         |  for (int $i = 0; $i + 1 < $n; $i++) {
         |    $out[$i] = ($arr.getLong($i) * ${k}L + $arr.getLong($i + 1)) % ${modulus}L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PairRollExpr =
    copy(child = newChild)
}

/** Per-element xxhash64 of an `array<string>` — element i =
  * `xxhash64(t[i])` (XXH64 with Spark's default seed 42), in one
  * codegen'd loop instead of an interpreted `transform` lambda. The
  * engine-native fast-path twin of [[Md5TokenHashesExpr]].
  */
case class XxTokenHashesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "xx_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $out[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XxTokenHashesExpr =
    copy(child = newChild)
}

/** Distinct 3-gram xxhash64 shingle combine over an `array<long>` of
  * token hashes: s[i] = xxhash64(xxhash64(h[i], h[i+1]), h[i+2]) with
  * Spark's two-argument fold (hash = hashLong(b, hashLong(a, 42))),
  * first-occurrence distinct, <3 tokens → empty. Replaces two
  * interpreted zip_with folds + array_distinct. Null elements are
  * treated as absent; null array → null.
  *
  * `distinct = false` keeps every 3-gram INSTANCE in token order
  * (element i is the shingle starting at token i) for the span-level
  * dup signals, where positions survive a `posexplode`.
  */
case class XxShingle3Expr(child: Expression, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xx_shingle3"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long](n)
      var i = 0
      while (i + 2 < n) {
        val inner = XXH64.hashLong(arr.getLong(i + 1), XXH64.hashLong(arr.getLong(i), 42L))
        seen.add(XXH64.hashLong(arr.getLong(i + 2), XXH64.hashLong(inner, 42L)))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n - 2)
      var i = 0
      while (i + 2 < n) {
        val inner = XXH64.hashLong(arr.getLong(i + 1), XXH64.hashLong(arr.getLong(i), 42L))
        out(i) = XXH64.hashLong(arr.getLong(i + 2), XXH64.hashLong(inner, 42L))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inner = ctx.freshName("inner")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val it = ctx.freshName("it")
      val xx = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val fill =
        if (distinct)
          s"""
             |  java.util.LinkedHashSet<Long> $seen = new java.util.LinkedHashSet<Long>($n);
             |  for (int $i = 0; $i + 2 < $n; $i++) {
             |    long $inner = $xx.hashLong($arr.getLong($i + 1), $xx.hashLong($arr.getLong($i), 42L));
             |    $seen.add($xx.hashLong($arr.getLong($i + 2), $xx.hashLong($inner, 42L)));
             |  }
             |  $out = new long[$seen.size()];
             |  int $j = 0;
             |  for (java.util.Iterator<Long> $it = $seen.iterator(); $it.hasNext(); $j++) {
             |    $out[$j] = ((Long) $it.next()).longValue();
             |  }
           """.stripMargin
        else
          s"""
             |  $out = new long[$n - 2];
             |  for (int $i = 0; $i + 2 < $n; $i++) {
             |    long $inner = $xx.hashLong($arr.getLong($i + 1), $xx.hashLong($arr.getLong($i), 42L));
             |    $out[$i] = $xx.hashLong($arr.getLong($i + 2), $xx.hashLong($inner, 42L));
             |  }
           """.stripMargin
      s"""
         |int $n = $arr.numElements();
         |long[] $out;
         |if ($n < 3) {
         |  $out = new long[0];
         |} else {
         |$fill
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XxShingle3Expr =
    copy(child = newChild)
}
