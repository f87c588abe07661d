package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the token-hashing hot path of the
  * dedup operators (MinHash signatures, SimHash fingerprints).
  *
  * The HOF forms evaluate `numHashes × |tokens|` (resp. `64 × |tokens|`)
  * boxed lambda calls and re-hash each token string once per hash-family
  * member. These fuse the loops: ONE xxhash64 string hash per token, then
  * cheap avalanche mixes — same hash family (`XXH64`, seed 42, identical
  * child fold order as `functions.xxhash64`), so signatures are
  * bit-identical to the HOF twins (asserted in HashExprsSpec).
  */
object HashExprs {

  /** `minHashSig(tokens, n)`: array of n MinHash values; element i =
    * min over tokens of `xxhash64(token, i)`.
    */
  def minHashSig(tokens: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), numHashes))

  /** `simHashFp(tokens)`: 64-bit SimHash; bit j = sign of
    * Σ_tokens (±1 per bit j of `xxhash64(token)`).
    */
  def simHashFp(tokens: Column): Column =
    ColumnBridge.column(SimHashFp(ColumnBridge.expression(tokens)))
}

/** MinHash signature of an `array<string>`: element i is
  * `min_j XXH64.hashInt(i, XXH64.hashUTF8String(token_j, 42))` — exactly
  * `array_min(transform(tokens, t => xxhash64(t, i)))`. Empty input
  * yields all-null elements (array_min of empty is null), matching the
  * HOF twin.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // null token → seed passes through unchanged (InterpretedHashFunction)
      val base = if (v.isNullAt(j)) 42L else XXH64.hashUTF8String(v.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, base)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$numHashes]);
         |} else {
         |  final long[] $out = new long[$numHashes];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $base = $v.isNullAt($j)
         |      ? 42L : $xxh.hashUTF8String($v.getUTF8String($j), 42L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $h = $xxh.hashInt($i, $base);
         |      if ($h < $out[$i]) $out[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of an `array<string>`: bit j is set iff
  * Σ_tokens (+1 if bit j of `xxhash64(token)` else −1) > 0 — exactly the
  * HOF composition in graft.dedup.SimHash.fingerprintHof.
  */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_fp"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = if (v.isNullAt(j)) 42L else XXH64.hashUTF8String(v.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $v.numElements();
         |final int[] $counts = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $v.isNullAt($j)
         |    ? 42L : $xxh.hashUTF8String($v.getUTF8String($j), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
