package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass kernels for the hash-signature ops.
  *
  * The Column-level forms cost one interpreted HOF pass per hash bit /
  * per seed (round 1: SimHash = fold carrying a 64-element array with a
  * 64-wide zip_with per token; MinHash = 64 separate array_min(transform)
  * passes re-hashing every shingle). These kernels hash each token ONCE
  * and keep the 64 counters / minima in local primitive arrays — same
  * xxhash64 bit-stream (seed 42, Spark's own XXH64), same outputs.
  */
object HashKernels {

  private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** SimHash64 over a token array: per token h = xxhash64(token); counter
    * b gets +1 when bit b of h is set else −1; signature bit b is set when
    * counter b ends positive. Exactly the round-1 Column-fold semantics.
    */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashStr(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** MinHash signature: element s is min over shingles of
    * xxhash64(shingle, s) — Spark's two-child xxhash64 stream: base =
    * hash(shingle, 42), then hashInt(s, base). Signed min, matching
    * array_min on LongType. Empty input → all-null signature (array_min
    * over an empty transform is null).
    */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = hashStr(shingles.getUTF8String(i), 42L)
        var s = 0
        while (s < numHashes) {
          val h = XXH64.hashInt(s, base)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash of an `array<string>` token column (codegen'd). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature (`array<long>` of length `numHashes`) of an
  * `array<string>` shingle column (codegen'd).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object HashF {
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def minhashSig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))
}
