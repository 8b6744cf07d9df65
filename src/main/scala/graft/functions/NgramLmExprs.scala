package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word n-gram featurizer for bag-of-ngram language models —
  * the feature space of DSIR data selection (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling": word
  * unigrams+bigrams hashed into a fixed bucket table) and of the
  * hashed-LM quality score in [[graft.text.NgramLm]] (the CCNet-style
  * perplexity gate, with a hashed bag model standing in for KenLM).
  * No reference analog — builder-brief surface.
  *
  * One byte pass over the document, no string materialization, the
  * [[RepetitionKernel]] conventions exactly: whitespace tokens,
  * ASCII-lowercased, dual-prime 61-bit token hashes, k-grams rolled
  * with the FNV combine. Every k-gram for k = 1..n is emitted (DSIR
  * uses 1..2), folded onto `buckets` (power of two) by the same
  * avalanche multiplier the open-addressed maps use.
  */
object NgramLmKernel {

  private final val FNV = 1099511628211L
  private final val P1 = 1000000007L
  private final val P2 = 998244353L
  private final val MIX = -7046029254386353131L

  // the full ASCII \s set (incl. VT/FF) — the WsShingleExprs convention
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == 0x0c || b == '\r'

  @inline private def bucketOf(h: Long, buckets: Int): Int =
    java.lang.Long.hashCode(h * MIX) & (buckets - 1)

  /** Walk every k-gram (k = 1..n) of the text's whitespace tokens and
    * hand its bucket to `emit`. Returns the number of grams emitted.
    * `gram(k)` state: gram(k-1) holds the rolling hash of the k-gram
    * ending at the current token (updated high-k first so each update
    * reads the PREVIOUS token's (k-1)-gram).
    */
  @inline private def walk(t: UTF8String, n: Int, buckets: Int,
                           emit: Int => Unit): Long = {
    val nb = t.numBytes
    val gram = new Array[Long](n)
    var tok = 0L
    var m = 0L
    var i = 0
    while (i < nb) {
      if (!isWs(t.getByte(i))) {
        var h1 = 0L
        var h2 = 0L
        while (i < nb && !isWs(t.getByte(i))) {
          var b = t.getByte(i) & 0xff
          if (b >= 'A' && b <= 'Z') b += 32
          h1 = (h1 * 31 + b) % P1
          h2 = (h2 * 131 + b) % P2
          i += 1
        }
        val h = h1 * 2147483648L + h2
        tok += 1
        var k = math.min(n, tok).toInt
        while (k >= 2) {
          gram(k - 1) = gram(k - 2) * FNV ^ h
          emit(bucketOf(gram(k - 1), buckets)); m += 1
          k -= 1
        }
        gram(0) = h
        emit(bucketOf(h, buckets)); m += 1
      } else i += 1
    }
    m
  }

  /** All hashed n-gram bucket ids of the document, with repetition —
    * the fit-side feature stream ([[graft.text.NgramLm.fit]] explodes
    * it into the bounded bucket-count aggregate).
    */
  def ngramBuckets(t: UTF8String, n: Int, buckets: Int): ArrayData = {
    var out = new Array[Int](64)
    var nOut = 0
    val m = walk(t, n, buckets, b => {
      if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
      out(nOut) = b; nOut += 1
    })
    if (m == 0L) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** struct<sum double, grams long>: Σ weights(bucket) over the
    * document's hashed n-grams, and the gram count. With weights =
    * log₂-probabilities this is the document's total log-likelihood
    * (cross-entropy = -sum/grams); with weights = log p_target − log
    * p_raw it is the DSIR log importance weight.
    */
  def ngramScore(t: UTF8String, weights: Array[Double], n: Int,
                 buckets: Int): InternalRow = {
    var sum = 0.0
    val m = walk(t, n, buckets, b => sum += weights(b))
    new GenericInternalRow(Array[Any](sum, m))
  }
}

/** [[NgramLmKernel.ngramBuckets]] as a codegen'd expression:
  * array<int> of hashed n-gram bucket ids (with repetition).
  */
case class NgramBuckets(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 8, s"ngram order must be in [1, 8], got $n")
  require(buckets >= 2 && Integer.bitCount(buckets) == 1,
    s"buckets must be a power of two >= 2, got $buckets")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ngram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    NgramLmKernel.ngramBuckets(input.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramLmKernel.ngramBuckets($c, $n, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): NgramBuckets =
    copy(child = newChild)
}

/** [[NgramLmKernel.ngramScore]] as a codegen'd expression. The weight
  * table rides the plan as a referenced object (one array per executor
  * after broadcast of the serialized plan — never a per-row structure).
  * Returns the struct directly so one kernel pass feeds both the sum
  * and the gram count ([[RepetitionStats]] pattern).
  */
case class NgramScore(child: Expression, weights: Array[Double], n: Int,
                      buckets: Int) extends UnaryExpression {
  require(n >= 1 && n <= 8, s"ngram order must be in [1, 8], got $n")
  require(buckets >= 2 && Integer.bitCount(buckets) == 1,
    s"buckets must be a power of two >= 2, got $buckets")
  require(weights.length == buckets,
    s"weight table length ${weights.length} != buckets $buckets")
  override def dataType: DataType = StructType(Seq(
    StructField("sum", DoubleType, nullable = false),
    StructField("grams", LongType, nullable = false)))
  override def prettyName: String = "graft_ngram_score"

  override protected def nullSafeEval(input: Any): Any =
    NgramLmKernel.ngramScore(input.asInstanceOf[UTF8String], weights, n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("ngramLmWeights", weights, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramLmKernel.ngramScore($c, $w, $n, $buckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramScore =
    copy(child = newChild)
}
