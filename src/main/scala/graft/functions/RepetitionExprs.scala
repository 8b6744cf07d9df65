package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Repetition quality signals for the LLM-data pipeline (the
  * Gopher/RefinedWeb family of heuristics — repetitious documents are
  * the dominant low-quality class that length/punct ratios miss).
  *
  * One byte pass over the document, no string materialization, same
  * style as [[ShingleHashKernel]]:
  *
  *  - duplicate LINE fraction (by line count and by character mass):
  *    lines split on '\n', ASCII-trimmed, empty lines skipped, hashed
  *    with the dual-prime 61-bit polynomial fold (the
  *    [[HashKernels.polyHash61]] composition — the raw overflowing
  *    base-31 fold has trivial exact collisions, "Aa" vs "BB"); a line
  *    whose hash was already seen counts as duplicate.
  *  - top word-BIGRAM and word-TRIGRAM fraction: whitespace tokens
  *    (ASCII-lowercased), n-grams rolled with an FNV-style combine;
  *    output is occurrences-of-most-frequent / total n-grams.
  *
  * All four are in [0, 1] and 0.0 for documents too short to form the
  * unit (no lines / < n tokens). Per-row map, shuffle-free, so the
  * signals compose into the same fused Project as the other scores
  * (`t_pipeline` pattern).
  */
object RepetitionKernel {

  private final val FNV = 1099511628211L
  private final val P1 = 1000000007L
  private final val P2 = 998244353L

  /** Open-addressed long→count map (power-of-two capacity, linear
    * probing; key 0 remapped to 1 so 0 can mark empty slots). Returns
    * the count AFTER insertion.
    */
  private final class LongCountMap(initialCapacity: Int) {
    private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2)
    private var keys = new Array[Long](cap)
    private var counts = new Array[Int](cap)
    private var used = 0

    def add(key0: Long): Int = {
      val key = if (key0 == 0L) 1L else key0
      if (used * 10 >= cap * 7) grow()
      var i = (java.lang.Long.hashCode(key * -7046029254386353131L)) & (cap - 1)
      while (true) {
        val k = keys(i)
        if (k == 0L) {
          keys(i) = key; counts(i) = 1; used += 1
          return 1
        } else if (k == key) {
          counts(i) += 1
          return counts(i)
        } else i = (i + 1) & (cap - 1)
      }
      0 // unreachable
    }

    private def grow(): Unit = {
      val ok = keys; val oc = counts
      cap <<= 1
      keys = new Array[Long](cap)
      counts = new Array[Int](cap)
      var j = 0
      while (j < ok.length) {
        if (ok(j) != 0L) {
          var i = (java.lang.Long.hashCode(ok(j) * -7046029254386353131L)) & (cap - 1)
          while (keys(i) != 0L) i = (i + 1) & (cap - 1)
          keys(i) = ok(j); counts(i) = oc(j)
        }
        j += 1
      }
    }
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  /** struct<dup_line_frac, dup_line_char_frac, top_bigram_frac,
    * top_trigram_frac> (all double).
    */
  def repetitionStats(t: UTF8String): InternalRow = {
    val n = t.numBytes
    // --- duplicate lines ---
    val lineMap = new LongCountMap(64)
    var lineTotal = 0L
    var lineDup = 0L
    var charTotal = 0L
    var charDup = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || t.getByte(i) == '\n') {
        var s = start
        var e = i
        while (s < e && isWs(t.getByte(s))) s += 1
        while (e > s && isWs(t.getByte(e - 1))) e -= 1
        if (e > s) {
          var h1 = 0L
          var h2 = 0L
          var j = s
          while (j < e) {
            val b = t.getByte(j) & 0xffL
            h1 = (h1 * 31 + b) % P1
            h2 = (h2 * 131 + b) % P2
            j += 1
          }
          val h = h1 * 2147483648L + h2
          val len = (e - s).toLong
          lineTotal += 1
          charTotal += len
          if (lineMap.add(h) > 1) { lineDup += 1; charDup += len }
        }
        start = i + 1
      }
      i += 1
    }
    // --- word n-grams (whitespace tokens, ASCII-lowercased) ---
    val biMap = new LongCountMap(256)
    val triMap = new LongCountMap(256)
    var tokCount = 0L
    var biTotal = 0L
    var triTotal = 0L
    var biMax = 0
    var triMax = 0
    var prevTok = 0L
    var prevBi = 0L
    i = 0
    while (i < n) {
      if (!isWs(t.getByte(i))) {
        var h1 = 0L
        var h2 = 0L
        while (i < n && !isWs(t.getByte(i))) {
          var b = t.getByte(i) & 0xff
          if (b >= 'A' && b <= 'Z') b += 32
          h1 = (h1 * 31 + b) % P1
          h2 = (h2 * 131 + b) % P2
          i += 1
        }
        val h = h1 * 2147483648L + h2
        tokCount += 1
        if (tokCount >= 2) {
          val bi = prevTok * FNV ^ h
          biTotal += 1
          val c = biMap.add(bi)
          if (c > biMax) biMax = c
          if (tokCount >= 3) {
            val tri = prevBi * FNV ^ h
            triTotal += 1
            val c3 = triMap.add(tri)
            if (c3 > triMax) triMax = c3
          }
          prevBi = bi
        }
        prevTok = h
      } else i += 1
    }
    new GenericInternalRow(Array[Any](
      if (lineTotal > 0) lineDup.toDouble / lineTotal else 0.0,
      if (charTotal > 0) charDup.toDouble / charTotal else 0.0,
      if (biTotal > 0) biMax.toDouble / biTotal else 0.0,
      if (triTotal > 0) triMax.toDouble / triTotal else 0.0))
  }
}

/** [[RepetitionKernel.repetitionStats]] as a codegen'd expression.
  * Returns the STRUCT directly (not an array the caller decomposes):
  * four `element_at` projections would embed four copies of the kernel
  * subtree, and only codegen subexpression elimination would collapse
  * them back to one byte pass.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("top_trigram_frac", DoubleType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernel.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
