package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token shingle hashes — the decontamination basis
  * ([[graft.text.Decontaminate]]): one byte pass emitting the distinct
  * dual-prime 61-bit hashes of every n consecutive whitespace-separated
  * tokens, ASCII-lowercased and joined by ' '.
  *
  * Differs from [[ShingleHashKernel]] (the reference tokenizer) in the
  * token rule only: EVERY maximal run of non-whitespace bytes is a
  * token — digits, punctuation, 1–2 char words all participate, so a
  * numeric difference breaks the shingle and numeric leakage is
  * detectable. Whitespace is the Java-regex `\s` set (space, \t, \n,
  * \x0B, \f, \r), so the hash equals
  * `polyHash61(concat_ws(" ", lowercased window))` of a `split("\\s+")`
  * tokenization — the Column-HOF twin kept for the equivalence spec
  * (which the kernel replaced after measuring the interpreted
  * lambda chain ~20–35× slower: 3.5–7 s vs 0.2 s over 5 000 sf0.1
  * docs, ProbeWs round 10). One divergence, as in ShingleHashKernel:
  * lowercasing is ASCII-wise (A–Z only), while the twin's `lower()`
  * also folds non-ASCII case — equivalence is exact on ASCII text.
  */
object WsShingleHashKernel {
  private val P1 = 1000000007L
  private val P2 = 998244353L

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == 0x0c || b == '\r'

  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val nb = text.numBytes
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var nTok = 0
    var cap = 64
    var mask = cap - 1
    var table = new Array[Long](cap)
    var tsize = 0
    var hasZero = false
    var out = new Array[Long](16)
    var nOut = 0

    def emit(h: Long): Unit = {
      if (h == 0L) {
        if (hasZero) return
        hasZero = true
      } else {
        var idx = (java.lang.Long.hashCode(h * 0x9e3779b97f4a7c15L)) & mask
        while (table(idx) != 0L) {
          if (table(idx) == h) return
          idx = (idx + 1) & mask
        }
        table(idx) = h
        tsize += 1
        if (tsize * 4 >= cap * 3) {
          val old = table
          cap <<= 1; mask = cap - 1
          table = new Array[Long](cap)
          var i = 0
          while (i < old.length) {
            val v = old(i)
            if (v != 0L) {
              var j = (java.lang.Long.hashCode(v * 0x9e3779b97f4a7c15L)) & mask
              while (table(j) != 0L) j = (j + 1) & mask
              table(j) = v
            }
            i += 1
          }
        }
      }
      if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
      out(nOut) = h
      nOut += 1
    }

    def shingleAt(newest: Int): Unit = {
      var h1 = 0L
      var h2 = 0L
      var t = 0
      while (t < n) {
        if (t > 0) { h1 = (h1 * 31 + 32) % P1; h2 = (h2 * 131 + 32) % P2 }
        val slot = (newest + 1 + t) % n
        var i = starts(slot)
        val e = ends(slot)
        while (i < e) {
          var c = text.getByte(i) & 0xffL
          if (c >= 'A' && c <= 'Z') c += 32
          h1 = (h1 * 31 + c) % P1
          h2 = (h2 * 131 + c) % P2
          i += 1
        }
        t += 1
      }
      emit(h1 * 2147483648L + h2)
    }

    var i = 0
    var tokStart = -1
    while (i <= nb) {
      val inTok = i < nb && !isWs(text.getByte(i))
      if (inTok) {
        if (tokStart < 0) tokStart = i
      } else if (tokStart >= 0) {
        val slot = nTok % n
        starts(slot) = tokStart
        ends(slot) = i
        nTok += 1
        if (nTok >= n) shingleAt(slot)
        tokStart = -1
      }
      i += 1
    }
    if (nOut == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}

/** [[WsShingleHashKernel.shingleHashes]] as a codegen'd expression. */
case class WsShingleHash61(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"shingle width must be >= 2, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ws_shingle_hash61"

  override protected def nullSafeEval(input: Any): Any =
    WsShingleHashKernel.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsShingleHashKernel.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WsShingleHash61 =
    copy(child = newChild)
}
