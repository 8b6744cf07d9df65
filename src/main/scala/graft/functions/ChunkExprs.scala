package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Long-document chunking for the LLM-data pipeline: split a document
  * into windows of at most `maxTokens` whitespace tokens, consecutive
  * windows sharing `overlap` tokens of context (the standard
  * fixed-context splitter that runs between cleaning and packing —
  * documents longer than the model context are windowed, short ones
  * pass through whole). No reference analog — builder-brief surface.
  *
  * One byte pass to find token boundaries, then byte-range slices:
  * whitespace is ASCII, so byte-offset cuts are UTF-8 safe, and each
  * chunk preserves the ORIGINAL bytes between its first token's start
  * and its last token's end (inner whitespace runs survive verbatim —
  * chunking never rewrites text, it only windows it). Leading/trailing
  * whitespace of the document falls outside every chunk.
  */
object ChunkKernel {

  // the full ASCII \s set (incl. VT/FF), so the chunk budget counts
  // tokens exactly like TextOps.wsTokenCount's \s+ (the WsShingleExprs
  // convention)
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == 0x0c || b == '\r'

  /** array<string> of token windows; empty array for a token-free
    * document (nothing to train on), single original-bytes chunk when
    * the document fits one window.
    */
  def chunks(t: UTF8String, maxTokens: Int, overlap: Int): ArrayData = {
    val n = t.numBytes
    // token boundary byte offsets
    var starts = new Array[Int](64)
    var ends = new Array[Int](64)
    var ntok = 0
    var i = 0
    while (i < n) {
      if (!isWs(t.getByte(i))) {
        if (ntok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, ntok * 2)
          ends = java.util.Arrays.copyOf(ends, ntok * 2)
        }
        starts(ntok) = i
        while (i < n && !isWs(t.getByte(i))) i += 1
        ends(ntok) = i
        ntok += 1
      } else i += 1
    }
    if (ntok == 0) return new GenericArrayData(Array.empty[Any])
    val step = maxTokens - overlap
    // one byte copy per document; fromBytes slices share it (the
    // consumer copies into its own row layout anyway)
    val bytes = t.getBytes
    val out = new java.util.ArrayList[AnyRef](ntok / step + 1)
    var s = 0
    while (s < ntok) {
      val e = math.min(s + maxTokens, ntok) // [s, e) token window
      val from = starts(s)
      out.add(UTF8String.fromBytes(bytes, from, ends(e - 1) - from))
      if (e == ntok) s = ntok // the tail window always ends the walk
      else s += step
    }
    new GenericArrayData(out.toArray)
  }
}

/** [[ChunkKernel.chunks]] as a codegen'd expression. */
case class ChunkByTokens(child: Expression, maxTokens: Int, overlap: Int)
    extends UnaryExpression {
  require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
  require(overlap >= 0 && overlap < maxTokens,
    s"overlap must be in [0, maxTokens), got $overlap for maxTokens $maxTokens")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunk_by_tokens"

  override protected def nullSafeEval(input: Any): Any =
    ChunkKernel.chunks(input.asInstanceOf[UTF8String], maxTokens, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ChunkKernel.chunks($c, $maxTokens, $overlap)")

  override protected def withNewChildInternal(newChild: Expression): ChunkByTokens =
    copy(child = newChild)
}
