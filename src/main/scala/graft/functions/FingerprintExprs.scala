package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint as ONE byte pass (the operative
  * path of [[graft.text.TextOps.fingerprint]]; the Column-HOF
  * formulation stays as the equivalence-spec twin, like every sibling
  * kernel — it enumerates characters via `split("")` + per-element
  * `ascii()`, an interpreted boxed-string chain that was the last
  * catalog-path holdout at 100 TB).
  *
  * Semantics (must match `lower(text)` → keep `[\x20-\x7e]` → fold
  * `acc = (acc·31 + codepoint) mod 1e9+7` exactly, since t_fingerprint
  * and t_pipeline replay it in DuckDB):
  *
  *  - ASCII printable bytes participate, `A-Z` folded to `a-z`; ASCII
  *    control bytes are dropped.
  *  - Non-ASCII characters lowercase FIRST, then the printable filter
  *    applies. Exactly two non-ASCII characters have ASCII in their
  *    (root-locale) lowercase image and must therefore contribute:
  *    U+212A KELVIN SIGN → 'k', and U+0130 İ → "i" + U+0307 (the
  *    combining dot is non-ASCII and filtered, so net 'i'). Every other
  *    non-ASCII character lowercases to non-ASCII and is skipped — the
  *    kernel matches them by their UTF-8 byte patterns and skips all
  *    other multi-byte sequences without decoding.
  *
  * The kernel pins ROOT-locale lowercase semantics regardless of the
  * JVM default locale (it never calls a locale-sensitive API), which is
  * what the DuckDB oracle computes. The HOF twin inherits Spark's
  * `lower()`, whose slow path for non-ASCII strings is default-locale
  * `toLowerCase` — under e.g. `-Duser.language=tr` the TWIN diverges on
  * dotted/dotless I (ASCII 'I' → U+0131 in a string that also holds any
  * non-ASCII char), so the kernel≡HOF equivalence spec assumes a
  * root/en default locale; the kernel itself stays oracle-correct
  * everywhere.
  */
object FingerprintKernel {

  private final val P = 1000000007L

  def fingerprint(t: UTF8String): Long = {
    val n = t.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = t.getByte(i)
      if (b >= 0) { // ASCII
        if (b >= 0x20 && b <= 0x7e) {
          val c = if (b >= 'A' && b <= 'Z') b + 32 else b.toInt
          acc = (acc * 31L + c) % P
        }
        i += 1
      } else {
        val ub = b & 0xff
        // U+0130 = C4 B0 → 'i'; U+212A = E2 84 AA → 'k'
        if (ub == 0xc4 && i + 1 < n && (t.getByte(i + 1) & 0xff) == 0xb0) {
          acc = (acc * 31L + 'i') % P
          i += 2
        } else if (ub == 0xe2 && i + 2 < n &&
                   (t.getByte(i + 1) & 0xff) == 0x84 &&
                   (t.getByte(i + 2) & 0xff) == 0xaa) {
          acc = (acc * 31L + 'k') % P
          i += 3
        } else {
          // skip the whole sequence by lead-byte length (defensive on
          // malformed bytes: a stray continuation byte advances by 1)
          i += (if (ub >= 0xf0) 4 else if (ub >= 0xe0) 3 else if (ub >= 0xc0) 2 else 1)
        }
      }
    }
    acc
  }
}

/** [[FingerprintKernel.fingerprint]] as a codegen'd expression. */
case class FingerprintHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintKernel.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintKernel.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintHash =
    copy(child = newChild)
}
