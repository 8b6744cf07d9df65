package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two `array<double>` columns.
  *
  * The HOF form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is interpreted
  * (higher-order functions sit outside whole-stage codegen) and allocates
  * an intermediate array per call — measured ~0.5 ms per 64-dim pair,
  * which is what made the round-1 ANN bench queries (`s_knn`/`s_lsh`)
  * 35%/41% of total wall time. This expression is a tight primitive loop
  * inside whole-stage codegen: no allocation, no virtual calls.
  *
  * Semantics match the HOF form exactly (left-to-right accumulation in
  * double, so results are bit-identical): null if either array is null,
  * if lengths differ (zip_with pads with null), or if any element is null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql]); the
  // VectorF.dotp entry point casts both sides to array<double>
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for graft's native expressions.
  *
  * Built on the public `ExpressionUtils.column/expression` bridge so the
  * expressions work in ANY session (no SparkSessionExtensions registration
  * required — the driver builds its own sessions).
  */
object VectorF {
  private def toCol(e: Expression): Column = Bridge.column(e)
  private def toExpr(c: Column): Expression = Bridge.expression(c)

  /** Codegen'd dot product; callers should pre-cast to `array<double>`
    * once per row (casting inside a per-pair expression would re-cast per
    * pair).
    */
  def dotp(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
}
