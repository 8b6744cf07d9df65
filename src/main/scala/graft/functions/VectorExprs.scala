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

/** Native codegen'd dot product of two `array<float>` columns,
  * ACCUMULATED IN DOUBLE (each product is computed after widening both
  * operands, so the only precision lost vs [[DotProduct]] is the float
  * rounding of the stored components: |Δ| ≤ Σ|aᵢbᵢ|·2⁻²³ ≈ 1e-6 for unit
  * vectors at dim 64).
  *
  * Exists for the ANN rescore's too-big-to-broadcast regime: the
  * candidate-volume join output carries one vector payload through a
  * shuffle (join 1's output re-shuffles on the second id for join 2),
  * and at the fourth stress decade (×243, ~10⁸ candidates) that
  * payload's spill is what exceeded one node's local disk even after
  * the SHUFFLE_HASH fix. A float32 copy halves the per-element payload;
  * this kernel scores it without a per-row cast back to array<double>
  * (which would re-materialize a double array per candidate row).
  * Null semantics identical to [[DotProduct]].
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dotf"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** All `planes x tables` LSH hyperplane projections of one vector in one
  * compiled pass — the native twin of `Similarity.lshProjectionsHof`
  * (whose aggregate/zip_with fold is interpreted and cost ~1 ms/row).
  * Components are the cross-engine Lehmer-mixed values, precomputed once
  * per (nProj, dims) into a process-wide cache (the mix is ~8 integer ops
  * per component — computing it per row per element would double the
  * kernel's work).
  *
  * Accumulation order matches the HOF fold (per element d ascending, one
  * add per plane) — results are bit-identical, which the DuckDB oracle
  * (s_lsh) depends on.
  */
object LshKernel {
  private val M31 = 2147483647L
  @volatile private var cache: (Int, Int, Array[Double]) = (0, 0, new Array[Double](0))

  /** comp(p, d) laid out row-major by d: comps(d * nProj + p). */
  def components(nProj: Int, dims: Int): Array[Double] = {
    val c = cache
    if (c._1 == nProj && c._2 >= dims) c._3
    else synchronized {
      val c2 = cache
      if (c2._1 == nProj && c2._2 >= dims) c2._3
      else {
        val grow = math.max(dims, 128)
        val arr = new Array[Double](grow * nProj)
        var d = 0
        while (d < grow) {
          var p = 0
          while (p < nProj) {
            val seed = p * 2654435761L + d * 40503L + 1
            val h = (seed * 48271L % M31 * 16807L) % M31
            arr(d * nProj + p) = (h % 2000001L).toDouble / 1000000.0 - 1.0
            p += 1
          }
          d += 1
        }
        cache = (nProj, grow, arr)
        arr
      }
    }
  }

  def project(vec: ArrayData, nProj: Int): ArrayData = {
    val n = vec.numElements()
    val comps = components(nProj, n)
    val sums = new Array[Double](nProj)
    var d = 0
    while (d < n) {
      val x = vec.getDouble(d)
      val base = d * nProj
      var p = 0
      while (p < nProj) {
        sums(p) += x * comps(base + p)
        p += 1
      }
      d += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sums)
  }
}

/** [[LshKernel.project]] as a codegen'd expression over `array<double>`. */
case class LshProjectionsExpr(child: Expression, nProj: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_lsh_proj"

  override protected def nullSafeEval(input: Any): Any =
    LshKernel.project(input.asInstanceOf[ArrayData], nProj)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshKernel.project($c, $nProj)")

  override protected def withNewChildInternal(newChild: Expression): LshProjectionsExpr =
    copy(child = newChild)
}

/** IVF quantizer ranking kernel: the `nProbe` nearest centroids of one
  * vector against the full centroid table, in one compiled pass.
  *
  * The HOF formulation (`transform(cents, dist-struct)` → `array_sort` →
  * `slice`) is INTERPRETED — higher-order functions sit outside
  * whole-stage codegen — and its cost is O(N·nLists·dim) per pass over
  * the corpus: with the stress harness growing BOTH N and nLists with
  * the copy count (standard IVF sizing — lists ∝ corpus), the
  * interpreted form measured super-linear wall time at ×30 (ratio 76 vs
  * a gate of 36) purely from lambda/allocation overhead on 30× × 30×
  * the arithmetic. This kernel runs the identical arithmetic as a tight
  * primitive loop with an insertion top-k buffer (no per-centroid
  * struct/array allocation, no sort of the full distance array).
  *
  * FP semantics are bit-identical to the HOF/window forms (the s_ivf2
  * DuckDB oracle's formulation): `d = v·v + cc − 2·(v·c)` with each dot
  * accumulated left-to-right in double, ranked by (d, list) ascending —
  * the buffer inserts strictly-closer entries only, and the centroid
  * array is scanned in ascending-list order, so equal distances keep
  * the smaller list id (pinned by NearestListsSpec's planted exact-tie
  * vectors). A centroid whose dimension differs from the vector's is
  * skipped (the callers build both sides from one prepped column, so
  * the case cannot occur).
  */
object NearestKernel {
  /** cents: array<struct<list:int, centroid:array<double>, cc:double>>
    * sorted by list ascending; returns array<int> of the min(nProbe, n)
    * nearest list ids, nearest first.
    */
  def nearest(vec: ArrayData, cents: ArrayData, nProbe: Int): ArrayData = {
    val dim = vec.numElements()
    val nL = cents.numElements()
    val k = math.min(nProbe, nL)
    var vv = 0.0
    var j = 0
    while (j < dim) { val x = vec.getDouble(j); vv += x * x; j += 1 }
    val bd = new Array[Double](k)
    val bl = new Array[Int](k)
    var filled = 0
    var li = 0
    while (li < nL) {
      val c = cents.getStruct(li, 3)
      val cen = c.getArray(1)
      if (cen.numElements() == dim) {
        var dot = 0.0
        var m = 0
        while (m < dim) { dot += vec.getDouble(m) * cen.getDouble(m); m += 1 }
        val dist = vv + c.getDouble(2) - 2.0 * dot
        if (filled < k) {
          var pos = filled
          while (pos > 0 && dist < bd(pos - 1)) pos -= 1
          var s = filled
          while (s > pos) { bd(s) = bd(s - 1); bl(s) = bl(s - 1); s -= 1 }
          bd(pos) = dist; bl(pos) = c.getInt(0); filled += 1
        } else if (k > 0 && dist < bd(k - 1)) {
          var pos = k - 1
          while (pos > 0 && dist < bd(pos - 1)) pos -= 1
          var s = k - 1
          while (s > pos) { bd(s) = bd(s - 1); bl(s) = bl(s - 1); s -= 1 }
          bd(pos) = dist; bl(pos) = c.getInt(0)
        }
      }
      li += 1
    }
    val out = if (filled == k) bl else java.util.Arrays.copyOf(bl, filled)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** [[NearestKernel.nearest]] as a codegen'd expression:
  * (vec array<double>, cents array<struct<list,centroid,cc>>) →
  * array<int> of the nProbe nearest list ids.
  */
case class NearestListsExpr(left: Expression, right: Expression, nProbe: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_lists"

  override def nullSafeEval(vec: Any, cents: Any): Any =
    NearestKernel.nearest(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NearestKernel.nearest($a, $b, $nProbe)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestListsExpr =
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

  /** Codegen'd dot product over `array<float>` inputs, accumulated in
    * double (the ANN rescore's halved-payload regime — see
    * [[DotProductFloat]]).
    */
  def dotpF(a: Column, b: Column): Column = toCol(DotProductFloat(toExpr(a), toExpr(b)))

  /** Codegen'd LSH projections (all planes x tables sums in one pass). */
  def lshProj(vec: Column, nProj: Int): Column =
    toCol(LshProjectionsExpr(toExpr(vec), nProj))

  /** Codegen'd IVF quantizer ranking: nProbe nearest centroid list ids
    * (see [[NearestKernel]]).
    */
  def nearestLists(vec: Column, cents: Column, nProbe: Int): Column =
    toCol(NearestListsExpr(toExpr(vec), toExpr(cents), nProbe))
}
