package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Compounded-return product aggregate (SURVEY.md §2.4 A1, §2.9):
  * `prod(1 + ret, min_count=1) − 1` per group with pandas null semantics
  * (`stocks.py:136-145`, `backtest.py:31-41`):
  *   - null inputs are skipped (identity);
  *   - a group with zero non-null inputs yields null (NOT 1−1=0);
  *   - factors ≤ 0 (ret ≤ −1) are legal — no log trick.
  *
  * Implemented as a typed [[Aggregator]] so Catalyst splits it into
  * partial/final automatically (map-side combine — the merge is a plain
  * product, so the agg is shuffle-minimal at any scale).
  */
object CompoundReturn {

  // public: Catalyst's generated SafeProjection must access the buffer class
  case class Buf(var prod: Double, var n: Long)

  private val agg = new Aggregator[java.lang.Double, Buf, java.lang.Double] {
    def zero: Buf = Buf(1.0, 0L)
    def reduce(b: Buf, a: java.lang.Double): Buf = {
      if (a != null) { b.prod *= (1.0 + a.doubleValue()); b.n += 1 }
      b
    }
    def merge(x: Buf, y: Buf): Buf = { x.prod *= y.prod; x.n += y.n; x }
    def finish(b: Buf): java.lang.Double =
      if (b.n == 0) null else java.lang.Double.valueOf(b.prod - 1.0)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  private lazy val fn = udaf(agg)

  /** `compound_ret(retCol)` as an aggregate Column. */
  def compoundRet(ret: Column): Column = fn(ret)

  /** Pure-builtin variant for provably-positive factors (1+ret > 0):
    * `exp(sum(log1p(ret))) − 1` with the min_count=1 null guard. Stays
    * inside whole-stage codegen; preferred in hot paths where the domain
    * allows it.
    */
  def compoundRetLog(ret: Column): Column =
    when(count(ret) > 0, exp(sum(log1p(ret))) - 1)

  /** Running (cumulative) compounded growth along a window — the CAR/BHAR
    * building block (`eventstudy.py:120-122`, W3) and weight-drift carry
    * (`backtesting.py:83-89`). Caller supplies the WindowSpec.
    */
  def cumGrowth(ret: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    exp(sum(log1p(ret)).over(w))
}
