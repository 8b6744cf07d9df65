package graft

import graft.backtest.Fit

/** Golden tests for BackTest.fit (backtest.py:223-282) against
  * numpy-computed fixture values: y = 0.005 + 0.8x + e with
  * x_t = 0.04·sin(0.7t) + 0.01·cos(1.3t), e_t = 0.02·sin(2.1t + 1),
  * T = 60, HAC maxlags 3, nyears = 5.
  */
class FitSpec extends SparkSpec {
  import spark.implicits._

  private val T = 60
  private val x = Array.tabulate(T)(t => math.sin(t * 0.7) * 0.04 + 0.01 * math.cos(t * 1.3))
  private val e = Array.tabulate(T)(t => 0.02 * math.sin(t * 2.1 + 1.0))
  private val y = Array.tabulate(T)(t => 0.005 + 0.8 * x(t) + e(t))

  test("olsHac recovers numpy beta and Newey-West standard errors") {
    val r = Fit.olsHac(y, x.map(Array(_)), hacLags = 3)
    assert(math.abs(r.params(0) - 0.00499463) < 1e-7, s"alpha ${r.params(0)}")
    assert(math.abs(r.params(1) - 0.80721315) < 1e-7, s"beta ${r.params(1)}")
    assert(math.abs(r.hacSe(0) - 0.00093971) < 1e-7, s"se0 ${r.hacSe(0)}")
    assert(math.abs(r.hacSe(1) - 0.02486248) < 1e-7, s"se1 ${r.hacSe(1)}")
  }

  test("welch t and p match scipy on the half-split") {
    val (t, df, p) = Fit.welchT(y.drop(30), y.take(30))
    assert(math.abs(t - (-0.18078796490574908)) < 1e-10, s"t $t")
    assert(math.abs(df - 57.91239479811241) < 1e-8, s"df $df")
    assert(math.abs(p - 0.8571652118290674) < 1e-9, s"p $p")
  }

  test("fit end-to-end: annualized stats match the numpy fixture") {
    val dates = Array.tabulate(T)(t => if (t < 30) 20000101 + t else 20020101 + t)
    val perf = (0 until T)
      .map(t => (dates(t), y(t), 0.3, -0.2, 1.0, -1.0))
      .toDF("rebaldate", "excess", "buys", "sells", "longs", "shorts")
    val bench = (0 until T).map(t => (dates(t), x(t))).toDF("rebaldate", "mkt")
    val s = Fit.fit(perf, bench, Seq("mkt"), nyears = 5.0, hacLags = 3)
    val mult = (T - 1) / 5.0
    assert(math.abs(s.excess - 0.0760351172589227) < 1e-10, s"excess ${s.excess}")
    assert(math.abs(s.sharpe - 0.8132800383764945) < 1e-10, s"sharpe ${s.sharpe}")
    assert(math.abs(s.alpha - 0.058936660684774086) < 1e-9, s"alpha ${s.alpha}")
    assert(math.abs(s.appraisal - 1.2170966505145666) < 1e-8, s"appraisal ${s.appraisal}")
    assert(math.abs(s.welchT - (-0.18078796490574908)) < 1e-9, s"welchT ${s.welchT}")
    assert(math.abs(s.welchP - 0.8571652118290674) < 1e-9, s"welchP ${s.welchP}")
    assert(math.abs(s.turnover - 0.25 * mult / 2) < 1e-12, s"turnover ${s.turnover}")
    assert(math.abs(s.buys - mult * 0.3 / 2) < 1e-12)
    assert(math.abs(s.sells - mult * (-0.2) / 2) < 1e-12)
    assert(s.longs == 1.0 && s.shorts == -1.0)
  }
}
