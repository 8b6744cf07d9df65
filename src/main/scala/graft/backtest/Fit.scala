package graft.backtest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BackTest.fit performance attribution (`backtest.py:223-282`):
  * benchmark time-series regression with HAC (Newey-West) robust
  * covariance, annualized excess/Sharpe/alpha/appraisal, Welch t for the
  * structural break, and annualized turnover/buy/sell rates.
  *
  * The regression runs driver-side on the collected (T × k) rebalance
  * matrix — T is the number of REBALANCES (hundreds), never fact rows;
  * the per-period portfolio/benchmark returns that feed it are computed
  * distributed ([[Backtesting.performance]], CompoundReturn). This is the
  * same driver-side-by-design split as the event-study KPP statistics.
  */
object Fit {

  /** OLS + HAC result: coefficients (intercept first), HAC standard
    * errors, t-stats, and residuals.
    */
  final case class OlsHac(params: Array[Double], hacSe: Array[Double],
                          tStats: Array[Double], resid: Array[Double])

  /** OLS with Newey-West (Bartlett kernel, `maxlags = hacLags`) robust
    * covariance — statsmodels `get_robustcov_results(cov_type='HAC')`
    * without small-sample correction:
    * S = Γ₀ + Σ_{l=1..L} (1 − l/(L+1))(Γ_l + Γ_lᵀ), Γ_l = Σ_t g_t g_{t−l}ᵀ,
    * g_t = x_t e_t; cov = (XᵀX)⁻¹ S (XᵀX)⁻¹.
    * `xs(t)` are regressor rows WITHOUT intercept; one is prepended.
    */
  def olsHac(y: Array[Double], xs: Array[Array[Double]], hacLags: Int): OlsHac = {
    val n = y.length
    require(n > 0 && xs.length == n, "y and xs must align")
    val k = xs(0).length + 1
    val x = Array.tabulate(n, k)((t, j) => if (j == 0) 1.0 else xs(t)(j - 1))

    // XtX and Xty
    val xtx = Array.ofDim[Double](k, k)
    val xty = new Array[Double](k)
    for (t <- 0 until n; i <- 0 until k) {
      xty(i) += x(t)(i) * y(t)
      for (j <- 0 until k) xtx(i)(j) += x(t)(i) * x(t)(j)
    }
    val xtxInv = invert(xtx)
    val beta = Array.tabulate(k)(i => (0 until k).map(j => xtxInv(i)(j) * xty(j)).sum)
    val resid = Array.tabulate(n)(t => y(t) - (0 until k).map(j => x(t)(j) * beta(j)).sum)

    // HAC middle matrix
    val g = Array.tabulate(n)(t => Array.tabulate(k)(j => x(t)(j) * resid(t)))
    val s = Array.ofDim[Double](k, k)
    for (t <- 0 until n; i <- 0 until k; j <- 0 until k)
      s(i)(j) += g(t)(i) * g(t)(j)
    for (l <- 1 to hacLags) {
      val w = 1.0 - l.toDouble / (hacLags + 1)
      for (t <- l until n; i <- 0 until k; j <- 0 until k) {
        s(i)(j) += w * (g(t)(i) * g(t - l)(j) + g(t - l)(i) * g(t)(j))
      }
    }
    val cov = mul(mul(xtxInv, s), xtxInv)
    val se = Array.tabulate(k)(i => math.sqrt(cov(i)(i)))
    OlsHac(beta, se, Array.tabulate(k)(i => beta(i) / se(i)), resid)
  }

  private def mul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    Array.tabulate(n, n)((i, j) => (0 until n).map(m => a(i)(m) * b(m)(j)).sum)
  }

  /** Gauss-Jordan inverse of a small SPD matrix. */
  private def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = Array.tabulate(n, 2 * n)((i, j) =>
      if (j < n) m(i)(j) else if (j - n == i) 1.0 else 0.0)
    for (col <- 0 until n) {
      val p = (col until n).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(col); a(col) = a(p); a(p) = tmp
      val d = a(col)(col)
      require(math.abs(d) > 1e-300, "singular design matrix")
      for (j <- 0 until 2 * n) a(col)(j) /= d
      for (r <- 0 until n if r != col) {
        val f = a(r)(col)
        if (f != 0.0) for (j <- 0 until 2 * n) a(r)(j) -= f * a(col)(j)
      }
    }
    Array.tabulate(n, n)((i, j) => a(i)(j + n))
  }

  /** Welch's unequal-variance t-test (scipy ttest_ind equal_var=False):
    * t, Welch–Satterthwaite df, two-sided p.
    */
  def welchT(a: Array[Double], b: Array[Double]): (Double, Double, Double) = {
    def meanVar(v: Array[Double]): (Double, Double) = {
      val m = v.sum / v.length
      (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (m1, v1) = meanVar(a); val (m2, v2) = meanVar(b)
    val se1 = v1 / a.length; val se2 = v2 / b.length
    val t = (m1 - m2) / math.sqrt(se1 + se2)
    val df = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (a.length - 1) + se2 * se2 / (b.length - 1))
    val p = 2.0 * (1.0 - studentTCdf(math.abs(t), df))
    (t, df, p)
  }

  /** Student-t CDF via the regularized incomplete beta function. */
  def studentTCdf(t: Double, df: Double): Double = {
    val x = df / (df + t * t)
    val ib = 0.5 * regIncompleteBeta(x, df / 2.0, 0.5)
    if (t >= 0) 1.0 - ib else ib
  }

  /** Regularized incomplete beta I_x(a,b), continued-fraction form. */
  def regIncompleteBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val lbeta = lgamma(a) + lgamma(b) - lgamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1 - x) - lbeta)
    if (x < (a + 1) / (a + b + 2)) front * betacf(x, a, b) / a
    else 1.0 - math.exp(b * math.log(1 - x) + a * math.log(x) - lbeta) * betacf(1 - x, b, a) / b
  }

  private def betacf(x: Double, a: Double, b: Double): Double = {
    val eps = 1e-15; val fpmin = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1)
    if (math.abs(d) < fpmin) d = fpmin
    d = 1 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
      d = 1 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1 / d; h *= d * c
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
      d = 1 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  private def lgamma(x: Double): Double = {
    // Lanczos approximation (g=7, n=9) — standard public coefficients
    val g = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1 - x)
    else {
      val z = x - 1
      var a = g(0)
      val t = z + 7.5
      for (i <- 1 until 9) a += g(i) / (z + i)
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Annualized fit statistics (backtest.py:266-280 `annualized`). */
  final case class FitStats(excess: Double, sharpe: Double, alpha: Double,
                            appraisal: Double, welchT: Double, welchP: Double,
                            turnover: Double, longs: Double, shorts: Double,
                            buys: Double, sells: Double,
                            betas: Array[Double], hacSe: Array[Double])

  /** Full BackTest.fit: regress per-rebalance portfolio excess returns on
    * benchmark returns, annualize with mult = (T−1)/nyears.
    *
    * `perf`: (rebaldate, excess, buys, sells, longs, shorts) — one row per
    * rebalance; `bench`: (rebaldate, <benchNames...>). Both are collected
    * ordered by rebaldate (T rows — rebalance-grain, small by design).
    */
  def fit(perf: DataFrame, bench: DataFrame, benchNames: Seq[String],
          nyears: Double, hacLags: Int = 1, breakDate: Int = 20020101): FitStats = {
    val joined = perf.join(bench, "rebaldate").orderBy("rebaldate")
      .select((Seq("rebaldate", "excess", "buys", "sells", "longs", "shorts")
        ++ benchNames).map(col): _*)
      .collect()
    require(joined.nonEmpty, "no overlapping rebalances")
    def d(r: Row, i: Int): Double = r.getAs[Any](i) match {
      case x: Double => x; case x: Number => x.doubleValue()
      case null => Double.NaN // missing cell = NaN (pandas semantics), not MatchError
    }
    val dates = joined.map(r => r.getAs[Any](0).asInstanceOf[Number].intValue())
    val y = joined.map(d(_, 1))
    val xs = joined.map(r => Array.tabulate(benchNames.length)(j => d(r, 6 + j)))
    val t = y.length
    val mult = (t - 1).toDouble / nyears

    val r = olsHac(y, xs, hacLags)
    val mean = y.sum / t
    val sd = math.sqrt(y.map(v => (v - mean) * (v - mean)).sum / (t - 1)) // ddof=1
    val residSd = math.sqrt(r.resid.map(v => v * v).sum / t) // np.std ddof=0

    val pre = joined.zip(dates).collect { case (row, dt) if dt < breakDate => d(row, 1) }
    val post = joined.zip(dates).collect { case (row, dt) if dt >= breakDate => d(row, 1) }
    val (wT, _, wP) =
      if (pre.length > 1 && post.length > 1) welchT(post, pre) else (Double.NaN, 0.0, Double.NaN)

    def colMean(i: Int): Double = joined.map(d(_, i)).sum / t
    // np.mean over the flattened |buys|,|sells| matrix (backtest.py:276)
    val absBuySell = joined.map(r => math.abs(d(r, 2)) + math.abs(d(r, 3))).sum / (2.0 * t)
    FitStats(
      excess = mult * mean,
      sharpe = math.sqrt(mult) * mean / sd,
      alpha = mult * r.params(0),
      appraisal = math.sqrt(mult) * r.params(0) / residSd,
      welchT = wT, welchP = wP,
      turnover = absBuySell * mult / 2,
      longs = colMean(4), shorts = colMean(5),
      buys = mult * colMean(2) / 2, sells = mult * colMean(3) / 2,
      betas = r.params, hacSe = r.hacSe)
  }
}
