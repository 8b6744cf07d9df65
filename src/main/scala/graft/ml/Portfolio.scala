package graft.ml

import breeze.linalg.{inv, DenseMatrix, DenseVector}

/** Mean-variance portfolio math (SURVEY.md §2.7 F8; reference:
  * `finds/recipes/finance.py:24-74`). Driver-side linear algebra — the
  * covariance inputs are k×k for a handful of assets; the DISTRIBUTED
  * part (estimating mu/sigma from returns panels) is plain agg/covar
  * Columns upstream.
  */
object Portfolio {

  case class Solution(weights: Array[Double], volatility: Double, mean: Option[Double])

  /** Global minimum-variance portfolio (gmv_portfolio finance.py:24-38). */
  def gmv(sigma: DenseMatrix[Double], mu: Option[DenseVector[Double]] = None): Solution = {
    val n = sigma.rows
    val ones = DenseVector.ones[Double](n)
    val si = inv(sigma)
    val w = (si * ones) / (ones.t * si * ones)
    Solution(w.toArray, math.sqrt(w.t * sigma * w), mu.map(m => w.t * m))
  }

  /** Tangency (max-Sharpe) portfolio (tangency_portfolio finance.py:59-74). */
  def tangency(mu: DenseVector[Double], sigma: DenseMatrix[Double]): Solution = {
    val ones = DenseVector.ones[Double](mu.length)
    val si = inv(sigma)
    val w = (si * mu) / (ones.t * (si * mu))
    Solution(w.toArray, math.sqrt(w.t * sigma * w), Some(w.t * mu))
  }

  /** Minimum-variance portfolio hitting a target mean
    * (efficient_portfolio finance.py:40-57).
    */
  def efficient(mu: DenseVector[Double], sigma: DenseMatrix[Double],
                target: Double): Solution = {
    val n = mu.length
    val m = DenseMatrix.horzcat(mu.toDenseMatrix.t, DenseMatrix.ones[Double](n, 1))
    val si = inv(sigma)
    val b = m.t * si * m
    val w = si * m * inv(b) * DenseVector(target, 1.0)
    Solution(w.toArray, math.sqrt(w.t * sigma * w), Some(w.t * mu))
  }
}

/** Risk statistics (SURVEY.md §2.4 A12; reference:
  * `finds/recipes/finance.py:309-389`). Historical VaR/ES live in the
  * catalog as distributed percentile aggregations (a12_risk); these are
  * the scalar parametric/test kernels.
  */
object Risk {

  /** Parametric gaussian VaR and ES at tail prob `alpha`
    * (parametric_risk finance.py:309-318).
    */
  def parametric(sigma: Double, alpha: Double): (Double, Double) = {
    val z = inverseNormalCdf(alpha)
    val varLevel = -sigma * z
    val es = sigma * normalPdf(z) / alpha
    (varLevel, es)
  }

  /** Kupiec proportion-of-failures likelihood ratio
    * (kupiec_LR finance.py:359-389): `s` violations in `n` observations
    * at VaR level `var_level` (expected failure prob p).
    */
  def kupiecLR(s: Int, n: Int, p: Double): Double = {
    val num = math.pow(1 - p, n - s) * math.pow(p, s)
    val den = math.pow(1.0 - s.toDouble / n, n - s) * math.pow(s.toDouble / n, s)
    -2 * math.log(num / den)
  }

  private def normalPdf(x: Double): Double =
    math.exp(-x * x / 2) / math.sqrt(2 * math.Pi)

  /** Acklam's rational approximation of the inverse normal CDF —
    * |error| < 1.15e-9, plenty for risk levels.
    */
  def inverseNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1)
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
      2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
      2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }
}
