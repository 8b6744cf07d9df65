package graft.ml

/** Cross-correlation and alignment kernels (SURVEY.md §2.7 F10;
  * reference: `finds/recipes/filters.py:25-135`). Driver-side: these run
  * on the small aggregated matrices an event study produces (events ×
  * window-days), never on fact-table data.
  *
  * The reference computes these via the convolution theorem (rfft/irfft
  * with zero padding); the values here are identical — direct evaluation
  * of the same sums, O(N²) per pair, which for event-study windows
  * (N ≤ a few hundred) is faster than FFT set-up anyway. Swap in breeze
  * `fourierTr` if N grows.
  */
object Filters {

  /** Demean and divide by the L2 norm (filters.py:25-30). */
  def normalize(x: Array[Double]): Array[Double] = {
    val mean = x.sum / x.length
    val d = x.map(_ - mean)
    val norm = math.sqrt(d.map(v => v * v).sum)
    if (norm == 0) d else d.map(_ / norm)
  }

  /** Cross-correlation of two equal-length series at every displacement
    * lag in -(N/2)..N/2 (fft_correlation filters.py:31-64):
    * corr(l) = Σ_m x̂(m)·ŷ(m+l) over valid m, with normalized inputs.
    * Returns (lags, values); autocorrelation of x at lag 0 is 1.
    */
  def crossCorrelation(x: Array[Double], y: Array[Double]): (Array[Int], Array[Double]) = {
    require(x.length == y.length, "series must have equal length")
    val n = x.length
    val xn = normalize(x)
    val yn = normalize(y)
    val half = n / 2
    val lags = (-half to half).toArray
    val vals = lags.map { l =>
      var s = 0.0
      var m = math.max(0, -l)
      val hi = math.min(n, n - l)
      while (m < hi) { s += xn(m) * yn(m + l); m += 1 }
      s
    }
    (lags, vals)
  }

  /** Best alignment of every pair of columns (fft_align
    * filters.py:67-97): for each (i, j), the lag maximizing the
    * cross-correlation and that maximum. Returns tuples
    * (colA, colB, bestLag, maxCorr).
    */
  def align(cols: Array[Array[Double]]): Seq[(Int, Int, Int, Double)] =
    for {
      i <- cols.indices
      j <- (i + 1) until cols.length
    } yield {
      val (lags, vals) = crossCorrelation(cols(i), cols(j))
      val k = vals.indices.maxBy(vals)
      (i, j, lags(k), vals(k))
    }

  /** Newey-West weighted sum of cross-correlations over the full lag
    * window: Σ_l (1 − |l|/(L+1))·corr(l) with L = N/2 — the Bartlett
    * kernel of filters.py:99-135. (The reference's `fft_neweywest` body
    * is non-functional dead code — `result.extend()` with no argument —
    * so this implements the documented intent.)
    */
  def neweyWestCorrelation(x: Array[Double], y: Array[Double]): Double = {
    val (lags, vals) = crossCorrelation(x, y)
    val L = x.length / 2
    lags.zip(vals).map { case (l, v) => (1.0 - math.abs(l).toDouble / (L + 1)) * v }.sum
  }
}
