package graft.ml

/** Cross-correlation and alignment kernels (SURVEY.md §2.7 F10;
  * reference: `finds/recipes/filters.py:25-135`). Driver-side: these run
  * on the small aggregated matrices an event study produces (events ×
  * window-days), never on fact-table data.
  *
  * The reference computes these via the convolution theorem (rfft/irfft
  * with zero padding); both evaluation strategies are implemented here
  * and produce identical values (spec'd equal to 1e-9): direct
  * evaluation of the sums, O(N²) per pair, and an FFT path
  * ([[crossCorrelationFft]] — zero-pad to the next power of two ≥ 2N,
  * pointwise conj(X)·Y, inverse transform), O(N log N), matching
  * filters.py:31-64's algorithm. [[crossCorrelation]] dispatches:
  * direct below [[fftThreshold]] (event-study windows, where FFT
  * set-up costs more than the quadratic sum), FFT above it.
  */
object Filters {

  /** Series length at or above which [[crossCorrelation]] takes the FFT
    * path. At N = 512 the padded transform (P = 2048, 3 FFTs of
    * P·log₂P ≈ 22k butterfly ops) already undercuts the ~N²/2 ≈ 131k
    * multiply-adds of the direct sums; below it the direct loop's cache
    * locality wins.
    */
  val fftThreshold = 512

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
    // Above the threshold, values carry ~1e-15 FFT round-off: a caller
    // whose downstream argmax (align's bestLag) must break EXACT
    // direct-arithmetic ties deterministically should call
    // crossCorrelationDirect explicitly.
    if (x.length >= fftThreshold) crossCorrelationFft(x, y)
    else crossCorrelationDirect(x, y)
  }

  /** Direct O(N²) evaluation of the cross-correlation sums. */
  def crossCorrelationDirect(x: Array[Double], y: Array[Double]): (Array[Int], Array[Double]) = {
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

  /** Convolution-theorem evaluation (filters.py:31-64): zero-pad the
    * normalized series to P = next power of two ≥ 2N (so the circular
    * correlation has no wraparound), take corr = IFFT(conj(FFT(x̂)) ·
    * FFT(ŷ)), and read lag l from index (l + P) mod P. Same lag window
    * and values as [[crossCorrelationDirect]] up to FFT round-off.
    */
  def crossCorrelationFft(x: Array[Double], y: Array[Double]): (Array[Int], Array[Double]) = {
    require(x.length == y.length, "series must have equal length")
    val n = x.length
    val p = paddedSize(n)
    val (xre, xim) = spectrum(x, p)
    val (yre, yim) = spectrum(y, p)
    corrFromSpectra(xre, xim, yre, yim, n, p)
  }

  /** Smallest power of two ≥ 2N (no circular-correlation wraparound). */
  private def paddedSize(n: Int): Int = {
    var p = 1
    while (p < 2 * n) p <<= 1
    p
  }

  /** Forward spectrum of the normalized series zero-padded to `p`. */
  private def spectrum(x: Array[Double], p: Int): (Array[Double], Array[Double]) = {
    val re = java.util.Arrays.copyOf(normalize(x), p)
    val im = new Array[Double](p)
    fft(re, im, inverse = false)
    (re, im)
  }

  /** corr = IFFT(conj(X) · Y) windowed to lags −N/2..N/2. Allocates the
    * product buffers, so callers may REUSE the input spectra across
    * pairs (the fft_align pattern).
    */
  private def corrFromSpectra(xre: Array[Double], xim: Array[Double],
                              yre: Array[Double], yim: Array[Double],
                              n: Int, p: Int): (Array[Int], Array[Double]) = {
    val zre = new Array[Double](p)
    val zim = new Array[Double](p)
    var k = 0
    while (k < p) {
      zre(k) = xre(k) * yre(k) + xim(k) * yim(k)
      zim(k) = xre(k) * yim(k) - xim(k) * yre(k)
      k += 1
    }
    fft(zre, zim, inverse = true)
    val half = n / 2
    val lags = (-half to half).toArray
    (lags, lags.map(l => zre((l + p) % p)))
  }

  /** In-place iterative radix-2 Cooley-Tukey FFT over parallel re/im
    * arrays (length must be a power of two). `inverse = true` applies
    * the conjugate transform with 1/P scaling.
    *
    * Deliberately hand-rolled rather than breeze's `fourierTr` (which
    * ships in Spark's jars): the padded-real-correlation wrapper is the
    * same amount of code either way, this kernel has no version coupling
    * to Spark's bundled breeze, and FiltersSpec pins it to the direct
    * sums at 1e-9 across odd/even/pow-2 lengths — the correctness
    * evidence lives here, not in a library's release notes.
    */
  private def fft(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val p = re.length
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < p) {
      var bit = p >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= p) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < p) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k
          val b = a + len / 2
          val tr = re(b) * cr - im(b) * ci
          val ti = re(b) * ci + im(b) * cr
          re(b) = re(a) - tr; im(b) = im(a) - ti
          re(a) += tr; im(a) += ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      var k = 0
      while (k < p) { re(k) /= p; im(k) /= p; k += 1 }
    }
  }

  /** Best alignment of every pair of columns (fft_align
    * filters.py:67-97): for each (i, j), the lag maximizing the
    * cross-correlation and that maximum. Returns tuples
    * (colA, colB, bestLag, maxCorr).
    *
    * `exact = true` pins every pair to [[crossCorrelationDirect]]
    * regardless of length: the FFT path carries ~1e-15 round-off, and a
    * caller whose output is replayed against an independent direct-sum
    * oracle (a10_kpp's ρ, rounded to 6 decimals) must not let a value
    * sitting on a rounding boundary — or an argmax tie — flip with the
    * evaluation strategy once series reach [[fftThreshold]] points.
    */
  def align(cols: Array[Array[Double]],
            exact: Boolean = false): Seq[(Int, Int, Int, Double)] =
    if (!exact && cols.length >= 2 && cols(0).length >= fftThreshold) {
      // fft_align's reuse shape (filters.py:67-97): transform every
      // column ONCE, then each of the M(M−1)/2 pairs is a pointwise
      // product + one inverse — 3 transforms per pair would redo
      // identical forward FFTs M−1 times each
      val n = cols(0).length
      require(cols.forall(_.length == n), "columns must have equal length")
      val p = paddedSize(n)
      val specs = cols.map(spectrum(_, p))
      for {
        i <- cols.indices
        j <- (i + 1) until cols.length
      } yield {
        val (lags, vals) = corrFromSpectra(
          specs(i)._1, specs(i)._2, specs(j)._1, specs(j)._2, n, p)
        val k = vals.indices.maxBy(vals)
        (i, j, lags(k), vals(k))
      }
    } else
      for {
        i <- cols.indices
        j <- (i + 1) until cols.length
      } yield {
        val (lags, vals) =
          if (exact) crossCorrelationDirect(cols(i), cols(j))
          else crossCorrelation(cols(i), cols(j))
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
