package graft.ml

import org.apache.spark.mllib.linalg.{DenseMatrix, Matrices, Vectors}
import org.apache.spark.mllib.linalg.distributed.{IndexedRow, IndexedRowMatrix}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Economics kernels (SURVEY.md §2.7 F9; reference `finds/recipes/
  * econs.py:21-282`): Bai-Ng (2002) factor selection, marginal R²,
  * the McCracken-Ng factors-EM imputation, ADF integration order, and
  * break-point F statistics.
  *
  * Scale shape: the panel (T×N) is distributed as an
  * `IndexedRowMatrix` and the SVD runs through MLlib (`computeSVD` —
  * ARPACK on the N×N Gramian, distributed row aggregation), so T can be
  * cluster-scale; only the N×k right factors and singular values land on
  * the driver (N = #series, bounded — 130 for FRED-MD). The criterion
  * arithmetic on eigenvalues is driver-side by construction.
  */
object Econs {

  /** Row guard for [[approximateFactors]]'s deliberate driver-side
    * panel collect: 10⁷ cells (~80 MB of doubles) is ~100× FRED-QD and
    * far below driver memory — large enough to never trip a legitimate
    * macro panel, small enough that a mis-routed corpus table fails at
    * the boundary with a rationale instead of a driver OOM.
    */
  val MaxDriverPanelCells: Long = 10L * 1000 * 1000

  final case class Svd(s: Array[Double], v: Array[Array[Double]], // v(col)(k)
                       u: IndexedRowMatrix)

  /** Column means and ddof-population/sample stds of a dense panel. */
  private def colStats(rows: RDD[IndexedRow], n: Int, ddof: Int): (Array[Double], Array[Double]) = {
    val t = rows.count()
    val (sums, sqs) = rows.map { r =>
      val a = r.vector.toArray
      (a, a.map(x => x * x))
    }.reduce { case ((s1, q1), (s2, q2)) =>
      (s1.zip(s2).map(p => p._1 + p._2), q1.zip(q2).map(p => p._1 + p._2))
    }
    val means = sums.map(_ / t)
    val stds = Array.tabulate(n)(j =>
      math.sqrt((sqs(j) - t * means(j) * means(j)) / (t - ddof)))
    (means, stds)
  }

  private def standardize(rows: RDD[IndexedRow], n: Int, ddof: Int): RDD[IndexedRow] = {
    val (m, s) = colStats(rows, n, ddof)
    rows.map(r => IndexedRow(r.index,
      Vectors.dense(r.vector.toArray.zipWithIndex.map { case (x, j) => (x - m(j)) / s(j) })))
  }

  private def svdOf(rows: RDD[IndexedRow], k: Int): Svd = {
    val mat = new IndexedRowMatrix(rows)
    val svd = mat.computeSVD(k, computeU = true)
    val n = svd.V.numRows
    val kk = svd.s.size
    Svd(svd.s.toArray,
      Array.tabulate(n, kk)((c, j) => svd.V(c, j)),
      svd.U)
  }

  /** Bai & Ng (2002) ICp criterion over eigenvalues (econs.py:52-96):
    * the first local minimum of log(σ²_k) + k·CT_p, σ²_k = residual
    * variance after k factors (= tail eigenvalue mass).
    * `eigval` are the squared singular values of standardized Z.
    */
  def selectBaingFromEig(eigval: Array[Double], t: Long, n: Int,
                         kmax: Int = 0, p: Int = 2): Int = {
    require(p >= 1 && p <= 3, "p must be 1, 2 or 3")
    val nt = n.toDouble * t
    val nt1 = n.toDouble + t
    val gct = math.min(n.toLong, t).toInt
    val ctBase = p match {
      case 1 => math.log(nt / nt1) * (nt1 / nt)
      case 2 => (nt1 / nt) * math.log(gct.toDouble)
      case 3 => math.log(gct.toDouble) / gct
    }
    val total = eigval.sum
    // residual variance after k components (k = index): roll(total - cumsum, 1)
    val cums = eigval.scanLeft(0.0)(_ + _).tail
    val resid = Array.tabulate(eigval.length)(k => if (k == 0) total else total - cums(k - 1))
    val lim = if (kmax > 0) math.min(kmax, gct) else gct
    val ic = Array.tabulate(math.min(lim, eigval.length))(k =>
      math.log(resid(k) / total + 1e-12) + k * ctBase)
    val local = (0 until ic.length - 1).find(k => ic(k) < ic(k + 1))
    local.getOrElse(ic.length)
  }

  /** Bai-Ng factor count of a panel DataFrame (columns = series). */
  def selectBaing(df: DataFrame, cols: Seq[String], kmax: Int = 0, p: Int = 2): Int = {
    val n = cols.length
    val rows = toIndexedRows(df, cols)
    val t = rows.count()
    val z = standardize(rows, n, ddof = 0)
    val svd = svdOf(z, math.min(n, t.toInt))
    selectBaingFromEig(svd.s.map(x => x * x), t, n, kmax, p)
  }

  /** Marginal R² of each series from incrementally adding factors
    * (econs.py:21-49). With orthonormal U, mean((u_k u_kᵀ Z)²)_c =
    * s_k² v_ck²/T, so mrsq[c][k] = s_k² v_ck² / Σ_j s_j² v_cj² — no U
    * needed, only (s, V).
    */
  def mrsq(df: DataFrame, cols: Seq[String], kmax: Int = 0): Array[Array[Double]] = {
    val n = cols.length
    val rows = toIndexedRows(df, cols)
    val t = rows.count()
    val z = standardize(rows, n, ddof = 0)
    val svd = svdOf(z, math.min(n, t.toInt))
    val k = if (kmax > 0) math.min(kmax, svd.s.length) else svd.s.length
    Array.tabulate(n) { c =>
      val denom = svd.s.indices.map(j => svd.s(j) * svd.s(j) * svd.v(c)(j) * svd.v(c)(j)).sum
      Array.tabulate(k)(j => svd.s(j) * svd.s(j) * svd.v(c)(j) * svd.v(c)(j) / denom)
    }
  }

  private def toIndexedRows(df: DataFrame, cols: Seq[String]): RDD[IndexedRow] = {
    import org.apache.spark.sql.functions._
    df.select(cols.map(col): _*).rdd.zipWithIndex().map { case (r, i) =>
      IndexedRow(i, Vectors.dense(Array.tabulate(cols.length)(j =>
        r.getAs[Any](j) match {
          case null => Double.NaN
          case x: Double => x
          case x: Number => x.doubleValue()
        })))
    }
  }

  /** McCracken-Ng factors-EM imputation (`approximate_factors`
    * econs.py:98-146): fill missing with column means, then iterate
    * standardize (ddof=1) → SVD → Bai-Ng r → rank-r reconstruction →
    * replace missing entries → unstandardize, until
    * (‖Z−Z_prev‖/‖Z‖)² < tol. Returns the imputed (T×N) rows in input
    * row order.
    */
  def approximateFactors(df: DataFrame, cols: Seq[String], kmax: Int = 0,
                         p: Int = 2, maxIter: Int = 50,
                         tol: Double = 1e-12): Array[Array[Double]] = {
    val spark = df.sparkSession
    val n = cols.length
    // driver-side collect is this op's DESIGN, not an accident: the EM
    // iteration (standardize → dense SVD → rank-r reconstruct → refill
    // missing) re-reads the whole T×N panel every iteration, and its
    // domain is macro vintage panels (FRED-MD ~700×130, FRED-QD
    // ~250×250) that are thousands of times below any driver limit. The
    // guard makes the boundary explicit — the engine-wide convention
    // for every deliberate local twin (graph locals, NgramLm.fit's
    // bucket table): a caller with a genuinely large panel should be
    // told at the boundary, not discover a driver OOM mid-iteration.
    val panelRows = df.count()
    require(panelRows * n <= MaxDriverPanelCells,
      s"approximateFactors collects the full panel to the driver for the " +
        s"dense SVD-EM iteration; got $panelRows x $n = ${panelRows * n} " +
        s"cells > $MaxDriverPanelCells. This op is for small macro panels " +
        s"(FRED-MD scale) — reduce the column set or sample dates first.")
    val raw = toIndexedRows(df, cols).collect().sortBy(_.index)
      .map(_.vector.toArray)
    val t = raw.length
    val missing = raw.map(_.map(_.isNaN))
    require(missing.forall(r => !r.forall(identity)), "a row is all-missing")

    // init: column means over present values
    val z = raw.map(_.clone())
    for (c <- 0 until n) {
      val present = (0 until t).filter(r => !missing(r)(c))
      val m = present.map(r => raw(r)(c)).sum / present.length
      for (r <- 0 until t if missing(r)(c)) z(r)(c) = m
    }

    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      iter += 1
      val old = z.map(_.clone())
      // standardize ddof=1 (pandas .std default)
      val means = Array.tabulate(n)(c => (0 until t).map(z(_)(c)).sum / t)
      val stds = Array.tabulate(n) { c =>
        math.sqrt((0 until t).map(r => math.pow(z(r)(c) - means(c), 2)).sum / (t - 1))
      }
      for (r <- 0 until t; c <- 0 until n) z(r)(c) = (z(r)(c) - means(c)) / stds(c)

      // distributed SVD on the standardized panel
      val rdd = spark.sparkContext.parallelize(
        (0 until t).map(r => IndexedRow(r, Vectors.dense(z(r).clone()))), 8)
      val svd = svdOf(rdd, math.min(n, t))
      val eig = svd.s.map(x => x * x)
      // select_baing re-standardizes ddof=0 internally; on already-
      // standardized Z that rescale is uniform, leaving eigenvalue RATIOS
      // (all the criterion uses) unchanged
      val r0 = selectBaingFromEig(eig, t, n,
        if (kmax > 0) kmax else svd.s.length - 1, p)
      val r = if (p > 0) r0 else (if (kmax > 0) kmax else svd.s.length - 1)

      // E = U_r S_r V_rᵀ at the missing entries only (U collected — the
      // EM bookkeeping is panel-local; the SVD above is the distributed
      // heavy step)
      val uRows = svd.u.rows.map(ir => (ir.index, ir.vector.toArray)).collect().toMap
      for (row <- 0 until t; c <- 0 until n if missing(row)(c)) {
        val u = uRows(row)
        var acc = 0.0
        var j = 0
        while (j < r) { acc += u(j) * svd.s(j) * svd.v(c)(j); j += 1 }
        z(row)(c) = acc
      }
      for (row <- 0 until t; c <- 0 until n) z(row)(c) = z(row)(c) * stds(c) + means(c)

      val num = (0 until t).map(row => (0 until n).map(c =>
        math.pow(z(row)(c) - old(row)(c), 2)).sum).sum
      val den = (0 until t).map(row => (0 until n).map(c =>
        math.pow(z(row)(c), 2)).sum).sum
      done = num / den < tol
    }
    z
  }

  /** OLS t-stat of ρ in the ADF regression
    * Δy_t = α + ρ·y_{t−1} + Σ_{i=1..lags} γ_i Δy_{t−i} + e
    * (statsmodels adfuller regression='c').
    */
  def adfStat(y: Array[Double], lags: Int): Double = {
    val dy = y.sliding(2).map(p => p(1) - p(0)).toArray
    val nobs = dy.length - lags
    require(nobs > lags + 3, "series too short for ADF")
    val yy = Array.tabulate(nobs)(i => dy(i + lags))
    val xs = Array.tabulate(nobs) { i =>
      val lvl = y(i + lags) // y_{t-1}
      val dlags = Array.tabulate(lags)(j => dy(i + lags - 1 - j))
      lvl +: dlags
    }
    val r = graft.backtest.Fit.olsHac(yy, xs, 0)
    // classical (non-robust) OLS se for the ADF t-stat
    val k = r.params.length
    val sse = r.resid.map(v => v * v).sum
    val sigma2 = sse / (nobs - k)
    // re-derive (X'X)^-1 diag via Fit: easier to recompute directly
    val x = xs.map(row => 1.0 +: row)
    val xtx = Array.ofDim[Double](k, k)
    for (t <- 0 until nobs; i <- 0 until k; j <- 0 until k)
      xtx(i)(j) += x(t)(i) * x(t)(j)
    val inv = invertSmall(xtx)
    r.params(1) / math.sqrt(sigma2 * inv(1)(1))
  }

  private def invertSmall(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = Array.tabulate(n, 2 * n)((i, j) =>
      if (j < n) m(i)(j) else if (j - n == i) 1.0 else 0.0)
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      val d = a(c)(c)
      for (j <- 0 until 2 * n) a(c)(j) /= d
      for (r <- 0 until n if r != c) {
        val f = a(r)(c)
        if (f != 0.0) for (j <- 0 until 2 * n) a(r)(j) -= f * a(c)(j)
      }
    }
    Array.tabulate(n, n)((i, j) => a(i)(j + n))
  }

  /** MacKinnon (2010) finite-sample critical value for the 'c' ADF
    * regression: cv = b∞ + b1/T + b2/T². Published response-surface
    * coefficients.
    */
  def adfCriticalValue(t: Int, level: Double): Double = {
    val (b0, b1, b2) = level match {
      case 0.01 => (-3.43035, -6.5393, -16.786)
      case 0.05 => (-2.86154, -2.8903, -4.234)
      case 0.10 => (-2.56677, -1.5384, -2.809)
      case _ => throw new IllegalArgumentException("level must be 0.01/0.05/0.10")
    }
    b0 + b1 / t + b2 / (t.toDouble * t)
  }

  /** Order of integration by iterated ADF (econs.py:198-236
    * `integration_order`): difference until the unit root is rejected at
    * `level` (stat < MacKinnon critical value — the reference compares an
    * interpolated p-value; same decision at the supported levels).
    * Returns −1 if maxOrder exceeded.
    */
  def integrationOrder(y: Array[Double], maxOrder: Int = 5,
                       level: Double = 0.05, lags: Int = 1): Int = {
    var cur = y
    for (i <- 0 until maxOrder) {
      val stat = adfStat(cur, lags)
      if (stat < adfCriticalValue(cur.length, level)) return i
      cur = cur.sliding(2).map(p => p(1) - p(0)).toArray
    }
    -1
  }

  /** F-stats at every candidate break point (econs.py:267-282 `fstats`):
    * ((n−2)/2)·(rse − sse_i)/rse with sse_i the pooled two-segment
    * variance; tails skipped.
    */
  def fstats(x: Array[Double], tail: Double = 0.15): Array[Double] = {
    val n = x.length
    def varP(v: Array[Double]): Double = {
      if (v.isEmpty) 0.0
      else {
        val m = v.sum / v.length
        v.map(d => (d - m) * (d - m)).sum / v.length
      }
    }
    val rse = varP(x)
    val sse = Array.fill(n)(rse)
    val lo = (n * tail).toInt
    val hi = ((1 - tail) * n).toInt
    for (i <- lo to hi if i < n) {
      sse(i) = (varP(x.take(i)) * i + varP(x.drop(i)) * (n - i)) / n
    }
    sse.map(s => ((n - 2) / 2.0) * (rse - s) / rse)
  }
}
