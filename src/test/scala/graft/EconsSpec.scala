package graft

import graft.ml.Econs

/** Golden tests vs numpy implementations of the exact reference formulas
  * (econs.py): deterministic 2-factor panel T=40 N=6, LCG noise series.
  */
class EconsSpec extends SparkSpec {
  import spark.implicits._

  private val T = 40
  private val N = 6
  private val l1 = Array(1.0, -0.5, 0.8, 0.3, -1.2, 0.6)
  private val l2 = Array(0.2, 1.0, -0.4, 0.9, 0.1, -0.7)
  private def xVal(t: Int, c: Int): Double =
    math.sin(t * 0.35) * l1(c) + math.cos(t * 0.8) * l2(c) +
      0.1 * math.sin(3.7 * t + 1.3 * c)

  private def panelDF = (0 until T)
    .map(t => (xVal(t, 0), xVal(t, 1), xVal(t, 2), xVal(t, 3), xVal(t, 4), xVal(t, 5)))
    .toDF("c0", "c1", "c2", "c3", "c4", "c5")
  private val cols = (0 until N).map(c => s"c$c")

  private def lcg(n: Int, seed: Long = 123456789L): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = (1103515245L * s + 12345L) % (1L << 31)
      s.toDouble / (1L << 31) - 0.5
    }
  }

  test("select_baing picks the numpy ICp2 first local minimum") {
    assert(Econs.selectBaing(panelDF, cols, p = 2) == 4)
  }

  test("mrsq matches the numpy marginal R-squared") {
    val m = Econs.mrsq(panelDF, cols)
    val row0 = Array(0.52693377, 0.46074307, 0.01177686, 0.0005463, 0.0, 0.0)
    val row3 = Array(0.0621215, 0.93070172, 0.0025354, 0.00464138, 0.0, 0.0)
    row0.indices.foreach(j => assert(math.abs(m(0)(j) - row0(j)) < 1e-6, s"m(0)($j)=${m(0)(j)}"))
    row3.indices.foreach(j => assert(math.abs(m(3)(j) - row3(j)) < 1e-6, s"m(3)($j)=${m(3)(j)}"))
  }

  test("approximate_factors EM imputes the numpy fixture values") {
    val miss = Seq((3, 1), (10, 4), (17, 0), (25, 3), (33, 5), (8, 1), (20, 2))
    val expected = Map((3, 1) -> -0.33020894, (10, 4) -> 0.3627875,
      (17, 0) -> -0.26051841, (25, 3) -> 0.6196313, (33, 5) -> -0.72781217,
      (8, 1) -> 0.13172415, (20, 2) -> 0.15756852)
    val rows = (0 until T).map { t =>
      val vals = Array.tabulate(N)(c =>
        if (miss.contains((t, c))) Double.NaN else xVal(t, c))
      (vals(0), vals(1), vals(2), vals(3), vals(4), vals(5))
    }.toDF("c0", "c1", "c2", "c3", "c4", "c5") // NaN marks missing
    val z = Econs.approximateFactors(rows, cols)
    expected.foreach { case ((r, c), v) =>
      assert(math.abs(z(r)(c) - v) < 1e-4, s"z($r)($c)=${z(r)(c)} want $v")
    }
  }

  test("approximateFactors refuses a panel past the driver-collect guard") {
    // the guard is rows x cols cells; a long skinny frame crosses it
    // without materializing anything expensive (the require fires
    // before the collect)
    val wide = spark.range(Econs.MaxDriverPanelCells / N + 1)
      .selectExpr((0 until N).map(c => s"cast(id as double) as c$c"): _*)
    val e = intercept[IllegalArgumentException] {
      Econs.approximateFactors(wide, cols)
    }
    assert(e.getMessage.contains("small macro panels"))
  }

  test("adf stat matches numpy and integration orders resolve") {
    val eps = lcg(120)
    val rw = eps.scanLeft(0.0)(_ + _).tail
    val ar = new Array[Double](120)
    for (t <- 1 until 120) ar(t) = 0.5 * ar(t - 1) + eps(t)
    assert(math.abs(Econs.adfStat(rw, 1) - 0.28431912) < 1e-6)
    assert(math.abs(Econs.adfStat(ar, 1) - (-4.31080413)) < 1e-6)
    assert(Econs.integrationOrder(rw) == 1)
    assert(Econs.integrationOrder(ar) == 0)
  }

  test("fstats break-point statistics match numpy") {
    val x = lcg(30, 42) ++ lcg(30, 99).map(_ + 1.0)
    val fs = Econs.fstats(x)
    assert(fs.indices.maxBy(fs) == 30)
    assert(math.abs(fs.max - 23.52293013) < 1e-6)
    assert(math.abs(fs(20) - 12.22019911) < 1e-6)
  }
}
