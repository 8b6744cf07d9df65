package graft

import graft.ml.Filters
import graft.text.Edgar

class FiltersSpec extends SparkSpec {

  test("autocorrelation of a series is 1 at lag 0") {
    val x = Array.tabulate(50)(i => math.sin(i * 0.3) + 0.1 * i)
    val (lags, vals) = Filters.crossCorrelation(x, x)
    val at0 = vals(lags.indexOf(0))
    assert(math.abs(at0 - 1.0) < 1e-12)
    assert(vals.forall(_ <= 1.0 + 1e-12))
  }

  test("alignment recovers a planted shift") {
    // y is x displaced by 3 samples: best lag must be ±3 with high corr
    val base = Array.tabulate(80)(i => math.sin(i * 0.7) * math.exp(-0.01 * i))
    val x = base.slice(0, 60)
    val y = base.slice(3, 63)
    val (lags, vals) = Filters.crossCorrelation(x, y)
    val k = vals.indices.maxBy(vals)
    assert(math.abs(lags(k)) == 3, s"got lag ${lags(k)}")
    assert(vals(k) > 0.9) // truncation + damping cost a little correlation
    val aligned = Filters.align(Array(x, y))
    assert(math.abs(aligned.head._3) == 3)
  }

  test("FFT path equals the direct sums at every lag (odd/even/pow2 lengths)") {
    val rng = new scala.util.Random(7)
    for (n <- Seq(31, 50, 64, 127, 512, 1000)) {
      val x = Array.fill(n)(rng.nextGaussian())
      val y = Array.fill(n)(rng.nextGaussian() + 0.3 * x(rng.nextInt(n)))
      val (dl, dv) = Filters.crossCorrelationDirect(x, y)
      val (fl, fv) = Filters.crossCorrelationFft(x, y)
      assert(dl.sameElements(fl), s"lag windows differ at n=$n")
      val worst = dv.zip(fv).map { case (a, b) => math.abs(a - b) }.max
      assert(worst < 1e-9, s"n=$n worst |direct-fft| = $worst")
    }
  }

  test("align's spectrum-reuse path equals per-pair direct alignment") {
    val rng = new scala.util.Random(23)
    val n = 600 // above the FFT threshold: align transforms each column once
    val base = Array.fill(n + 10)(rng.nextGaussian())
    // shifted copies of one series + an independent one: known best lags
    val cols = Array(
      base.slice(0, n), base.slice(4, n + 4), base.slice(9, n + 9),
      Array.fill(n)(rng.nextGaussian()))
    val fftAligned = Filters.align(cols)
    // expected via the direct sums, pair by pair
    val direct = for {
      i <- cols.indices
      j <- (i + 1) until cols.length
    } yield {
      val (lags, vals) = Filters.crossCorrelationDirect(cols(i), cols(j))
      val k = vals.indices.maxBy(vals)
      (i, j, lags(k), vals(k))
    }
    assert(fftAligned.length == direct.length)
    fftAligned.zip(direct).foreach { case ((i1, j1, l1, c1), (i2, j2, l2, c2)) =>
      assert(i1 == i2 && j1 == j2 && l1 == l2, s"pair ($i1,$j1): lag $l1 vs $l2")
      assert(math.abs(c1 - c2) < 1e-9)
    }
    // and the planted displacements are recovered
    assert(fftAligned.find(t => t._1 == 0 && t._2 == 1).get._3.abs == 4)
    assert(fftAligned.find(t => t._1 == 0 && t._2 == 2).get._3.abs == 9)
    // exact = true pins the direct sums above the threshold: the values
    // are BIT-equal to the per-pair direct evaluation (the a10_kpp ρ
    // contract — no FFT round-off reaches an oracle-compared rounding)
    assert(Filters.align(cols, exact = true) == direct)
  }

  test("the dispatcher takes the FFT path above the threshold with identical output") {
    val rng = new scala.util.Random(11)
    val n = Filters.fftThreshold // boundary length: dispatcher goes FFT
    val x = Array.fill(n)(rng.nextGaussian())
    val (_, viaDispatch) = Filters.crossCorrelation(x, x)
    val (lags, viaFft) = Filters.crossCorrelationFft(x, x)
    assert(viaDispatch.sameElements(viaFft))
    // and the FFT autocorrelation still reads exactly 1 at lag 0
    assert(math.abs(viaFft(lags.indexOf(0)) - 1.0) < 1e-9)
  }

  test("Newey-West weighting applies the Bartlett kernel over all lags") {
    val x = Array.tabulate(40)(i => i.toDouble)
    val (lags, vals) = Filters.crossCorrelation(x, x)
    val L = x.length / 2
    val manual = lags.zip(vals)
      .map { case (l, v) => (1.0 - math.abs(l).toDouble / (L + 1)) * v }.sum
    val nw = Filters.neweyWestCorrelation(x, x)
    assert(math.abs(nw - manual) < 1e-12)
    // kernel peaks at lag 0 (weight 1, corr 1) and down-weights the
    // negative far-lag mass of a demeaned trend -> strictly positive
    assert(nw > 0)
  }
}

class EdgarSpec extends SparkSpec {

  private val tenK = """
PART I
ITEM 1. BUSINESS.
We make widgets and gadgets for the industrial market. Our widgets
are renowned across twelve states for durability.
ITEM 1A. RISK FACTORS.
Widgets may break.
ITEM 2. PROPERTIES.
A factory.
PART II
ITEM 7. MANAGEMENT'S DISCUSSION AND ANALYSIS OF FINANCIAL CONDITION
Revenues grew 10% on widget strength. Margins expanded. We expect
continued gadget growth next year driven by replacement demand.
ITEM 7A. QUANTITATIVE AND QUALITATIVE DISCLOSURES ABOUT MARKET RISK.
Interest rate exposure is limited.
ITEM 8. FINANCIAL STATEMENTS.
Numbers follow.
"""

  test("extracts 10-K MD&A between Item 7 and Item 7A") {
    val mda = Edgar.extractItem(tenK, "mda10K")
    assert(mda.contains("REVENUES GREW 10%"), mda.take(200))
    assert(!mda.contains("INTEREST RATE EXPOSURE"))
    assert(mda.startsWith("ITEM 7"))
  }

  test("extracts 10-K business description between Item 1 and 1A") {
    val bus = Edgar.extractItem(tenK, "bus10K")
    assert(bus.contains("WIDGETS AND GADGETS"))
    assert(!bus.contains("RISK FACTORS.\n"))
  }

  test("extracts quantitative disclosures between 7A and 8") {
    val qqr = Edgar.extractItem(tenK, "qqr10K")
    assert(qqr.contains("INTEREST RATE EXPOSURE"))
    assert(!qqr.contains("NUMBERS FOLLOW"))
  }

  test("missing section yields empty, and the UDF runs over a column") {
    assert(Edgar.extractItem("no items here at all", "mda10K") == "")
    import spark.implicits._
    val df = Seq((1, tenK)).toDF("id", "text")
    val out = df.select(Edgar.extractItemUdf("mda10K")($"text").as("mda"))
      .as[String].head()
    assert(out.contains("REVENUES GREW"))
  }
}
