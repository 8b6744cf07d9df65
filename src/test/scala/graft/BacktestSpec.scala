package graft

import org.apache.spark.sql.functions._
import graft.backtest.{Backtesting, EventStudy, RiskPremium}
import graft.ml.Finance

class BacktestingSpec extends SparkSpec {
  import spark.implicits._

  // 20 names × 2 rebalances; signal = permno, cap = 1 (equal-weight),
  // NYSE = even permnos (breakpoint population).
  private def cs = (for {
    d <- Seq(202401, 202402)
    p <- 1 to 20
  } yield (p, d, p.toDouble, 1.0, p % 2 == 0))
    .toDF("permno", "rebaldate", "signal", "cap", "nyse")

  test("univariate sort: top/bottom quartile legs, weights sum to +1/-1") {
    val h = Backtesting.univariateSorts(cs, k = 4)
    val sums = h.groupBy("rebaldate")
      .agg(sum(when(col("weight") > 0, col("weight"))).as("long"),
        sum(when(col("weight") < 0, col("weight"))).as("short"))
      .as[(Int, Double, Double)].collect()
    sums.foreach { case (_, l, s) =>
      assert(math.abs(l - 1.0) < 1e-12 && math.abs(s + 1.0) < 1e-12)
    }
    // NYSE (even) quartile breakpoints of 2..20 with the top leg holding
    // the largest signals and bottom leg the smallest
    val top = h.where(col("rebaldate") === 202401 && col("weight") > 0)
      .select("permno").as[Int].collect().toSet
    val bot = h.where(col("rebaldate") === 202401 && col("weight") < 0)
      .select("permno").as[Int].collect().toSet
    assert(top.min > bot.max)
    assert(top.contains(20) && bot.contains(1))
  }

  test("performance: weighted next-period returns with missing-as-zero") {
    val h = Seq((202401, 1, 0.6), (202401, 2, 0.4), (202401, 3, -1.0))
      .toDF("rebaldate", "permno", "weight")
    val r = Seq((1, 202401, 0.10), (2, 202401, -0.05)) // permno 3 missing
      .toDF("permno", "rebaldate", "ret")
    val out = Backtesting.performance(h, r)
      .select("port_ret").as[Double].head()
    assert(math.abs(out - (0.6 * 0.10 + 0.4 * -0.05 + -1.0 * 0.0)) < 1e-12)
  }

  test("daily performance: drift between rebalances matches the reference loop") {
    // rebal 20200101: {A=1: 0.6, B=2: 0.4}; rebal 20200104: {A: 1.0}
    val h = Seq((20200101, 1, 0.6), (20200101, 2, 0.4), (20200104, 1, 1.0))
      .toDF("rebaldate", "permno", "weight")
    val daily = Seq(
      (20200102, 1, Some(0.01), Some(0.01)), (20200102, 2, Some(0.02), Some(0.02)),
      (20200103, 1, Some(-0.01), Some(-0.01)), // B has no row: ret 0, drift 1
      (20200104, 1, Some(0.03), Some(0.03)), (20200104, 2, Some(0.01), Some(0.01)),
      (20200105, 1, Some(0.02), Some(0.02))
    ).toDF("date", "permno", "ret", "retx")
    val out = Backtesting.dailyPerformance(h, daily)
      .select("date", "ret").as[(Int, Double)].collect().toMap
    // hand-run of dailyperformance.py's loop:
    // 0102: .6*.01 + .4*.02 = .014; drift A .606, B .408
    // 0103: .606*(-.01) = -.00606; drift A .59994, B .408
    // 0104: .59994*.03 + .408*.01 = .0220782 (old holdings earn rebal day)
    // 0105: new holdings {A: 1.0}: 1.0*.02 = .02
    assert(math.abs(out(20200102) - 0.014) < 1e-12)
    assert(math.abs(out(20200103) - -0.00606) < 1e-12)
    assert(math.abs(out(20200104) - 0.0220782) < 1e-12)
    assert(math.abs(out(20200105) - 0.02) < 1e-12)
  }

  test("turnover: half L1 distance of weights after drift") {
    val h = Seq((1, 1, 0.5), (1, 2, 0.5), (2, 1, 1.0))
      .toDF("rebaldate", "permno", "weight")
      .select(col("permno"), col("rebaldate"), col("weight"))
    val pairs = Seq((2, 1)).toDF("rebaldate", "prev_rebaldate")
    val retx = Seq((1, 1, 0.0), (2, 1, 0.0)).toDF("permno", "rebaldate", "retx")
    val out = Backtesting.turnover(h, pairs, retx)
      .where(col("rebaldate") === 2).select("turnover").as[Double].head()
    // prev drifted: {1: .5, 2: .5}; new: {1: 1.0} -> |.5| + |.5| over 2 = 0.5
    assert(math.abs(out - 0.5) < 1e-12)
  }
}

class EventStudySpec extends SparkSpec {
  import spark.implicits._

  test("CAR and BHAR paths accumulate within event") {
    val ars = Seq(
      (1, 0, 0.10, 0.00), (1, 1, 0.10, 0.00),
      (2, 0, 0.00, 0.10), (2, 1, 0.00, 0.00)
    ).toDF("event_id", "rel", "ret", "mkt")
    val p = EventStudy.paths(ars)
    val car = p.select("event_id", "rel", "car").as[(Int, Int, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(car((1, 1)) - 0.20) < 1e-12)
    assert(math.abs(car((2, 1)) + 0.10) < 1e-12)
    val bhar = p.select("event_id", "rel", "bhar").as[(Int, Int, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(bhar((1, 1)) - (1.1 * 1.1 - 1.0)) < 1e-9)
    assert(math.abs(bhar((2, 1)) - (1.0 - 1.1)) < 1e-9)
  }

  test("summary t-stats per relative day") {
    val ars = Seq((1, 0, 0.1, 0.0), (2, 0, 0.3, 0.0), (3, 0, 0.2, 0.0))
      .toDF("event_id", "rel", "ret", "mkt")
    val s = EventStudy.summarize(EventStudy.paths(ars), "car")
      .select("rel", "mean", "n").as[(Int, Double, Long)].head()
    assert(s._1 == 0 && math.abs(s._2 - 0.2) < 1e-12 && s._3 == 3)
  }

  test("KPP overlap correction shrinks effective N for clustered dates") {
    // window=2 (rel -1..0), post=4 more days; car paths per announce date
    def path(step: Double) = Array.tabulate(6)(i => step * (i + 1))
    val far = Array((0, path(0.01)), (100, path(0.012)), (200, path(0.009)),
      (300, path(0.011)))
    val near = Array((0, path(0.01)), (1, path(0.012)), (2, path(0.009)),
      (3, path(0.011)))
    val sFar = EventStudy.fitKpp(far, window = 2, d = 4)
    val sNear = EventStudy.fitKpp(near, window = 2, d = 4)
    assert(sFar.tau == 0.0)                       // no overlap at 100-day gaps
    assert(math.abs(sFar.effective - 4.0) < 1e-9) // -> no correction
    assert(sNear.tau > 0.0)
    assert(sNear.effective < 4.0)                 // clustering costs power
    assert(math.abs(sNear.windowT) < math.abs(sFar.windowT) + 1e-9)
    assert(math.abs(sFar.window - 0.02 * 1.05 / 1.0) < 1.0) // sanity: finite
  }
}

class RiskPremiumSpec extends SparkSpec {
  import spark.implicits._

  test("Fama-MacBeth recovers per-date OLS coefficients and their mean") {
    // exact linear cross-sections: date d has intercept d, slope 2d
    val rows = for {
      d <- 1 to 4
      i <- 1 to 30
    } yield (d.toString, d + 2.0 * d * i + 0.0, i.toDouble)
    val df = rows.toDF("date", "y", "x")
    val coefs = RiskPremium.crossSectionalCoefs(df, "y", Seq("x"))
    val m = coefs.select("date", "coef").as[(String, Array[Double])]
      .collect().toMap
    (1 to 4).foreach { d =>
      assert(math.abs(m(d.toString)(0) - d) < 1e-6)
      assert(math.abs(m(d.toString)(1) - 2.0 * d) < 1e-6)
    }
    val prem = RiskPremium.premia(coefs, Seq("x"))
      .select("factor", "premium").as[(String, Double)].collect().toMap
    assert(math.abs(prem("intercept") - 2.5) < 1e-6)  // mean of 1..4
    assert(math.abs(prem("x") - 5.0) < 1e-6)          // mean of 2,4,6,8
  }
}

class FinanceSpec extends SparkSpec {
  import spark.implicits._

  test("Jorion Chapter 5 bootstrap golden values (the reference's only hard assertion)") {
    val ytms = Iterator.iterate(0.0525)(_ + 0.0025).takeWhile(_ < 0.1024).toSeq
    val spots = ytms.foldLeft(Seq.empty[Double]) { (acc, y) =>
      acc :+ Finance.bootstrapSpot(y, acc, m = 2)
    }
    val jorion = Seq(.0797, .0827, .0859, .0892, .0925, .0961, .0997, .1036, .1077, .112)
    spots.takeRight(10).zip(jorion).foreach { case (s, j) =>
      assert(math.abs(s - j) < 1e-4, s"$s vs $j")
    }
  }

  test("par bond prices at 1; zero-coupon Macaulay duration = maturity") {
    assert(math.abs(Finance.bondPrice(0.06, 10, 2, 0.06) - 1.0) < 1e-12)
    val p = Finance.bondPrice(0.0, 10, 2, 0.05)
    assert(math.abs(Finance.macaulayDuration(0.0, 10, 2, p, Seq(0.05)) - 5.0) < 1e-9)
  }

  test("forwards from flat spots are flat; halflife of 0.5 is 1") {
    Finance.forwardsFromSpots(Seq(0.05, 0.05, 0.05), 2).foreach { f =>
      assert(math.abs(f - 0.05) < 1e-9)
    }
    assert(math.abs(Finance.halflife(0.5) - 1.0) < 1e-12)
  }

  test("Parkinson and Garman-Klass vols on a constant-range panel") {
    val df = (1 to 100).map { i =>
      val c = 100.0 + (i % 5)
      (c * math.exp(0.01), c * math.exp(-0.01), c, c)
    }.toDF("high", "low", "open", "close")
    val pk = df.agg(Finance.parkinsonVol(col("high"), col("low"))).as[Double].head()
    // ln(hi/lo) = 0.02 constant -> sqrt(0.02^2 / (4 ln 2))
    assert(math.abs(pk - math.sqrt(0.0004 / (4 * math.log(2)))) < 1e-12)
    val gk = df.agg(Finance.garmanKlassVol(col("open"), col("high"), col("low"), col("close")))
      .as[Double].head()
    assert(gk > 0)
  }
}
