package graft

import org.apache.spark.sql.functions._
import graft.data.{Signals, Stocks, Vintages}

class StocksSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1, 20240110, 0.10, 100.0), (1, 20240115, 0.05, 105.0), (1, 20240215, -0.02, 103.0),
    (2, 20240110, 0.00, 50.0), (2, 20240215, 0.10, 55.0)
  ).toDF("permno", "date", "ret", "prc")

  private def stocks = new Stocks(facts)

  test("getSeries filters range and ids") {
    val out = stocks.getSeries("prc", 20240101, 20240131, Seq(1))
      .select("date").as[Int].collect().sorted
    assert(out.sameElements(Array(20240110, 20240115)))
  }

  test("getSection: prevailing row per id") {
    val out = stocks.getSection(Seq("prc"), 20240131, 20240101)
      .select("permno", "prc").as[(Int, Double)].collect().toMap
    assert(out == Map(1 -> 105.0, 2 -> 50.0))
  }

  test("getRet compounds with null semantics") {
    val out = stocks.getRet("ret", 20240101, 20240131)
      .select("permno", "ret").as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) - (1.10 * 1.05 - 1)) < 1e-12)
    assert(math.abs(out(2) - 0.0) < 1e-12)
  }

  test("getMany exact and as-of") {
    val keys = Seq((1, 20240112), (2, 20240110)).toDF("permno", "date")
    val exact = stocks.getMany(keys, Seq("prc"), exact = true)
      .select("permno", "prc").as[(Int, Option[Double])].collect().toMap
    assert(exact(1).isEmpty && exact(2).contains(50.0))
    val asof = stocks.getMany(keys, Seq("prc"), exact = false)
      .select("permno", "prc").as[(Int, Option[Double])].collect().toMap
    assert(asof(1).contains(100.0) && asof(2).contains(50.0))
  }

  test("getWindow labels relative days") {
    val events = Seq((1, 20240112)).toDF("permno", "date")
    val out = stocks.getWindow("ret", events, -3, 5)
      .select("rel", "ret").as[(Long, Double)].collect().toMap
    assert(out == Map(-2L -> 0.10, 3L -> 0.05))
  }

  test("signals: prepare cleans inf and dedups; section is as-of") {
    val sig = Seq((1, 20240110, 1.0), (1, 20240110, 2.0),
      (1, 20240131, Double.PositiveInfinity), (2, 20240120, 3.0))
      .toDF("permno", "rebaldate", "value")
    val prepared = Signals.prepare(sig, "permno", "rebaldate", "value")
    assert(prepared.count() == 2) // inf dropped, dup deduped
    val sect = Signals.section(prepared, "permno", "rebaldate", 20240131, 20231231)
      .select("permno", "value").as[(Int, Double)].collect().toMap
    // duplicate (1, 20240110) resolves to the SMALLEST value (reference
    // sorts ascending and keeps first)
    assert(sect == Map(1 -> 1.0, 2 -> 3.0))
  }
}

class VintagesSpec extends SparkSpec {
  import spark.implicits._

  // GDP-style revisions: obs date 20240331 released 3 times
  private def obs = Seq(
    ("gdp", 20240331, 20240425, 100.0),
    ("gdp", 20240331, 20240525, 101.0),
    ("gdp", 20240331, 20240625, 102.0),
    ("gdp", 20240630, 20240725, 200.0),
    ("cpi", 20240331, 20240410, 5.0)
  ).toDF("series", "date", "realtime_start", "value")

  test("latest respects the vintage cutoff") {
    val now = Vintages.latest(obs).select("series", "date", "value")
      .as[(String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(now(("gdp", 20240331)) == 102.0)
    val may = Vintages.latest(obs, vintage = 20240531)
      .select("series", "date", "value").as[(String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(may(("gdp", 20240331)) == 101.0)
    assert(!may.contains(("gdp", 20240630))) // not yet published
  }

  test("releaseN picks the exact release") {
    val first = Vintages.releaseN(obs, 1).select("series", "date", "value")
      .as[(String, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(first(("gdp", 20240331)) == 100.0)
    val third = Vintages.releaseN(obs, 3).select("date", "value")
      .as[(Int, Double)].collect().toMap
    assert(third == Map(20240331 -> 102.0)) // only gdp q1 has 3 releases
  }

  test("withinOffset keeps the latest release inside the window") {
    // 60 days after 20240331 = 20240530: releases 1 and 2 qualify
    val out = Vintages.withinOffset(obs, 60)
      .where(col("series") === "gdp" && col("date") === 20240331)
      .select("value").as[Double].head()
    assert(out == 101.0)
  }

  test("revisions measures first-to-last change") {
    val rev = Vintages.revisions(obs)
      .where(col("series") === "gdp" && col("date") === 20240331)
      .select("revision", "n_releases").as[(Double, Long)].head()
    assert(rev == ((2.0, 3L)))
  }
}
