package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1, 10, "e1"), (1, 20, "e2"), (1, 25, "e3"),
    (2, 15, "e4"), (3, 5, "e5")
  ).toDF("k", "t", "ev")

  private val right = Seq(
    (1, 10, 100.0), (1, 18, 180.0), (1, 25, 250.0),
    (2, 20, 990.0)
  ).toDF("k", "t", "v")

  test("backward as-of with exact matches") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "t", Seq("v"))
      .select("ev", "v").as[(String, Option[Double])].collect().toMap
    assert(out("e1").contains(100.0)) // exact t=10
    assert(out("e2").contains(180.0)) // latest <= 20 is 18
    assert(out("e3").contains(250.0)) // exact t=25
    assert(out("e4").isEmpty)         // right only has t=20 > 15
    assert(out("e5").isEmpty)         // no rows for key 3
  }

  test("backward as-of strict (allowExact=false) skips same-instant rows") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "t", Seq("v"), allowExact = false)
      .select("ev", "v").as[(String, Option[Double])].collect().toMap
    assert(out("e1").isEmpty)          // t=10 exact excluded, nothing earlier
    assert(out("e3").contains(180.0))  // t=25 exact excluded -> 18
  }

  test("forward as-of mirrors backward") {
    val out = AsOf.joinForward(left, right, Seq("k"), "t", Seq("v"))
      .select("ev", "v").as[(String, Option[Double])].collect().toMap
    assert(out("e1").contains(100.0)) // exact
    assert(out("e2").contains(250.0)) // next >= 20 is 25
    assert(out("e4").contains(990.0)) // next >= 15 is 20
    assert(out("e5").isEmpty)
  }

  test("link join: linkdt=0 sentinel matches any date, later links win") {
    val fact = Seq((7, 20240110), (7, 20240301), (8, 20240101)).toDF("gvkey", "d")
    val links = Seq((7, 0, 111), (7, 20240201, 222), (9, 0, 999))
      .toDF("gvkey", "linkdt", "permno")
    val out = AsOf.linkJoin(fact, links, "gvkey", "d", "linkdt", Seq("permno"))
      .select("d", "permno").as[(Int, Option[Int])].collect().toMap
    assert(out(20240110).contains(111)) // only sentinel prevails
    assert(out(20240301).contains(222)) // dated link supersedes sentinel
    assert(out(20240101).isEmpty)       // key 8 has no links (left join)
  }

  test("as-of attributes come from ONE prevailing row, nulls included") {
    // the round-5 ADVICE case: the prevailing link row carries a null
    // attribute; per-column fills would stitch comnam=A from the older
    // row onto permno=2 from the newer — row-level semantics keep the
    // prevailing row's null (pandas merge_asof / correlated-MAX parity)
    val fact = Seq((1, 20240301)).toDF("k", "d")
    val links = Seq(
      (1, 20240101, Some(10), Some("A")),
      (1, 20240201, Some(20), None: Option[String])
    ).toDF("k", "linkdt", "permno", "comnam")
    val out = AsOf.linkJoin(fact, links, "k", "d", "linkdt", Seq("permno", "comnam"))
      .select("permno", "comnam").as[(Option[Int], Option[String])].head()
    assert(out == (Some(20), None))
    // forward mirror: earliest following row wins wholesale
    val right = Seq((1, 20240401, Some(30), None: Option[String]),
      (1, 20240501, Some(40), Some("B"))).toDF("k", "d", "permno", "comnam")
    val fwd = AsOf.joinForward(fact, right, Seq("k"), "d", Seq("permno", "comnam"))
      .select("permno", "comnam").as[(Option[Int], Option[String])].head()
    assert(fwd == (Some(30), None))
  }
}

class CompoundReturnSpec extends SparkSpec {
  import spark.implicits._

  test("pandas prod(min_count=1) semantics: nulls skipped, all-null -> null") {
    val df = Seq(
      ("a", Some(0.10)), ("a", Some(-0.05)), ("a", None),
      ("b", None), ("b", None),
      ("c", Some(-1.5)) // factor -0.5: legal, no log trick
    ).toDF("k", "ret")
    val out = df.groupBy("k").agg(CompoundReturn.compoundRet(col("ret")).as("c"))
      .as[(String, Option[Double])].collect().toMap
    assert(math.abs(out("a").get - (1.10 * 0.95 - 1)) < 1e-12)
    assert(out("b").isEmpty)
    assert(math.abs(out("c").get - (-0.5 - 1)) < 1e-12)
  }

  test("log form agrees with product form on positive-domain groups") {
    val df = (1 to 100).map(i => (i % 7, i / 1000.0)).toDF("k", "ret")
    val both = df.groupBy("k").agg(
        CompoundReturn.compoundRet(col("ret")).as("p"),
        CompoundReturn.compoundRetLog(col("ret")).as("l"))
      .as[(Int, Double, Double)].collect()
    both.foreach { case (_, p, l) => assert(math.abs(p - l) < 1e-10) }
  }
}

class FractilesSpec extends SparkSpec {
  import spark.implicits._

  test("breakpoints come from the population, not the ranked set") {
    // population 1..100 -> median breakpoint 50.5; ranked values all > pop
    val pop = (1 to 100).map(_.toDouble).toDF("v")
    val ranked = Seq(200.0, 300.0).toDF("v")
    val out = Fractiles.split(ranked, pop, "v", 2, "f")
      .select("f").as[Int].collect()
    assert(out.forall(_ == 2)) // everything above all breakpoints
  }

  test("tie lands in the lower fractile (searchsorted side='left')") {
    val pop = (1 to 9).map(_.toDouble).toDF("v") // deciles of 1..9
    val bps = Fractiles.breakpoints(pop, "v", 3)  // terciles
    // a value exactly equal to a breakpoint: label counts strict b < v
    val df = bps.map(b => (b, 0)).toSeq.toDF("v", "dummy")
    val out = df.withColumn("f", Fractiles.label(col("v"), bps))
      .select("v", "f").as[(Double, Int)].collect().toMap
    // v == bps(0) -> no breakpoint strictly below among {bps(0)}? bps(1) not < v
    assert(out(bps(0)) == 1)
    assert(out(bps(1)) == 2)
  }

  test("labels are monotone in value") {
    val pop = (1 to 1000).map(i => math.sin(i) * 100).toDF("v")
    val bps = Fractiles.breakpoints(pop, "v", 10)
    assert(bps.sorted.sameElements(bps))
  }
}

class DateIntSpec extends SparkSpec {
  import spark.implicits._
  import graft.core.DateInt

  test("golden values: endmo/endqr/ffMonthEnd incl leap rules") {
    val df = Seq(20240215, 19000215, 20000215, 20230601, 20231115, 20240101)
      .toDF("d")
      .select(col("d"),
        DateInt.endmo(col("d")).as("eom"),
        DateInt.endqr(col("d")).as("eoq"),
        DateInt.ffMonthEnd(col("d")).as("ff"))
      .as[(Int, Int, Int, Int)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(df(20240215) == ((20240229, 20240331, 20240630)))  // 2024 leap
    assert(df(19000215) == ((19000228, 19000331, 19000630)))  // 1900 not leap
    assert(df(20000215) == ((20000229, 20000331, 20000630)))  // 2000 leap
    assert(df(20230601) == ((20230630, 20230630, 20240630)))  // m=6 -> next yr
    assert(df(20231115) == ((20231130, 20231231, 20240630)))
    assert(df(20240101) == ((20240131, 20240331, 20240630)))
  }

  test("offset round trip between int date and DateType") {
    val df = Seq(19991231, 20240229).toDF("d")
      .select(DateInt.fromTimestamp(DateInt.toDate(col("d")).cast("timestamp")).as("rt"),
        col("d")).as[(Int, Int)].collect()
    df.foreach { case (rt, d) => assert(rt == d) }
  }
}

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tick test keeps zeros (align_trades np.sign(diff).fillna(0))") {
    // prices: 10 (no prior -> 0), 11 (+1), 11 (0), 10.5 (-1), 10.5 (0)
    val df = Seq((1, 10.0), (2, 11.0), (3, 11.0), (4, 10.5), (5, 10.5))
      .toDF("seq", "px")
    val w = Window.orderBy("seq")
    val out = df.withColumn("s", WindowOps.tickSign(col("px"), w))
      .select("seq", "s").as[(Int, Double)].collect().toMap
    assert(out == Map(1 -> 0.0, 2 -> 1.0, 3 -> 0.0, 4 -> -1.0, 5 -> 0.0))
  }

  test("classic tick test forward-fills zero runs with the prior sign") {
    val df = Seq((1, 10.0), (2, 11.0), (3, 11.0), (4, 10.5), (5, 10.5))
      .toDF("seq", "px")
    val w = Window.orderBy("seq")
    val out = df.withColumn("s", WindowOps.classicTickSign(col("px"), w))
      .select("seq", "s").as[(Int, Option[Double])].collect().toMap
    assert(out(1).isEmpty)            // no prior trade
    assert(out(2).contains(1.0))
    assert(out(3).contains(1.0))      // zero-run carries prior sign
    assert(out(4).contains(-1.0))
    assert(out(5).contains(-1.0))
  }

  test("reverse cumprod after: split back-adjustment shape") {
    // factors 2, 3, 4 -> adj = prod of LATER factors: 12, 4, 1
    val df = Seq((1, 2.0), (2, 3.0), (3, 4.0)).toDF("seq", "f")
    val w = Window.orderBy("seq")
    val out = df.withColumn("adj", WindowOps.reverseCumProdAfter(col("f"), w))
      .select("seq", "adj").as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) - 12.0) < 1e-9)
    assert(math.abs(out(2) - 4.0) < 1e-9)
    assert(math.abs(out(3) - 1.0) < 1e-9)
  }

  test("reverse cumprod: a non-positive later factor nulls the prefix, not silently skips") {
    // factor -0.5 at seq 3 (retx <= -1): log() is null and sum() would
    // drop it from the product — rows before it must read NULL instead
    val df = Seq((1, 2.0), (2, 3.0), (3, -0.5), (4, 4.0)).toDF("seq", "f")
    val w = Window.orderBy("seq")
    val out = df.withColumn("adj", WindowOps.reverseCumProdAfter(col("f"), w))
      .select("seq", "adj").as[(Int, Option[Double])].collect().toMap
    assert(out(1).isEmpty && out(2).isEmpty, s"prefix must be null: $out")
    assert(out(3).exists(v => math.abs(v - 4.0) < 1e-9)) // window after 3 is clean
    assert(out(4).exists(v => math.abs(v - 1.0) < 1e-9))
  }

  test("islands increment on value change") {
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "a")).toDF("seq", "v")
    val w = Window.orderBy("seq")
    val out = df.withColumn("i", WindowOps.islandId(col("v"), w))
      .select("seq", "i").as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 1L, 2 -> 1L, 3 -> 2L, 4 -> 3L))
  }
}

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips to exact quantiles") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Outliers.winsorize(df, "v", 0.10, 0.90, "w")
      .agg(min("w"), max("w")).as[(Double, Double)].head()
    assert(out._1 > 1.0 && out._2 < 100.0)
    assert(math.abs(out._1 - 10.9) < 1e-9 && math.abs(out._2 - 90.1) < 1e-9)
  }

  test("iqr fence nulls outliers, keeps body") {
    val df = ((1 to 20).map(_.toDouble) :+ 1000.0).toDF("v")
    val out = Outliers.iqrFence(df, "v", 1.5, "f")
    assert(out.where(col("f").isNull).count() == 1)
  }

  test("fused winsorizeAndFence equals winsorize + iqrFence") {
    val df = (((1 to 40).map(_ * 1.7) :+ 500.0) :+ -200.0).toDF("v")
    val fused = Outliers.winsorizeAndFence(df, "v", 0.05, 0.95, 1.5, "w", "f")
      .select("v", "w", "f").as[(Double, Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    val twoPass = Outliers.iqrFence(Outliers.winsorize(df, "v", 0.05, 0.95, "w"),
        "v", 1.5, "f")
      .select("v", "w", "f").as[(Double, Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(fused == twoPass)
  }

  test("saltedJoin is row-identical to the plain join on a skewed key") {
    // hot key: 5000 of 6000 left rows share k=0; right has 1-3 rows/key
    val left = ((0 until 5000).map(i => (0, i)) ++
      (0 until 1000).map(i => (1 + i % 50, i))).toDF("k", "lv")
    val right = (0 until 51).flatMap(k => (0 to k % 3).map(j => (k, k * 10 + j)))
      .toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").as[(Int, Int, Int)].collect().sorted.toSeq
    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 8)
    assert(canon(salted) == canon(plain))
    // left join: unmatched left rows appear exactly once despite salting
    val left2 = left.union(Seq((999, -1)).toDF("k", "lv"))
    val plainL = left2.join(right, Seq("k"), "left")
      .select("k", "lv", "rv").as[(Int, Int, Option[Int])].collect().sorted.toSeq
    val saltedL = Skew.saltedJoin(left2, right, Seq("k"), 8, "left")
      .select("k", "lv", "rv").as[(Int, Int, Option[Int])].collect().sorted.toSeq
    assert(saltedL == plainL)
    // the join condition actually carries the salt (hot key split across
    // buckets): the physical join keys include __salt
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("__salt"), planStr.take(500))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("k"), 8, "full_outer")
    }
  }
}
