package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portfolio-sort backtesting (SURVEY.md §3.1; reference:
  * `finds/backtesting/backtesting.py:17-91` univariate_sorts +
  * `finds/backtesting/backtest.py:101-181` BackTest).
  *
  * Everything is distributed per rebalance date in ONE plan — the
  * reference's per-month Python loop becomes groupBy(rebaldate)
  * operations: per-date NYSE breakpoints via grouped exact percentiles,
  * fractile labels via a broadcast breakpoint join, cap weights via
  * window sums. No driver-side iteration over dates, no collect of
  * anything bigger than the breakpoint table (dates × (k−1) doubles).
  */
object Backtesting {

  /** Per-group exact-percentile breakpoints (population may differ from
    * the labeled set — the NYSE-breakpoint rule, filters.py:267-287).
    * Adds `outCol` = 1 + #{breakpoints < value} to `df`.
    */
  def fractilesPerGroup(df: DataFrame, population: DataFrame, groupCol: String,
                        valueCol: String, k: Int, outCol: String): DataFrame = {
    val pcts = (1 until k).map(i => i.toDouble / k)
    val bps = population.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, array(${pcts.mkString(",")}))").as("__bps"))
    df.join(broadcast(bps), Seq(groupCol), "left")
      .withColumn(outCol,
        when(col(valueCol).isNotNull && col("__bps").isNotNull,
          size(filter(col("__bps"), b => b < col(valueCol))) + 1))
      .drop("__bps")
  }

  /** Univariate signal sort into a cap-weighted spread portfolio
    * (backtesting.py:46-81): per rebaldate, label `signal` into `k`
    * fractiles with breakpoints from the `nyse` subset, then cap-weight
    * the top fractile (+) and bottom fractile (−).
    *
    * Input cross-sections: (permno, rebaldate, signal, cap, nyse).
    * Output holdings: (rebaldate, permno, weight) with Σ(+)=1, Σ(−)=−1.
    */
  def univariateSorts(cs: DataFrame, k: Int = 10,
                      minCap: Double = 0.0): DataFrame = {
    val screened = cs.where(col("cap") > minCap && col("signal").isNotNull)
    val labeled = fractilesPerGroup(screened, screened.where(col("nyse")),
      "rebaldate", "signal", k, "fractile")
    val legs = labeled.where(col("fractile") === k || col("fractile") === 1)
      .withColumn("side", when(col("fractile") === k, 1.0).otherwise(-1.0))
    val w = Window.partitionBy("rebaldate", "side")
    legs.withColumn("weight", col("side") * col("cap") / sum("cap").over(w))
      .select("rebaldate", "permno", "weight")
  }

  /** Portfolio performance accounting (backtest.py:132-181): holdings at
    * rebaldate r earn the holding-period return keyed (permno, rebaldate)
    * in `rets` (the caller aligns each rebalance to its next-period
    * compounded return via the calendar, F2/F3 + A1). Missing returns
    * count as 0, as the reference's reindex-fillna does
    * (backtest.py:152-153).
    */
  def performance(holdings: DataFrame, rets: DataFrame): DataFrame =
    holdings
      .join(rets, Seq("permno", "rebaldate"), "left")
      .groupBy("rebaldate")
      .agg(sum(col("weight") * coalesce(col("ret"), lit(0.0))).as("port_ret"),
        count(lit(1)).as("n_holdings"),
        sum(when(col("weight") > 0, col("weight"))).as("long_weight"),
        sum(when(col("weight") < 0, col("weight"))).as("short_weight"))

  /** Bivariate (independent double) sort: fractiles of `signal` and
    * `signal2` assigned independently per rebaldate (both with
    * population-of-record breakpoints), weights cap-weighted within each
    * (f1, f2) cell — the 5×5 size/value grid shape
    * (bivariate sorts backtesting.py:93-205).
    */
  def bivariateSorts(cs: DataFrame, k1: Int, k2: Int): DataFrame = {
    val l1 = fractilesPerGroup(cs.where(col("signal").isNotNull && col("signal2").isNotNull),
      cs.where(col("nyse")), "rebaldate", "signal", k1, "f1")
    val l2 = fractilesPerGroup(l1, cs.where(col("nyse")), "rebaldate", "signal2", k2, "f2")
    val w = Window.partitionBy("rebaldate", "f1", "f2")
    // a rebalance date with NO population-of-record rows gets null
    // fractiles from fractilesPerGroup's left join — those rows belong
    // to no cell, so they take no weight (and the b2_bivariate oracle's
    // breakpoint inner join drops them identically)
    l2.where(col("f1").isNotNull && col("f2").isNotNull)
      .withColumn("weight", col("cap") / sum("cap").over(w))
      .select("rebaldate", "permno", "f1", "f2", "weight")
  }

  /** Overlapping-holdings smoothing (backtest.py:140-149, W11): each
    * permno's weight averaged over its last `k` rebalances (missing
    * months count as 0 — the rolling-queue semantics). The rebalance
    * calendar is derived from the holdings frame's distinct rebaldates;
    * a calendar date with NO holdings at all does not appear in it, so
    * the k-window spans the last k dates WITH holdings (a caller whose
    * screen can empty an entire rebalance should union that date in
    * with zero weights first).
    */
  def smooth(holdings: DataFrame, k: Int): DataFrame = {
    val dates = holdings.select("rebaldate").distinct()
    val grid = dates.crossJoin(holdings.select("permno").distinct())
    val filled = grid.join(holdings, Seq("rebaldate", "permno"), "left")
      .withColumn("w0", coalesce(col("weight"), lit(0.0)))
    val w = Window.partitionBy("permno").orderBy("rebaldate")
      .rowsBetween(-(k - 1), Window.currentRow)
    filled.withColumn("smoothed", avg(col("w0")).over(w))
      .where(col("smoothed") =!= 0.0)
      .select("rebaldate", "permno", "smoothed")
  }

  /** Daily realized returns on periodic holdings
    * (`finds/backtesting/dailyperformance.py:14-47` DailyPerformance):
    * holdings set at rebalance r DRIFT between rebalances — each day the
    * position grows by retx — and the daily portfolio return is
    * Σ drifted-weight × ret. The reference's day-by-day Python loop
    * becomes one plan: assign each daily row its governing rebalance
    * (the latest rebal STRICTLY before the date — on a rebal date the
    * OLD holdings still earn that day's return), window-product the
    * drift, aggregate per date.
    *
    * `holdings`: (rebaldate, permno, weight); `daily`: (date, permno,
    * ret, retx), int YYYYMMDD dates. Missing ret counts 0 and missing
    * retx drifts by 1 (the reference's reindex/fillna); a date appears
    * in the output iff some holding permno has a daily row.
    *
    * The rebalance calendar is a provably small dimension (one value per
    * rebalance), collected like the fractile breakpoints and folded in
    * as an array literal — no shuffle, no broadcast-nested-loop join.
    */
  def dailyPerformance(holdings: DataFrame, daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    val rebals = holdings.select(col("rebaldate").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    val gov = array_max(filter(typedlit(rebals), r => r < col("date").cast("long")))
    val dd = daily.withColumn("__r", gov).where(col("__r").isNotNull)
      .join(holdings.select(col("rebaldate").cast("long").as("__r"),
        col("permno"), col("weight")), Seq("__r", "permno"))
    val w = Window.partitionBy("__r", "permno").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, -1)
    dd.withColumn("__drift",
        coalesce(product(lit(1.0) + coalesce(col("retx"), lit(0.0))).over(w), lit(1.0)))
      .groupBy("date")
      .agg(sum(col("weight") * col("__drift") * coalesce(col("ret"), lit(0.0))).as("ret"),
        count(lit(1)).as("n_holdings"))
  }

  /** Turnover between consecutive holdings after drifting the prior
    * month's weights by retx (backtest.py:156-175): full-outer join of
    * holdings at r with drifted holdings at prev(r).
    *
    * `pairs`: (rebaldate, prev_rebaldate); `retx` keyed (permno, rebaldate).
    */
  def turnover(holdings: DataFrame, pairs: DataFrame, retx: DataFrame): DataFrame = {
    val prev = holdings
      .withColumnRenamed("rebaldate", "prev_rebaldate")
      .withColumnRenamed("weight", "prev_weight")
      .join(pairs, Seq("prev_rebaldate"))
      .join(retx.withColumnRenamed("rebaldate", "prev_rebaldate"),
        Seq("permno", "prev_rebaldate"), "left")
      .withColumn("drifted", col("prev_weight") * (lit(1.0) + coalesce(col("retx"), lit(0.0))))
      .select("rebaldate", "permno", "drifted")
    holdings.join(prev, Seq("rebaldate", "permno"), "full_outer")
      .groupBy("rebaldate")
      .agg((sum(abs(coalesce(col("weight"), lit(0.0)) - coalesce(col("drifted"), lit(0.0)))) / 2)
        .as("turnover"))
  }
}
