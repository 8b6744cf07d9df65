package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event studies (SURVEY.md §3.2; reference:
  * `finds/backtesting/eventstudy.py:72-284`).
  *
  * Input is the LONG event matrix `(event_id, rel, ret, mkt)` produced by
  * the windowed range join (J7 — see the `j7_eventmatrix` catalog query):
  * one row per event per relative day. CAR/BHAR are cumulative windows
  * within each event; the cross-event summary is a groupBy(rel). The
  * events×days matrix never materializes on the driver.
  */
object EventStudy {

  /** Abnormal-return paths (eventstudy.py:120-122):
    * car = Σ (ret − mkt), bhar = Π(1+ret) − Π(1+mkt), cumulative in rel.
    */
  def paths(ars: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_id").orderBy("rel")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ars
      .withColumn("ar", col("ret") - col("mkt"))
      .withColumn("car", sum(col("ar")).over(w))
      .withColumn("bhar",
        exp(sum(log1p(col("ret"))).over(w)) - exp(sum(log1p(col("mkt"))).over(w)))
  }

  /** Mean path and naive t-stats per relative day (eventstudy.py:231,
    * 264-278 without the KPP overlap correction — that correction needs
    * the event-date overlap structure and runs on the aggregated matrix).
    */
  def summarize(paths: DataFrame, valueCol: String = "car"): DataFrame =
    paths.groupBy("rel")
      .agg(avg(col(valueCol)).as("mean"),
        stddev_samp(col(valueCol)).as("std"),
        count(lit(1)).as("n"))
      .withColumn("tstat", col("mean") / (col("std") / sqrt(col("n"))))
      .orderBy("rel")

  /** Post-event drift window stat: mean of `valueCol` over rel in
    * [relFrom, relTo] per event, then a one-sample t across events
    * (eventstudy.py:264-278).
    */
  def windowStat(paths: DataFrame, valueCol: String,
                 relFrom: Int, relTo: Int): DataFrame = {
    paths.where(col("rel").between(relFrom, relTo))
      .groupBy("event_id").agg(avg(col(valueCol)).as("x"))
      .agg(avg(col("x")).as("mean"), stddev_samp(col("x")).as("std"),
        count(lit(1)).as("n"))
      .withColumn("tstat", col("mean") / (col("std") / sqrt(col("n"))))
  }
}
