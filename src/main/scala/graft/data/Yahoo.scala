package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.WindowOps

/** Yahoo daily-price splice (reference `real_time.py:60-82`): convert raw
  * (Close, Dividends, Stock Splits, Volume) history into CRSP-shaped
  * (prc, ret, retx, divamt, vol), split-adjusting backward and iterating
  * the retx/prc reconciliation — the price path is rebuilt from the LAST
  * unadjusted close discounted by ex-dividend returns, twice, because
  * divret's denominator is itself the rebuilt price.
  *
  * All per-ticker window ops over (ticker, date) — the reference's
  * per-symbol pandas loop distributes as one plan.
  */
object Yahoo {

  def splice(df: DataFrame, ticker: String = "ticker",
             date: String = "date"): DataFrame = {
    val w = Window.partitionBy(ticker).orderBy(date)
    val whole = Window.partitionBy(ticker)
      .orderBy(date).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // product of FUTURE split factors: a 2:1 split on day s scales all
    // pre-s rows by 2 (real_time.py:72-73 shift(-1) reverse-cumprod)
    val withSplit = df
      .withColumn("__split", WindowOps.reverseCumProdAfter(
        when(col("stock_splits") =!= 0.0, col("stock_splits")).otherwise(1.0), w))
      .withColumn("__last_prc", last(abs(col("close"))).over(whole))
      .withColumn("vol", col("volume") / col("__split"))
      .withColumn("divamt", coalesce(abs(col("dividends")) * col("__split"), lit(0.0)))
      .withColumn("ret", abs(col("close")) / lag(abs(col("close")), 1).over(w) - 1)
      .withColumn("prc", abs(col("close")) * col("__split"))
    // two reconciliation rounds (real_time.py:78-81): divret's denominator
    // is the prior-iteration price path
    val reconciled = (1 to 2).foldLeft(withSplit) { (d, _) =>
      d.withColumn("__divret",
          coalesce(col("divamt") / abs(lag(col("prc"), 1).over(w)), lit(0.0)))
        .withColumn("retx", col("ret") - col("__divret"))
        .withColumn("prc",
          col("__last_prc") /
            WindowOps.reverseCumProdAfter(lit(1.0) + col("retx"), w) * col("__split"))
    }
    reconciled.drop("__split", "__last_prc", "__divret")
  }
}
