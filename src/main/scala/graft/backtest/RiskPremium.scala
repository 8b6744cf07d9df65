package graft.backtest

import breeze.linalg.{inv, DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-date OLS output row (top-level for encoder derivation). */
case class DateCoefs(date: String, coef: Array[Double], n: Long)

/** Fama-MacBeth risk premia (SURVEY.md §2.4 A9; reference:
  * `finds/backtesting/riskpremium.py:42-82` + least_squares
  * `finds/recipes/econs.py:238-265`).
  *
  * Stage 1 — per-date cross-sectional OLS — is a groupByKey(date) with a
  * tiny k×k normal-equations solve per group (k = #factors, a handful):
  * each date's cross-section streams through one task, nothing collects.
  * Stage 2 — the time-series mean/sem of the per-date coefficients — is a
  * trivial aggregate over #dates rows.
  */
object RiskPremium {

  /** Per-date OLS coefficients of `y` on `xCols` (+ intercept).
    * Input df: (date, y, xCols...). Output: (date, coef array —
    * intercept first then xCols order, n).
    */
  def crossSectionalCoefs(df: DataFrame, yCol: String, xCols: Seq[String]): DataFrame = {
    val k = xCols.size + 1
    val cols = Seq(col("date").cast("string").as("date"),
      col(yCol).cast("double").as("y")) ++
      xCols.map(c => col(c).cast("double").as(c))
    val rows = df.select(cols: _*).na.drop()
    val spark = df.sparkSession
    import spark.implicits._
    val xNames = xCols // stable local for closure
    rows.as[org.apache.spark.sql.Row](org.apache.spark.sql.Encoders.row(rows.schema))
      .groupByKey(_.getAs[String]("date"))
      .mapGroups { (date, it) =>
        val xtx = DenseMatrix.zeros[Double](k, k)
        val xty = DenseVector.zeros[Double](k)
        var n = 0L
        it.foreach { r =>
          val x = DenseVector(1.0 +: xNames.map(c => r.getAs[Double](c)).toArray)
          xtx += x * x.t
          xty += x * r.getAs[Double]("y")
          n += 1
        }
        val coef =
          if (n >= k) try (inv(xtx) * xty).toArray
          catch { case _: Throwable => Array.empty[Double] }
          else Array.empty[Double]
        DateCoefs(date, coef, n)
      }
      .toDF()
  }

  /** Fama-MacBeth premia: time-series mean, standard error and t of each
    * per-date coefficient (riskpremium.py:73-82).
    */
  def premia(coefs: DataFrame, xCols: Seq[String]): DataFrame = {
    val spark = coefs.sparkSession
    import spark.implicits._
    val names = ("intercept" +: xCols).zipWithIndex.map(_.swap).toDF("i", "factor")
    coefs.where(size(col("coef")) === xCols.size + 1)
      .select(posexplode(col("coef")).as(Seq("i", "c")))
      .join(broadcast(names), Seq("i"))
      .groupBy("factor")
      .agg(avg(col("c")).as("premium"),
        (stddev_samp(col("c")) / sqrt(count(lit(1)))).as("sem"),
        count(lit(1)).as("n_dates"))
      .withColumn("tstat", col("premium") / col("sem"))
  }
}
