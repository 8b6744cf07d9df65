package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NYSE-style fractile assignment (SURVEY.md §2.5 W13): breakpoints are
  * exact quantiles of a *different* population than the values being
  * ranked (`fractile_split` `filters.py:267-287`; used for NYSE-only
  * breakpoints at `crsp.py:249-252`, `backtesting.py:71-76`).
  *
  * `ntile` is NOT equivalent. Semantics replicated exactly:
  * label(v) = 1 + #{breakpoints b : b < v}  (numpy searchsorted side='left';
  * ties land in the lower fractile).
  *
  * Breakpoints are provably small (k−1 values) so collecting them to the
  * driver and folding into a literal when-chain keeps the assignment inside
  * whole-stage codegen — the 100 TB-safe shape (no join, no shuffle).
  */
object Fractiles {

  /** Exact quantile breakpoints (linear interpolation, matching pandas /
    * Spark `percentile` / DuckDB `quantile_cont`) of `valueCol` over the
    * `keysPop` population.
    */
  def breakpoints(keysPop: DataFrame, valueCol: String, k: Int): Array[Double] = {
    val pcts = (1 until k).map(i => i.toDouble / k)
    val row = keysPop
      .agg(expr(s"percentile($valueCol, array(${pcts.mkString(",")}))").as("bp"))
      .head()
    row.getSeq[Double](0).toArray
  }

  /** Fractile label column from literal breakpoints: 1 + count(bp < v);
    * null values stay null.
    */
  def label(value: Column, bps: Array[Double]): Column = {
    val cnt = bps.foldLeft(lit(0)) { (acc, b) => acc + when(value > lit(b), 1).otherwise(0) }
    when(value.isNotNull, cnt + 1)
  }

  /** End-to-end: assign `outCol` fractiles of `valueCol` in `df`, with
    * breakpoints computed from `population` (e.g. NYSE-only subset).
    */
  def split(df: DataFrame, population: DataFrame, valueCol: String, k: Int,
            outCol: String = "fractile"): DataFrame =
    df.withColumn(outCol, label(col(valueCol), breakpoints(population, valueCol, k)))
}
