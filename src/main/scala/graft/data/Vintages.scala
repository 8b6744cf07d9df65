package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Bitemporal (vintage) series — ALFRED semantics (SURVEY.md §1.1.8,
  * §2.5 W12; reference: `Alfred.construct_series`
  * `finds/readers/alfred.py:334-406`).
  *
  * Observations: `(series, date, realtime_start, value)` int dates.
  * Three release-selection modes, matching the reference's dedup
  * directions exactly (hard-part #7 in SURVEY.md §7.5):
  *   - latest-within-vintage: keep='last' after the vintage filter;
  *   - exact release n (1-based): cumcount then keep='first';
  *   - latest within a date offset: filter then keep='last'.
  */
object Vintages {

  private def vintaged(obs: DataFrame, vintage: Int): DataFrame =
    obs.where(col("realtime_start") <= vintage && col("value").isNotNull)

  /** Latest value of each (series, date) as known at `vintage`
    * (alfred.py:388-390: drop_duplicates keep='last' on realtime order).
    */
  def latest(obs: DataFrame, vintage: Int = 99991231): DataFrame =
    Dedup.keepLast(vintaged(obs, vintage), Seq("series", "date"),
      Seq(col("realtime_start")))

  /** Exactly the `n`-th release (1-based) of each (series, date)
    * (alfred.py:391-394: cumcount + keep='first').
    */
  def releaseN(obs: DataFrame, n: Int, vintage: Int = 99991231): DataFrame = {
    val w = Window.partitionBy("series", "date").orderBy("realtime_start")
    vintaged(obs, vintage)
      .withColumn("release", row_number().over(w))
      .where(col("release") === n)
      .drop("release")
  }

  /** Latest release published within `offsetDays` calendar days of the
    * observation date (alfred.py:395-398). Int-date day arithmetic goes
    * through DateType to stay calendar-correct.
    */
  def withinOffset(obs: DataFrame, offsetDays: Int, vintage: Int = 99991231): DataFrame = {
    val cutoff = graft.core.DateInt.fromTimestamp(
      date_add(graft.core.DateInt.toDate(col("date")), offsetDays).cast("timestamp"))
    Dedup.keepLast(
      vintaged(obs, vintage).where(col("realtime_start") <= cutoff),
      Seq("series", "date"), Seq(col("realtime_start")))
  }

  /** Revision magnitude per (series, date): first-to-latest value change
    * — the vintage-diagnostics view of the same observations.
    */
  def revisions(obs: DataFrame): DataFrame = {
    val w = Window.partitionBy("series", "date").orderBy("realtime_start")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    obs.where(col("value").isNotNull)
      .withColumn("first_value", first(col("value")).over(w))
      .withColumn("last_value", last(col("value")).over(w))
      .groupBy("series", "date")
      .agg(min("first_value").as("first_value"),
        min("last_value").as("last_value"),
        count(lit(1)).as("n_releases"))
      .withColumn("revision", col("last_value") - col("first_value"))
  }
}
