package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trading-calendar dimension — "calendars as data" (SURVEY.md §1.1.9,
  * §2.7 F2/F3; reference: `finds/structured/busday.py:83-157`).
  *
  * Calendar math never touches the fact table's scale: a DENSE daily
  * dimension `(di, is_bus, roll_di, roll_seq)` — every calendar day
  * carrying its prevailing business day and its business-day sequence
  * number — turns roll-to-previous into a broadcast hash equi-join on the
  * raw int date (O(1) per fact row; no as-of machinery, no range join),
  * and a k-business-day offset into a second broadcast join on
  * `roll_seq + k`. The dim is a few thousand rows for decades of days.
  */
object Calendar {

  /** Dense daily calendar between two inclusive ISO dates. Business days
    * are Mon-Fri minus `holidays` (int YYYYMMDD), as the reference builds
    * its trading calendar (busday.py:96-125).
    *
    * Columns: `di` int date, `is_bus`, `roll_di` (latest business day
    * ≤ di; null before the first), `roll_seq` (its 1-based sequence).
    */
  def dense(spark: SparkSession, start: String, end: String,
            holidays: Seq[Int] = Nil): DataFrame = {
    val days = spark.range(1).select(
        explode(sequence(lit(start).cast("date"), lit(end).cast("date"),
          expr("interval 1 day"))).as("d"))
      .select(DateInt.fromTimestamp(col("d")).as("di"),
        dayofweek(col("d")).between(2, 6).as("wk")) // Spark: 1=Sunday
    val flagged = days.withColumn("is_bus",
      if (holidays.isEmpty) col("wk") else col("wk") && !col("di").isin(holidays: _*))
    // The cumulative roll/seq need global date order, but a single
    // unpartitioned window serializes the whole dim (and spams WindowExec
    // warnings). Two-level scan instead: per-YEAR cumulative windows, then
    // a per-year prefix (one row per year) folded back in — the only
    // ordered-unpartitioned window left runs on the handful of year rows.
    val wy = Window.partitionBy("yr").orderBy("di")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perYear = flagged
      .withColumn("yr", (col("di") / 10000).cast("int"))
      .select(col("yr"), col("di"), col("is_bus"),
        last(when(col("is_bus"), col("di")), ignoreNulls = true).over(wy).as("roll_in_yr"),
        sum(col("is_bus").cast("long")).over(wy).as("seq_in_yr"))
    val wprev = Window.partitionBy(lit(1)).orderBy("yr")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perYear.groupBy("yr")
      .agg(max(col("roll_in_yr")).as("yr_last_roll"),
        max(col("seq_in_yr")).as("yr_bus"))
      .select(col("yr"),
        last(col("yr_last_roll"), ignoreNulls = true).over(wprev).as("prev_roll"),
        coalesce(sum(col("yr_bus")).over(wprev), lit(0L)).as("prev_bus"))
    perYear.join(broadcast(prefix), "yr")
      .select(col("di"), col("is_bus"),
        coalesce(col("roll_in_yr"), col("prev_roll")).as("roll_di"),
        (col("seq_in_yr") + col("prev_bus")).as("seq0"))
      // days before the first business day have no prevailing roll: their
      // seq must be null too, or offsets from them would spuriously match
      .select(col("di"), col("is_bus"), col("roll_di"),
        when(col("roll_di").isNotNull, col("seq0")).as("roll_seq"))
  }

  /** Business-day-only view `(di, seq)` of [[dense]]. */
  def busdays(cal: DataFrame): DataFrame =
    cal.where(col("is_bus")).select(col("di"), col("roll_seq").as("seq"))

  /** Attach `roll_di`/`roll_seq` (prevailing business day) to `dateCol`
    * (int YYYYMMDD) via broadcast equi-join on the dense dim.
    */
  def rollPrev(df: DataFrame, dateCol: String, cal: DataFrame): DataFrame =
    df.join(broadcast(cal.select(col("di").as(dateCol), col("roll_di"), col("roll_seq"))),
      Seq(dateCol), "left")

  /** The business day `k` steps after `roll_seq` as column `outCol`. */
  def offset(df: DataFrame, cal: DataFrame, k: Int, outCol: String): DataFrame =
    df.join(broadcast(busdays(cal).select((col("seq") - k).as("roll_seq"),
        col("di").as(outCol))),
      Seq("roll_seq"), "left")
}
