package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** FRED-MD / FRED-QD vintage CSV parsing and tcode transforms
  * (reference `alfred.py:703-790` fred_md/fred_qd and `alfred.py:162-240`
  * Alfred.tcode/transform).
  *
  * File shape: header row of series names (a trailing 'x' is stripped);
  * up to five leading metadata rows whose first cell has no '/' (e.g.
  * "Transform:") carrying per-series integer codes; data rows keyed by a
  * m/d/yyyy date in the first column.
  *
  * The parse is a Spark CSV read; the handful of metadata rows are
  * collected driver-side (≤5 rows by the file contract). Transforms run
  * on the MELTED long frame (series, date, value) with per-series
  * windows — the Spark-native form of the reference's per-column pandas
  * ops, distributed over series × time.
  */
object FredMd {

  final case class Parsed(data: DataFrame, meta: Map[String, Map[String, Int]])

  /** Parse a FRED-MD/QD csv: returns month-end-int-dated wide data and
    * the metadata code maps (label → series → int code).
    */
  def parse(spark: SparkSession, path: String): Parsed = {
    val raw = spark.read.option("header", true).option("inferSchema", false).csv(path)
    val firstCol = raw.columns.head
    // strip trailing 'x' from series names (fred_md: columns.str.rstrip('x'))
    val renamed = raw.columns.tail.map(c => c -> c.replaceAll("x+$", ""))
    val df = renamed.foldLeft(raw) { case (d, (from, to)) =>
      if (from == to) d else d.withColumnRenamed(from, to)
    }
    val series = df.columns.tail

    // metadata rows: first cell contains no '/' (within the first 5 rows)
    val head5 = df.limit(5).collect()
    val meta = head5.filter(r => Option(r.getString(0)).exists(!_.contains("/")))
      .map { r =>
        val label = r.getString(0).toLowerCase.replaceAll("[^a-z]", "")
        label -> series.zipWithIndex
          .flatMap { case (s, i) => // blank metadata cells (FRED-QD) skip, not NPE
            Option(r.getString(i + 1)).map(_.trim).filter(_.nonEmpty)
              .map(v => s -> math.round(v.toDouble).toInt)
          }
          .toMap
      }.toMap

    // data rows: valid m/d/yyyy date, converted to month-end int yyyymmdd
    val dated = df.where(col(firstCol).contains("/"))
      .withColumn("__d", to_date(col(firstCol), "M/d/yyyy"))
      .withColumn("date",
        (year(last_day(col("__d"))) * 10000 + month(last_day(col("__d"))) * 100 +
          dayofmonth(last_day(col("__d")))).cast("int"))
    val data = dated.select(col("date") +: series.map(s =>
      col(s).cast("double").as(s)): _*)
    Parsed(data, meta)
  }

  /** Melt the wide frame to (date, series, value). */
  def melt(data: DataFrame): DataFrame = {
    val series = data.columns.filter(_ != "date")
    data.select(col("date"), explode(map(
      series.flatMap(s => Seq(lit(s), col(s).cast("double"))): _*)).as(Seq("series", "value")))
  }

  /** Transform spec per Alfred.tcode (alfred.py:162-177). */
  final case class TSpec(diff: Int = 0, log: Int = 0, pctChange: Boolean = false,
                         periods: Int = 1, annualize: Int = 1)

  val tcode: Map[Int, TSpec] = Map(
    1 -> TSpec(), 2 -> TSpec(diff = 1), 3 -> TSpec(diff = 2),
    4 -> TSpec(log = 1), 5 -> TSpec(diff = 1, log = 1),
    6 -> TSpec(diff = 2, log = 1), 7 -> TSpec(diff = 1, pctChange = true))

  /** Apply a tcode transform to `valueCol` of a long frame over the
    * per-series window `w` (Alfred.transform alfred.py:206-240):
    * pct_change (with annualize by compounding), then log^k, then diff^k
    * (with annualize by adding).
    */
  def transform(df: DataFrame, valueCol: String, w: WindowSpec, code: Int): DataFrame = {
    val t = tcode(code)
    var out = df
    var c = col(valueCol)
    if (t.pctChange) {
      out = out.withColumn("__t0",
        pow(col(valueCol) / lag(col(valueCol), t.periods).over(w),
          lit(t.annualize)) - 1)
      c = col("__t0")
    }
    for (_ <- 0 until t.log) {
      out = out.withColumn("__tl", log(c)); c = col("__tl")
    }
    for (i <- 0 until t.diff) {
      val name = s"__td$i"
      out = out.withColumn(name, (c - lag(c, t.periods).over(w)) * t.annualize)
      c = col(name)
    }
    out.withColumn("transformed", c)
      .drop(out.columns.filter(_.startsWith("__t")): _*)
  }
}
