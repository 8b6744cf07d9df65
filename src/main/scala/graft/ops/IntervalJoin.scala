package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins for event windows (SURVEY.md §2.3 J6/J7:
  * `Stocks.get_window` `stocks.py:227-294`) and interval lookups (J13,
  * `Sectoring.__getitem__` `sectoring.py:128-133`).
  *
  * A naive `a.join(b, cond)` with only range predicates plans a
  * broadcast-nested-loop join; the scale path here *bins* the range onto a
  * coarse grid and equi-joins on (key, bin) first, so Catalyst plans a hash
  * join and the range predicate only filters within bins (SURVEY.md §4.2.5).
  */
object IntervalJoin {

  /** Join fact rows to events where `fact(timeCol)` ∈
    * [event(loCol), event(hiCol)], equi-matching on `keys`.
    * `binWidth` (in the time column's units) controls the equi-join grid;
    * intervals are exploded onto every grid cell they overlap.
    */
  def joinRange(
      events: DataFrame,
      fact: DataFrame,
      keys: Seq[String],
      timeCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {

    val binned = events.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    val factB = fact.withColumn("__bin", floor(col(timeCol) / binWidth))
    binned.join(factB, keys :+ "__bin")
      .where(col(timeCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }

  /** Static interval lookup (J13): map a code column into named ranges
    * `[lo, hi)` from a small dimension — broadcast join, no binning needed.
    */
  def lookup(df: DataFrame, dim: DataFrame, codeCol: String,
             loCol: String, hiCol: String): DataFrame =
    df.join(broadcast(dim),
      col(codeCol) >= col(loCol) && col(codeCol) < col(hiCol), "left")
}
