package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted tumbling-bin aggregation (SURVEY.md §2.4 A8; reference:
  * `finds/readers/taq.py:417-491` bin_quotes).
  *
  * Each row's state lasts from its timestamp to the next row's (per key);
  * its weight inside a bin is the OVERLAP of that validity interval with
  * the bin. A state spanning several bins contributes to each — the
  * reference achieves this by reindexing onto union(event ts, bin edges)
  * and forward-filling across bins; here the interval is exploded onto
  * the bin grid it covers (explode factor bounded by interval/bin), all
  * arithmetic integral (µs) so bins are exact.
  */
object TimeWeighted {

  /** Per (keys, bin): time-weighted mean of each `valueCols`, plus
    * `covered_us` and `n_spans`. `usCol` must be epoch-micros long;
    * `seqCol` breaks same-instant ties; `sessionEndUs` closes each key's
    * last span.
    */
  def bins(df: DataFrame, keys: Seq[String], usCol: String, seqCol: String,
           valueCols: Seq[String], binUs: Long, sessionEndUs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(usCol, seqCol)
    val spans = df
      .withColumn("next_us", coalesce(lead(col(usCol), 1).over(w), lit(sessionEndUs)))
      .where(col("next_us") > col(usCol))
    val binOf = (c: org.apache.spark.sql.Column) => c - pmod(c, lit(binUs))
    val exploded = spans
      .withColumn("bin_us",
        explode(sequence(binOf(col(usCol)), binOf(col("next_us") - 1), lit(binUs))))
      .withColumn("overlap",
        least(col("next_us"), col("bin_us") + binUs) - greatest(col(usCol), col("bin_us")))
    val aggs =
      valueCols.map(c => (sum(col(c) * col("overlap")) / sum(col("overlap"))).as(s"tw_$c")) ++
        Seq(sum(col("overlap")).as("covered_us"), count(lit(1)).as("n_spans"))
    exploded.groupBy((keys :+ "bin_us").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
