package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed dedup with deterministic keep-first/keep-last semantics
  * (SURVEY.md §2.5 W2): the reference's ubiquitous
  * `sort_values().drop_duplicates(keep=...)` (`sql.py:49-52`,
  * `structured.py:111-114`, `signals.py:92-93`, quote same-timestamp dedup
  * `taq.py:377-378`).
  *
  * `row_number` over (pk, ordering) — one shuffle on the pk, map-side
  * nothing to combine; at scale prefer pk = the table's bucketing key so
  * the exchange is elided.
  */
object Dedup {

  def keepLast(df: DataFrame, pk: Seq[String], order: Seq[Column]): DataFrame =
    keep(df, pk, order.map(_.desc))

  def keepFirst(df: DataFrame, pk: Seq[String], order: Seq[Column]): DataFrame =
    keep(df, pk, order.map(_.asc))

  private def keep(df: DataFrame, pk: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate-group detector over arbitrary columns (LLM-pipeline
    * exact dedup): keeps the row with the smallest `idCol` per group and
    * reports group size. Hash-groupBy — fully distributed.
    */
  def exactGroups(df: DataFrame, byCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(byCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
}
