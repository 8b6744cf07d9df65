package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BEA IOUse-style code-membership regrouping (reference
  * `bea.py:420-456`: merge member industry codes into a historical
  * sectoring scheme by summing datavalue over the member set, on both
  * the row and column axes, then dropping the member codes).
  *
  * The pandas per-scheme loop becomes one broadcast membership join per
  * axis + re-aggregation — a single shuffle on the (col, row) key at any
  * matrix size.
  */
object Bea {

  /** Apply one regroup scheme: every code in `mapping`'s value lists is
    * replaced by its group code on BOTH axes, datavalue summed.
    * Codes not in any member list pass through unchanged.
    */
  def regroupIoUse(df: DataFrame, mapping: Map[String, Seq[String]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = mapping.toSeq.flatMap { case (g, members) => members.map(_ -> g) }.distinct
    // a member code in two groups would FAN OUT its fact rows through the
    // membership join and double-count datavalue — fail fast instead
    val ambiguous = pairs.groupBy(_._1).filter(_._2.size > 1).keys
    require(ambiguous.isEmpty,
      s"ambiguous regroup mapping — member codes in multiple groups: ${ambiguous.mkString(", ")}")
    val m = pairs.toDF("__old", "__new")
    df
      .join(broadcast(m).withColumnRenamed("__old", "rowcode"), Seq("rowcode"), "left")
      .withColumn("rowcode", coalesce(col("__new"), col("rowcode"))).drop("__new")
      .join(broadcast(m).withColumnRenamed("__old", "colcode"), Seq("colcode"), "left")
      .withColumn("colcode", coalesce(col("__new"), col("colcode"))).drop("__new")
      .groupBy("colcode", "rowcode")
      .agg(sum("datavalue").as("datavalue"))
  }

  /** Drop excluded col/row code prefixes (bea.py:454-456 keep/drop). */
  def screenIoUse(df: DataFrame, dropPrefixes: Seq[String]): DataFrame =
    dropPrefixes.foldLeft(df)((d, p) =>
      d.where(!col("colcode").startsWith(p) && !col("rowcode").startsWith(p)))
}
