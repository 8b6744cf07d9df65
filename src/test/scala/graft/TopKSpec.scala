package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.AggF

/** The bounded top-k aggregate must equal the window form
  * row_number().over(partitionBy(g).orderBy(score desc, id asc)) <= k —
  * rows, ranks, and the id tie-break on equal scores.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("q").orderBy(col("s").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q"), col("id").cast("long").as("id"), col("s"), col("rank"))
  }

  private def aggForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("q").agg(AggF.topKNeighbors(col("id"), col("s"), k).as("tk"))
      .select(col("q"), posexplode(col("tk")))
      .select(col("q"), col("col.neighbor_id").as("id"), col("col.cos").as("s"),
        (col("pos") + 1).cast("int").as("rank"))

  test("aggregate equals window form on random scores (multiple k, shuffled input)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(2000).toLong, math.rint(rnd.nextDouble() * 1e6) / 1e6)
    }.distinct
    val df = rows.toDF("q", "id", "s").repartition(16) // force partial buffers + merge
    for (k <- Seq(1, 5, 12)) {
      val w = windowForm(df, k).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val a = aggForm(df, k).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(a == w, s"k=$k")
    }
  }

  test("id tie-break on equal scores matches the window form") {
    // many identical scores: ranking must be by ascending id
    val df = (0 until 100).map(i => (1L, i.toLong, 0.5))
      .toDF("q", "id", "s").repartition(8)
    val a = aggForm(df, 7).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(a == (0 until 7).map(i => (i.toLong, i + 1)))
    val w = windowForm(df, 7).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(a == w)
  }

  test("groups smaller than k emit all rows; int ids are widened") {
    val df = Seq((1, 10, 0.9), (1, 11, 0.8), (2, 12, 0.7))
      .toDF("q", "id", "s")
    val a = aggForm(df, 5).collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == Set((1, 10L, 1), (1, 11L, 2), (2, 12L, 1)))
  }

  test("NaN scores are excluded and cannot poison the buffer order") {
    // NaN rows arrive FIRST: an unfilled buffer that admitted them would
    // leave NaN slots later finite scores can't shift past (every NaN
    // comparison is false), corrupting the (score desc, id asc) invariant
    val df = (Seq((1L, 100L, Double.NaN), (1L, 101L, Double.NaN)) ++
      (0 until 10).map(i => (1L, i.toLong, (i + 1).toDouble)))
      .toDF("q", "id", "s").coalesce(1)
    val a = aggForm(df, 5).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a == Seq((9L, 10.0), (8L, 9.0), (7L, 8.0), (6L, 7.0), (5L, 6.0)))
    // all-NaN group: no entries at all, not k NaN rows
    val allNaN = Seq((2L, 1L, Double.NaN), (2L, 2L, Double.NaN)).toDF("q", "id", "s")
    assert(aggForm(allNaN, 3).count() == 0)
  }

  test("null ids and scores are ignored, not ranked") {
    val df = Seq((1L, Some(10L), Some(0.9)), (1L, None, Some(0.99)), (1L, Some(11L), None))
      .toDF("q", "id", "s")
    val a = aggForm(df, 5).collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(a == Set((10L, 1)))
  }
}
