package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shape(label: String, aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val e = spark.range(0, 100000)
        .select((col("id") % 1000).as("s"), (col("id") % 777).as("d"))
      val ck = e.repartition(col("d")).distinct().localCheckpoint()
      val v = ck.groupBy(col("d").as("node")).agg(sum("s").as("a"))
      val j = ck.join(v.hint("shuffle_hash"), ck("d") === v("node"))
      val plan = j.queryExecution.executedPlan.treeString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(s"[probe] aqe=$aqe exchanges-in-join-plan=$nEx")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("ExistingRDD"))
        .mkString("\n"))
    }
    shape("ck-join", aqe = true)
    shape("ck-join", aqe = false)

    // the combination that matters: materialize the checkpoint with AQE
    // OFF (plan partitioning stays HashPartitioning), consume it with AQE
    // back ON (the session default)
    spark.conf.set("spark.sql.adaptive.enabled", false)
    val e = spark.range(0, 100000)
      .select((col("id") % 1000).as("s"), (col("id") % 777).as("d"))
    val ck = e.repartition(col("d")).distinct().localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", true)
    val v = ck.groupBy(col("d").as("node")).agg(sum("s").as("a"))
    val j = ck.join(v.hint("shuffle_hash"), ck("d") === v("node"))
    val plan = j.queryExecution.executedPlan.treeString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"[probe] ckpt-noaqe-join-aqe exchanges=$nEx")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("ExistingRDD"))
      .mkString("\n"))
    spark.stop()
  }
}
