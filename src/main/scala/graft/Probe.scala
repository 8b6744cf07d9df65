package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    def edges = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust")).distinct()

    time("edges-default-thresh-cold")(edges.count())
    time("edges-default-thresh-warm")(edges.count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    time("edges-64m-thresh")(edges.count())
    time("edges-64m-thresh-2")(edges.count())
    time("linkpred-64m")(
      graft.queries.Catalog.queries("g_linkpred")(spark, dir).count())
    spark.sharedState.cacheManager.clearCache()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024)
    time("linkpred-default")(
      graft.queries.Catalog.queries("g_linkpred")(spark, dir).count())

    spark.stop()
  }
}
