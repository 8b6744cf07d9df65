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
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val v = graft.core.Tables.embeddings(spark, dir)
    time("sigs-only") {
      v.select(col("vec_id"),
        graft.sim.Similarity.lshProjections(
          col("embedding").cast("array<double>"), 12, 4).as("p")).count()
    }
    time("s_lsh-cold")(graft.queries.Catalog.queries("s_lsh")(spark, dir).count())
    spark.sharedState.cacheManager.clearCache()
    time("s_lsh-warm")(graft.queries.Catalog.queries("s_lsh")(spark, dir).count())
    spark.sharedState.cacheManager.clearCache()
    time("t_simhash-warm")(graft.queries.Catalog.queries("t_simhash")(spark, dir).count())

    spark.stop()
  }
}
