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

    def run(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // does catalog pressure slow g_hits? fresh JVM: 3 reps, then 20 heavy
    // queries to accumulate checkpoint/persist garbage, then 3 reps again,
    // then a System.gc() and 3 more
    for (i <- 1 to 3) println(f"[probe] g_hits fresh rep $i: ${run("g_hits")}%.2f s")
    val noise = Seq("t_jaccard", "t_dupgroups", "t_minhash", "t_simhash", "e_lshdup",
      "g_linkpred", "g_info", "g_community", "g_degree", "g_eigen",
      "s_ivf2", "j15_salted", "t_pipeline", "b1_backtest", "g_triangles",
      "g_components", "a7_vwap", "w2_dedup", "q5_join", "s_lsh")
    noise.foreach(run)
    println("[probe] 20 heavy queries done")
    for (i <- 1 to 3) println(f"[probe] g_hits pressured rep $i: ${run("g_hits")}%.2f s")
    System.gc(); Thread.sleep(2000); System.gc()
    for (i <- 1 to 3) println(f"[probe] g_hits post-gc rep $i: ${run("g_hits")}%.2f s")
    val sm = spark.sparkContext.getExecutorMemoryStatus
    println(s"[probe] storage status: $sm")
    spark.stop()
  }
}
