package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one catalog query (noop write, repeated).
  * Usage: runMain graft.TimeQ <queryName> [sfDir] [reps]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // match the bench harness: drop per-query persisted intermediates so
      // every rep measures a full recompute (reps would otherwise reuse a
      // frame the query persisted internally and understate per-run cost)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
