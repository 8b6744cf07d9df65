package graft.sim

import graft.core.Tables

/** Time one catalog query N times in a fresh JVM (round-14 bench-diff
  * isolation). Usage: Test/runMain graft.sim.ProfileOneQuery <name> <dir> [reps]
  */
object ProfileOneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).getOrElse("5").toInt
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("oneq")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      graft.queries.Catalog.byName(name).fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[oneq] $name rep$i = $dt%.3f s")
      dt
    }
    println(f"[oneq] $name min=${times.min}%.3f s")
    spark.stop()
  }
}
