package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): times the
  * catalog queries named on the command line, N reps each (min-of-N
  * absorbs the first-rep JIT/codegen cost), on SPARK_GRAFT_SF_DIR.
  *   sbt "runMain graft.Probe g_hits g_linkpred"
  * SPARK_GRAFT_REPS overrides the rep count (default 4).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt

    def run(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    val qs = if (args.nonEmpty) args.toSeq else Seq("g_hits")
    for (q <- qs) {
      val times = (1 to reps).map(_ => run(q))
      println(f"[probe] $q%-16s min ${times.min}%6.2f s   reps ${times.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
