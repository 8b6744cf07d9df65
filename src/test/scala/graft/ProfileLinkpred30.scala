package graft

import graft.core.Tables

/** Dev harness: g_linkpred same-JVM rep trajectory at a stress dir —
  * separates AQE/JIT scaled-plan compile cost (which min-of-2 stress
  * reps retain; bench-notes lesson) from the steady state the watchlist
  * ratio should be read against.
  *
  * MEASURED (×30, /tmp/graft_sf3, round 10, calib-clean window):
  * 49.16 / 41.78 / 33.38 / 28.53 / 47.12 s — monotone decline to a
  * ~28.5 s steady state (rep 5 hit a host stall), the same shape
  * ProfileHitsBcast measured for g_hits (23.7→9.6→6.7). So the 46.1 s
  * min-of-2 stress reading carries ~18 s of scaled-plan compile; the
  * steady-state wall ratio vs the 1.52 s clean base is ~19, not the
  * 30.2 the watchlist conservatively reports. Recorded in README's
  * near-gate watch entry.
  */
object ProfileLinkpred30 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf3")
    val s = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("profile")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    for (r <- 1 to 5) {
      time(s"g_linkpred rep $r") {
        SparkEntry.queries("g_linkpred")(s, dir)
          .write.format("noop").mode("overwrite").save()
      }
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
