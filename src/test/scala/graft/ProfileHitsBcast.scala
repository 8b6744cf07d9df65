package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.Centrality

/** Dev harness: A/B the broadcast-tier edge feed for hitsCounts at
  * stress scale — lazy chain off the raw localCheckpoint (current)
  * vs off the two Ckpt.partitioned copies (the round-8 formulation).
  * Interleaved reps in one JVM so JIT/warm state can't favor a side
  * (the filtered-ScaleStress comparison that motivated this was
  * confounded exactly that way: a g_hits-only run warms 1/14th of
  * what the full run warms).
  */
object ProfileHitsBcast {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFILE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** The r8 broadcast chain: rounds consume the partitioned copies. */
  private def hitsCountsPartitioned(edges0: DataFrame, iters: Int): DataFrame = {
    val raw = edges0.select(col("src").as("s"), col("dst").as("d"))
      .distinct().localCheckpoint()
    val nPart = raw.rdd.getNumPartitions.max(1)
    val eByD = graft.core.Ckpt.partitioned(raw.repartition(nPart, col("d")))
    val eByS = graft.core.Ckpt.partitioned(raw.repartition(nPart, col("s")))
    var hub: DataFrame = null
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      hub =
        if (i == 1) eByS.groupBy(col("s").as("node")).agg(count(lit(1)).as("h"))
        else eByS.select(col("s"), col("d").as("node"))
          .join(broadcast(auth), Seq("node"))
          .groupBy(col("s")).agg(sum("a").as("h"))
          .select(col("s").as("node"), col("h"))
      auth = eByD.select(col("d"), col("s").as("node"))
        .join(broadcast(hub), Seq("node"))
        .groupBy(col("d")).agg(sum("h").as("a"))
        .select(col("d").as("node"), col("a"))
    }
    hub.join(auth.hint("shuffle_hash"), Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub_walks"),
        coalesce(col("a"), lit(0L)).as("auth_walks"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf3")
    val s = graft.core.Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("hitsbcast")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    def edges = graft.queries.GraphQ.hitsEdges(s, dir)
    def runRaw(): Unit = {
      // maxLocalEdges=0 forces past the local tier (the point is the
      // broadcast tier at stress scale)
      Centrality.hitsCounts(edges, iters = 3, maxLocalEdges = 0L)
        .write.format("noop").mode("overwrite").save()
      s.sharedState.cacheManager.clearCache()
    }
    def runPart(): Unit = {
      hitsCountsPartitioned(edges, iters = 3)
        .write.format("noop").mode("overwrite").save()
      s.sharedState.cacheManager.clearCache()
    }
    time("warm raw")(runRaw()); time("warm part")(runPart())
    for (rep <- 1 to 3) {
      time(s"[$rep] raw-chain")(runRaw())
      time(s"[$rep] partitioned-chain")(runPart())
    }
    s.stop()
  }
}
