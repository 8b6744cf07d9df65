package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.Tables
import graft.graph.Centrality

/** Dev harness: g_hits cost breakdown (setup / per-round / final) and
  * candidate restructurings, measured at sf0.1.
  */
object ProfileHits {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFILE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("profile")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    def edges = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    time("warm edges.count")(edges.count())

    def clear() = s.sharedState.cacheManager.clearCache()

    for (rep <- 1 to 2) {
      clear()
      // ---- breakdown of the CURRENT two-step Ckpt.partitioned structure ----
      val raw = time(s"[$rep] raw ckpt (distinct, AQE)") {
        edges.select(col("src").as("s"), col("dst").as("d"))
          .distinct().localCheckpoint()
      }
      println(s"[info] raw partitions: ${raw.rdd.getNumPartitions}")
      val eByD = time(s"[$rep] eByD Ckpt.partitioned(repart d)") {
        graft.core.Ckpt.partitioned(raw.repartition(col("d")))
      }
      val eByS = time(s"[$rep] eByS Ckpt.partitioned(repart s)") {
        graft.core.Ckpt.partitioned(raw.repartition(col("s")))
      }
      val nodes = eByD.select(col("s").as("node"))
        .unionAll(eByD.select(col("d").as("node"))).distinct()
      var auth: DataFrame = null
      var hub: DataFrame = null
      for (i <- 1 to 3) {
        time(s"[$rep] round $i auth ckpt") {
          hub = if (i == 1) eByD.groupBy(col("s").as("node"))
              .agg(count(lit(1)).as("h"))
            else eByD.join(auth.hint("shuffle_hash"), eByD("d") === auth("node"))
              .groupBy(eByD("s").as("node")).agg(sum("a").as("h"))
          auth = eByS.join(hub.hint("shuffle_hash"), eByS("s") === hub("node"))
            .groupBy(eByS("d").as("node")).agg(sum("h").as("a"))
            .localCheckpoint()
        }
      }
      time(s"[$rep] final 3-way join count") {
        nodes.join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
          .select(col("node"), coalesce(col("h"), lit(0L)).as("hub_walks"),
            coalesce(col("a"), lit(0L)).as("auth_walks")).count()
      }
    }

    def loopAndFinal(label: String, eByD: DataFrame, eByS: DataFrame): Unit = {
      val nodes = eByD.select(col("s").as("node"))
        .unionAll(eByD.select(col("d").as("node"))).distinct()
      var auth: DataFrame = null
      var hub: DataFrame = null
      time(label) {
        for (i <- 1 to 3) {
          hub = if (i == 1) eByD.groupBy(col("s").as("node"))
              .agg(count(lit(1)).as("h"))
            else eByD.join(auth.hint("shuffle_hash"), eByD("d") === auth("node"))
              .groupBy(eByD("s").as("node")).agg(sum("a").as("h"))
          auth = eByS.join(hub.hint("shuffle_hash"), eByS("s") === hub("node"))
            .groupBy(eByS("d").as("node")).agg(sum("h").as("a"))
            .localCheckpoint()
        }
        nodes.join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
          .select(col("node"), coalesce(col("h"), lit(0L)).as("hub_walks"),
            coalesce(col("a"), lit(0L)).as("auth_walks")).count()
      }
    }

    for (rep <- 1 to 2) {
      clear()
      // VARIANT B: no pre-partitioning, one raw checkpoint, AQE everywhere
      val raw = time(s"[$rep] B raw ckpt") {
        edges.select(col("src").as("s"), col("dst").as("d"))
          .distinct().localCheckpoint()
      }
      loopAndFinal(s"[$rep] B loop+final (raw both sides)", raw, raw)
    }

    for (rep <- 1 to 2) {
      clear()
      // VARIANT C: preserved partitioning at 8 partitions
      val raw = edges.select(col("src").as("s"), col("dst").as("d"))
        .distinct().localCheckpoint()
      val eByD = time(s"[$rep] C eByD part8") {
        graft.core.Ckpt.partitioned(raw.repartition(8, col("d")))
      }
      val eByS = time(s"[$rep] C eByS part8") {
        graft.core.Ckpt.partitioned(raw.repartition(8, col("s")))
      }
      loopAndFinal(s"[$rep] C loop+final (part8)", eByD, eByS)
    }

    clear()
    time("hitsCounts as-is (warm, full)")(Centrality.hitsCounts(edges, 3).count())
    clear()
    time("hitsCounts as-is (warm, full 2)")(Centrality.hitsCounts(edges, 3).count())
    s.stop()
  }
}
