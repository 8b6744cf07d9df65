package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.Tables
import graft.graph.Centrality

/** Dev harness: g_hits cost breakdown for the round-7 E2 formulation
  * (edge build / raw ckpt / E2 ckpt / a_{iters-1} ckpt / final),
  * measured at sf0.1.
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
    def edges = graft.queries.GraphQ.hitsEdges(s, dir)
    time("warm edges.count")(edges.count())

    def clear() = s.sharedState.cacheManager.clearCache()

    for (rep <- 1 to 3) {
      clear()
      val raw = time(s"[$rep] raw ckpt (distinct, AQE)") {
        edges.select(col("src").as("s"), col("dst").as("d"))
          .distinct().localCheckpoint()
      }
      if (rep == 1) println(s"[info] raw rows=${raw.count()} partitions=${raw.rdd.getNumPartitions}")
      val nPart = raw.rdd.getNumPartitions.max(1)
      val e2 = time(s"[$rep] E2 ckpt (self-join+agg)") {
        graft.core.Ckpt.partitioned(
          raw.as("l").join(raw.as("r"), col("l.s") === col("r.s"))
            .groupBy(col("l.d").as("p"), col("r.d").as("q"))
            .agg(count(lit(1)).as("w"))
            .repartition(nPart, col("p")))
      }
      if (rep == 1) println(s"[info] e2 rows=${e2.count()} partitions=${e2.rdd.getNumPartitions}")
      def step(a: DataFrame): DataFrame =
        e2.join(a.hint("shuffle_hash"), col("p") === col("node"))
          .groupBy(col("q")).agg(sum(col("w") * col("a")).as("a"))
          .select(col("q").as("node"), col("a"))
      val a1 = e2.groupBy(col("q").as("node")).agg(sum("w").as("a"))
      val a2 = time(s"[$rep] a2 ckpt (step on lazy a1)")(step(a1).localCheckpoint())
      val nodes = raw.select(col("s").as("node"))
        .unionAll(raw.select(col("d").as("node"))).distinct()
      time(s"[$rep] final (a3 + hub + 3-way join)") {
        val a3 = step(a2)
        val hub = raw.join(a2.hint("shuffle_hash"), raw("d") === a2("node"))
          .groupBy(raw("s").as("node")).agg(sum("a").as("h"))
        nodes.join(hub, Seq("node"), "left").join(a3, Seq("node"), "left")
          .select(col("node"), coalesce(col("h"), lit(0L)).as("hub_walks"),
            coalesce(col("a"), lit(0L)).as("auth_walks")).count()
      }
    }

    clear()
    time("hitsCounts as-is (warm, full)")(Centrality.hitsCounts(edges, 3).count())
    clear()
    time("hitsCounts as-is (warm, full 2)")(Centrality.hitsCounts(edges, 3).count())
    s.stop()
  }
}
