package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.Centrality

/** Dev harness: g_hits edge-frame materialization variants. */
object ProfileHits {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    time("warm")(edges.count())
    time("hitsCounts as-is (1)")(Centrality.hitsCounts(edges, 3).count())
    time("hitsCounts as-is (2)")(Centrality.hitsCounts(edges, 3).count())
    time("hitsCounts pre-checkpointed e") {
      val e = edges.distinct().localCheckpoint()
      Centrality.hitsCounts(e, 3).count()
    }
    time("hitsCounts pre-checkpointed e (2)") {
      val e = edges.distinct().localCheckpoint()
      Centrality.hitsCounts(e, 3).count()
    }
    s.stop()
  }
}
