package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev harness: stage-by-stage timing of the g_linkpred pipeline. */
object ProfileLink {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFILE $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("profilelink")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    def edges = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
    time("edges.count")(println(edges.count()))
    val deg = edges.groupBy(col("supp").as("n"))
      .agg(count_distinct(col("cust")).as("deg"))
    time("deg.count")(println(deg.count()))
    val adj = edges.groupBy(col("cust").as("nb"))
      .agg(graft.functions.AggF.cappedSortedSet(col("supp"), 500).as("ns"))
      .where(col("ns").isNotNull)
    time("adj.count")(println(adj.count()))
    time("adj size stats")(println(
      adj.agg(sum(size(col("ns"))), max(size(col("ns")))).head()))
    val byNbr = adj.where(size(col("ns")) > 1)
      .select(col("ns"),
        (lit(1.0) / log(size(col("ns")).cast("double"))).as("w_aa"),
        (lit(1.0) / size(col("ns")).cast("double")).as("w_ra"))
    val exploded = byNbr
      .select(explode(graft.functions.HashF.packedPairs(col("ns"))).as("pk"),
        col("w_aa"), col("w_ra"))
    time("exploded.count")(println(exploded.count()))
    val shared = exploded
      .groupBy("pk")
      .agg(count(lit(1)).as("common"),
        sum(col("w_aa")).as("adamic_adar"),
        sum(col("w_ra")).as("resource_alloc"))
    time("shared.count")(println(shared.count()))
    time("full linkPrediction")(println(
      graft.graph.GraphOps.linkPrediction(edges, "supp", "cust", 500)
        .where(col("common") >= 20).count()))
    time("full linkPrediction (2)")(println(
      graft.graph.GraphOps.linkPrediction(edges, "supp", "cust", 500)
        .where(col("common") >= 20).count()))
    s.stop()
  }
}
