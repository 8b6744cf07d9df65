package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.GraphOps

/** Dev profiling harness (Test/runMain graft.ProfileLinkpred) — stage
  * timings for the g_linkpred hot path; not part of the test suite.
  */
object ProfileLinkpred {
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

    val raw = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
    time("warm: raw count")(raw.count())
    time("deg count_distinct only") {
      raw.groupBy(col("supp").as("n")).agg(count_distinct(col("cust")).as("deg")).count()
    }
    time("persist materialize") {
      val p = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p.unpersist(true); ()
    }
    time("full linkPrediction no-persist") {
      val deg = raw.groupBy(col("supp").as("n")).agg(count_distinct(col("cust")).as("deg"))
      val adj = raw.groupBy(col("cust").as("nb"))
        .agg(graft.functions.AggF.cappedSortedSet(col("supp"), 500).as("ns"))
        .where(col("ns").isNotNull)
        .where(size(col("ns")) > 1)
        .select(col("ns"),
          (lit(1.0) / log(size(col("ns")).cast("double"))).as("w_aa"),
          (lit(1.0) / size(col("ns")).cast("double")).as("w_ra"))
      val shared = adj
        .select(explode(graft.functions.HashF.packedPairs(col("ns"))).as("pk"),
          col("w_aa"), col("w_ra"))
        .groupBy("pk")
        .agg(count(lit(1)).as("common"),
          sum(col("w_aa")).as("adamic_adar"),
          sum(col("w_ra")).as("resource_alloc"))
        .select(shiftrightunsigned(col("pk"), 32).cast("int").as("n_a"),
          col("pk").bitwiseAND(lit(0xffffffffL)).cast("int").as("n_b"),
          col("common"), col("adamic_adar"), col("resource_alloc"))
      shared
        .join(deg.select(col("n").as("n_a"), col("deg").as("deg_a")), "n_a")
        .join(deg.select(col("n").as("n_b"), col("deg").as("deg_b")), "n_b")
        .withColumn("jaccard",
          col("common").cast("double") / (col("deg_a") + col("deg_b") - col("common")))
        .withColumn("pref_attach", col("deg_a") * col("deg_b"))
        .where(col("common") >= 20).count()
    }
    time("full linkPrediction (after warm)") {
      GraphOps.linkPrediction(raw, "supp", "cust", maxNeighborDegree = 500)
        .where(col("common") >= 20).count()
    }
    time("full linkPrediction (again)") {
      GraphOps.linkPrediction(raw, "supp", "cust", maxNeighborDegree = 500)
        .where(col("common") >= 20).count()
    }
    // one-shuffle variant: adjacency straight from raw via collect_set
    time("collect_set adjacency only") {
      raw.groupBy("cust").agg(sort_array(collect_set(col("supp"))).as("ns"))
        .where(size(col("ns")).between(2, 500))
        .select(explode(graft.functions.HashF.packedPairs(col("ns"))).as("pk"),
          (lit(1.0) / log(size(col("ns")).cast("double"))).as("w_aa"))
        .groupBy("pk").agg(count(lit(1)).as("common"), sum("w_aa").as("aa"))
        .where(col("common") >= 20).count()
    }
    s.stop()
  }
}
