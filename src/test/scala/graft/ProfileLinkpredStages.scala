package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev harness: g_linkpred stage timings at a stress dir.
  *
  * MEASURED (×30, round 10): the four isolated stages sum to ~10–16 s
  * per rep while the full query runs 28–53 s. Two reasons, both
  * checked: (a) `count()` on the pair aggregate PRUNES the two sum()
  * columns (w_aa/w_ra never evaluated, explode input narrower), so the
  * isolated "explode + pair agg" understates the real stage; (b) the
  * full query adds the two deg joins + jaccard arithmetic over the
  * Σd²/2-row frame. ProfileLinkpredTail tried to split (b) further but
  * the host stalled 60–115 s mid-run — below the noise floor, dropped.
  */
object ProfileLinkpredStages {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf3")
    val s = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("profile")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 2) {
      val edges = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
      val ck = time(s"[$rep] edge build + localCheckpoint") { edges.localCheckpoint() }
      time(s"[$rep] deg agg")(ck.groupBy(col("supp").as("n"))
        .agg(count_distinct(col("cust")).as("deg")).count())
      val adj = ck.groupBy(col("cust").as("nb"))
        .agg(graft.functions.AggF.cappedSortedSet(col("supp"), 500).as("ns"))
        .where(col("ns").isNotNull)
      time(s"[$rep] adjacency agg")(adj.count())
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val byNbr = adj.where(size(col("ns")) > 1)
        .select(col("ns"),
          (lit(1.0) / log(size(col("ns")).cast("double"))).as("w_aa"),
          (lit(1.0) / size(col("ns")).cast("double")).as("w_ra"))
        .repartition(parts)
      val shared = byNbr
        .select(explode(graft.functions.HashF.packedPairs(col("ns"))).as("pk"),
          col("w_aa"), col("w_ra"))
        .groupBy("pk")
        .agg(count(lit(1)).as("common"),
          sum(col("w_aa")).as("adamic_adar"),
          sum(col("w_ra")).as("resource_alloc"))
      val np = time(s"[$rep] explode + pair agg")(shared.count())
      println(s"[$rep] pairs=$np")
      time(s"[$rep] full query")(SparkEntry.queries("g_linkpred")(s, dir)
        .write.format("noop").mode("overwrite").save())
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
