package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.QHelp.{bi, r6}

/** Dev harness: where do g_linkpred's last ~30 s at x30 go?
  *
  * MEASURED (×30, round 10): rep1 full/filtered/projection =
  * 100.7/62.4/39.2 s, rep2 = 25.6/115.6/33.4 s — the host stalled
  * 60–115 s inside individual writes, so the three variants are not
  * separable on this VM (rep2's full-write 25.6 s is the one clean
  * sample and matches ProfileLinkpred30's ~28.5 s steady state).
  * Conclusion recorded there; no structural tail cost was isolable
  * above the noise floor.
  */
object ProfileLinkpredTail {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
        .localCheckpoint()
      val lp = graft.graph.GraphOps.linkPrediction(edges, "supp", "cust", maxNeighborDegree = 500)
      // full aggregate output incl. the two sums (count() would prune them)
      time(s"[$rep] lp full write (no filter)")(
        lp.write.format("noop").mode("overwrite").save())
      time(s"[$rep] lp filtered write")(
        lp.where(col("common") >= 20).write.format("noop").mode("overwrite").save())
      time(s"[$rep] catalog projection write")(
        lp.where(col("common") >= 20)
          .select(bi(col("n_a")).as("supp_a"), bi(col("n_b")).as("supp_b"),
            bi(col("common")).as("common"), r6(col("jaccard")).as("jaccard"),
            r6(col("adamic_adar")).as("adamic_adar"), bi(col("pref_attach")).as("pref_attach"))
          .write.format("noop").mode("overwrite").save())
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
