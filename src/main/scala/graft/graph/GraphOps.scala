package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics as declarative DataFrame plans (SURVEY.md §2.9;
  * reference: `finds/recipes/graph.py:185-317` on networkx).
  *
  * The graph is an edge DataFrame (src, dst). Degree/centrality and the
  * neighborhood-overlap link-prediction scores (common neighbors,
  * Jaccard, Adamic-Adar, preferential attachment, resource allocation)
  * are joins + aggregations — fully distributed, no vertex program
  * needed. PageRank is iterated DataFrame joins ([[pageRank]]).
  */
object GraphOps {

  /** Node degrees of an undirected edge list (edges deduped by caller). */
  def degrees(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame =
    edges.select(col(src).as("node"))
      .unionAll(edges.select(col(dst).as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Link-prediction scores for node pairs (a < b) on one side of a
    * bipartite edge list sharing neighbors on the other side:
    * common-neighbor count, Jaccard, Adamic-Adar, preferential
    * attachment (graph.py:295-317).
    */
  def linkPrediction(edges: DataFrame, node: String, neighbor: String): DataFrame = {
    val deg = edges.groupBy(col(node).as("n")).agg(count(lit(1)).as("deg"))
    val nbrDeg = edges.groupBy(col(neighbor).as("nb_")).agg(count(lit(1)).as("nbdeg"))
    val e = edges.select(col(node).as("n"), col(neighbor).as("nb"))
    val shared = e.as("a").join(e.as("b"),
        col("a.nb") === col("b.nb") && col("a.n") < col("b.n"))
      .join(nbrDeg, col("a.nb") === col("nb_"))
      .groupBy(col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("nbdeg"))).as("adamic_adar"),
        sum(lit(1.0) / col("nbdeg")).as("resource_alloc"))
    shared
      .join(deg.select(col("n").as("n_a"), col("deg").as("deg_a")), "n_a")
      .join(deg.select(col("n").as("n_b"), col("deg").as("deg_b")), "n_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("deg_a") + col("deg_b") - col("common")))
      .withColumn("pref_attach", col("deg_a") * col("deg_b"))
  }

  /** PageRank by iterated joins (damping d, fixed iteration count —
    * deterministic; graph.py's networkx pagerank analog). Dangling mass
    * is redistributed uniformly, matching networkx semantics.
    */
  def pageRank(edges: DataFrame, iters: Int = 10, d: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count().toDouble
    val outDeg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("out"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val withOut = ranks.join(outDeg, Seq("node"), "left")
      val dangling = withOut.where(col("out").isNull)
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contribs = withOut.where(col("out").isNotNull)
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), (col("rank") / col("out")).as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - d) / n) + lit(d) * (coalesce(col("in_rank"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
    }
    ranks
  }
}
