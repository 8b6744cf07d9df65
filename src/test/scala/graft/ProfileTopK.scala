package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{AggF, VectorF}

/** Dev harness: window row_number vs bounded top-k aggregate on the ANN
  * rescoring tail — measured interleaved in one JVM. Pipelines:
  *  (1) s_knn shape: brute-force all-pairs cosine over sf0.1 embeddings
  *      (2000 × 1999 rescored rows → top-5 per query);
  *  (2) IVF-candidates shape: synthetic 2M-row (query, neighbor, cos)
  *      frame with 2000 query groups.
  */
object ProfileTopK {
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

    def scoredPairs(): DataFrame = {
      val v = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
        .withColumn("__n", sqrt(VectorF.dotp(col("__v"), col("__v"))))
      val a = v.select(col("vec_id").as("query_id"), col("__v").as("va"), col("__n").as("na"))
      val b = v.select(col("vec_id").as("neighbor_id"), col("__v").as("vb"), col("__n").as("nb"))
      a.join(b, col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(VectorF.dotp(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
    }
    def knnWindow(): Long = {
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      scoredPairs().withColumn("rank", row_number().over(w)).where(col("rank") <= 5).count()
    }
    def knnAgg(): Long =
      scoredPairs().groupBy("query_id")
        .agg(AggF.topKNeighbors(col("neighbor_id"), col("cos"), 5).as("tk"))
        .select(col("query_id"), posexplode(col("tk"))).count()

    def synth(): DataFrame =
      s.range(0, 2000000).select(
        (col("id") % 2000).as("query_id"),
        (col("id") / 2000).cast("long").as("neighbor_id"),
        (pmod(hash(col("id")), lit(1000000)).cast("double") / 1e6).as("cos"))
    def synthWindow(): Long = {
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      synth().withColumn("rank", row_number().over(w)).where(col("rank") <= 5).count()
    }
    def synthAgg(): Long =
      synth().groupBy("query_id")
        .agg(AggF.topKNeighbors(col("neighbor_id"), col("cos"), 5).as("tk"))
        .select(col("query_id"), posexplode(col("tk"))).count()

    time("warm knn window")(knnWindow()); time("warm knn agg")(knnAgg())
    time("warm synth window")(synthWindow()); time("warm synth agg")(synthAgg())
    for (r <- 1 to 3) {
      val a = time(s"knn window ($r)")(knnWindow())
      val b = time(s"knn agg    ($r)")(knnAgg())
      val c = time(s"synth window ($r)")(synthWindow())
      val d = time(s"synth agg    ($r)")(synthAgg())
      println(s"rows: knn w=$a a=$b | synth w=$c a=$d")
    }
    s.stop()
  }
}
