package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextOps

/** Dev harness: t_jaccard with vs without the exploded-shingle persist. */
object ProfileJaccard {
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

    def run(persist: Boolean): Long = {
      val docs = Tables.documents(s, dir)
      val sh = docs.select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      val wdf = Window.partitionBy("s")
      val ex0 = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        .withColumn("__df", count(lit(1)).over(wdf))
        .where(col("__df") <= 1000).drop("__df")
      val ex = if (persist) ex0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else ex0
      val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      val j = inter
        .join(sizes.select(col("doc_id").as("id_a"), col("nsh").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("nsh").as("nb")), "id_b")
        .withColumn("uni", col("na") + col("nb") - col("inter"))
      val n = j.where(col("inter").cast("double") / col("uni") >= 0.6).count()
      if (persist) ex.unpersist(true)
      n
    }
    time("warm")(run(persist = true))
    time("with persist (1)")(run(persist = true))
    time("no persist (1)")(run(persist = false))
    time("with persist (2)")(run(persist = true))
    time("no persist (2)")(run(persist = false))
    s.stop()
  }
}
