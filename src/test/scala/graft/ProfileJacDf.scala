package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextOps

/** Dev harness (r17, VERDICT #3): t_jaccard's document-frequency prune.
  * The catalog form computes df with count().over(Window.partitionBy(h))
  * — an Exchange(h) plus a full SORT of the exploded shingle stream
  * inside WindowExec. Variants (interleaved, one JVM):
  *   A: catalog form (window df + persist)
  *   B: df via groupBy(h).count + equi-join back on h (same Exchange(h),
  *      hash-agg + hash-join instead of the sort; join side MERGE-pinned
  *      by the same chars/4 probe the catalog form uses)
  *   C: catalog form WITHOUT the persist (exchange reuse dedups the
  *      window subtree across the three consumers)
  */
object ProfileJacDf {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("profilejacdf")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    val maxDf = 1000

    def finish(exB: DataFrame): Long = {
      val docs = Tables.documents(s, dir)
      val exBig = {
        val thresh = org.apache.spark.sql.graftx.Bridge.broadcastThreshold(s)
        val r = docs.agg(sum(length(col("text")))).head()
        val chars = if (r.isNullAt(0)) 0L else r.getLong(0)
        thresh < 0 || (chars + 1) / 4 * (8L + 8L + 16L) > thresh
      }
      def noBcast(df: DataFrame) = if (exBig) df.hint("MERGE") else df
      val sizes = exB.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val inter = noBcast(exB.as("a")).join(noBcast(exB.as("b")),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      val j = inter
        .join(sizes.select(col("doc_id").as("id_a"), col("nsh").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("nsh").as("nb")), "id_b")
        .withColumn("uni", col("na") + col("nb") - col("inter"))
      j.where(col("inter").cast("double") / col("uni") >= 0.6).count()
    }

    def ex0() = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.shingleHashes(col("text"), 3)).as("h"))

    def runA(): Long = {
      val ex = ex0()
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("h")))
        .where(col("__df") <= maxDf).drop("__df")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = finish(ex); ex.unpersist(blocking = false); n
    }

    def runB(): Long = {
      val docs = Tables.documents(s, dir)
      val thresh = org.apache.spark.sql.graftx.Bridge.broadcastThreshold(s)
      val r = docs.agg(sum(length(col("text")))).head()
      val chars = if (r.isNullAt(0)) 0L else r.getLong(0)
      val dfBig = thresh < 0 || (chars + 1) / 4 * (8L + 8L) > thresh
      val e = ex0()
      val df = e.groupBy("h").agg(count(lit(1)).as("__df"))
        .where(col("__df") <= maxDf).drop("__df")
      val dfh = if (dfBig) df.hint("MERGE") else df
      val ex = e.join(dfh, "h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = finish(ex); ex.unpersist(blocking = false); n
    }

    def runC(): Long = {
      val ex = ex0()
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("h")))
        .where(col("__df") <= maxDf).drop("__df")
      finish(ex)
    }

    for (rep <- 1 to 3) {
      println(s"A=${time(s"A window+persist rep$rep")(runA())}")
      println(s"B=${time(s"B agg+join rep$rep")(runB())}")
      println(s"C=${time(s"C window nopersist rep$rep")(runC())}")
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
