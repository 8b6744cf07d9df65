package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev harness: fused ShingleHash61 head, window vs prefix topology only
  * (for big stress dirs where the old catalog form is too slow to rep).
  */
object ProfileJacFused {
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
    def exFused(): org.apache.spark.sql.DataFrame =
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.HashF.shingleHash61(col("text"), 3)).as("h"))
    def runFusedWindow(): Long = {
      val wdf = Window.partitionBy("h")
      val ex = exFused()
        .withColumn("__df", count(lit(1)).over(wdf))
        .where(col("__df") <= 1000).drop("__df")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      val j = inter
        .join(sizes.select(col("doc_id").as("id_a"), col("nsh").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("nsh").as("nb")), "id_b")
        .withColumn("uni", col("na") + col("nb") - col("inter"))
      val n = j.where(col("inter").cast("double") / col("uni") >= 0.6).count()
      ex.unpersist(true)
      n
    }
    def runFusedPrefix(): Long = {
      val grouped = exFused()
        .groupBy("h").agg(collect_list("doc_id").as("ds"))
        .where(size(col("ds")) <= 1000)
      val docsets = grouped
        .select(explode(col("ds")).as("doc_id"), size(col("ds")).as("df"), col("h"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sorted"))
        .select(col("doc_id"),
          transform(col("sorted"), x => x.getField("h")).as("hs"),
          transform(col("sorted"), x => x.getField("df")).as("dfs"),
          size(col("sorted")).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val p = col("n") - floor((col("n") * lit(3) + lit(4)) / lit(5)).cast("int") + lit(1)
      val prefix = docsets
        .select(col("doc_id"), col("n"), posexplode(arrays_zip(col("hs"), col("dfs"))))
        .where(col("pos") < p && col("col.dfs") >= 2)
        .select(col("col.hs").as("h"), col("doc_id"), col("n"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")
            && least(col("a.n"), col("b.n")) * lit(5) >= greatest(col("a.n"), col("b.n")) * lit(3))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val ver = cand
        .join(docsets.select(col("doc_id").as("id_a"), col("hs").as("hs_a"), col("n").as("na")), "id_a")
        .join(docsets.select(col("doc_id").as("id_b"), col("hs").as("hs_b"), col("n").as("nb")), "id_b")
        .withColumn("i", size(array_intersect(col("hs_a"), col("hs_b"))))
        .withColumn("uni", col("na") + col("nb") - col("i"))
      val n = ver.where(col("i").cast("double") / col("uni") >= 0.6).count()
      docsets.unpersist(true)
      n
    }
    time("warm (fusedwin)")(runFusedWindow())
    time("warm (fusedprefix)")(runFusedPrefix())
    val e1 = time("fused+window (1)")(runFusedWindow())
    val f1 = time("fused+prefix (1)")(runFusedPrefix())
    val e2 = time("fused+window (2)")(runFusedWindow())
    val f2 = time("fused+prefix (2)")(runFusedPrefix())
    val e3 = time("fused+window (3)")(runFusedWindow())
    val f3 = time("fused+prefix (3)")(runFusedPrefix())
    println(s"rows: e=$e1/$e2/$e3 f=$f1/$f2/$f3 (must all be equal)")
    s.stop()
  }
}
