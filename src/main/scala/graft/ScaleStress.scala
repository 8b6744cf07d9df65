package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scale-stress harness (round-5 verdict #5): generate an sf≈1 dataset by
  * replicating sf0.1 `copies`× with RE-KEYED ids and DECORRELATED
  * content, then time the hot query families at both scales in one JVM
  * and assert near-linear growth (default: ≤ 12× for 10× data; override
  * with SPARK_GRAFT_STRESS_MAX).
  *
  * Decorrelation matters more than replication: a verbatim copy would
  * plant every document/vector as a 10-way cross-copy near-duplicate and
  * the dedup queries would go quadratic BY CONSTRUCTION, measuring the
  * generator rather than the engine. Instead each copy applies
  *   - documents: a per-copy character bijection (`translate` over the 9
  *     most frequent letters, rotated by copy) — shingle equality WITHIN
  *     a copy is exactly preserved (bijections preserve string equality),
  *     so each copy carries the original's planted near-dup structure,
  *     while cross-copy shingles almost surely differ;
  *   - embeddings: a cyclic shift of the 64 dimensions by 7·copy — norms
  *     and within-copy cosines are exactly preserved, cross-copy cosines
  *     decorrelate;
  *   - events: key-space shift of user/event ids — 10× as-of key groups
  *     of the original series lengths;
  *   - orders/lineitem: key-space shift of order/customer/supplier ids —
  *     the bipartite customer→supplier graphs become 10 disjoint copies,
  *     so the graph family (HITS counts, link prediction) is measured at
  *     10× vertices and edges with per-copy structure preserved.
  *
  * Usage: runMain graft.ScaleStress [outDir]   (default /tmp/graft_sf1)
  * Generation is skipped when outDir already has documents.parquet.
  */
object ScaleStress {

  private val stressQueries =
    Seq("t_minhash", "t_dupgroups", "t_jaccard", "t_simhash", "t_pipeline",
      "s_lsh", "e_lshdup", "j2_asof", "g_hits", "g_linkpred")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val maxRatio = sys.env.getOrElse("SPARK_GRAFT_STRESS_MAX", "12.0").toDouble
    val spark = Tables.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$outDir/documents.parquet").isDirectory) {
      System.err.println(s"[stress] generating ${copies}x of $baseDir -> $outDir")
      generate(spark, baseDir, outDir, copies)
    } else System.err.println(s"[stress] reusing $outDir")

    // JIT/Janino warm pass on the smallest sf so neither timed scale pays
    // first-compile costs (same rationale as Bench's warm pass)
    val warmDir = new java.io.File(new java.io.File(baseDir).getParentFile, "sf0.001")
    if (warmDir.isDirectory) stressQueries.foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir.getPath)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[stress] warm $q: ${e.getMessage}") }
      spark.sharedState.cacheManager.clearCache()
    }

    def timeQ(q: String, dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min

    val rows = stressQueries.map { q =>
      val b = timeQ(q, baseDir)
      val s = timeQ(q, outDir)
      val r = s / math.max(b, 1e-9)
      println(f"[stress] $q%-12s base=$b%7.2f s  x$copies=$s%7.2f s  ratio=$r%5.2f")
      (q, b, s, r)
    }
    val js = rows.map { case (q, b, s, r) =>
      f""""$q":{"base":$b%.3f,"scaled":$s%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"stress":"sf0.1 x$copies","maxRatio":$maxRatio,"queries":$js}""")
    spark.stop()

    val bad = rows.filter(_._4 > maxRatio)
    if (bad.nonEmpty) {
      System.err.println("super-linear queries: " +
        bad.map(t => f"${t._1} (${t._4}%.1fx)").mkString(", "))
      sys.exit(1)
    }
  }

  private def generate(spark: SparkSession, baseDir: String, outDir: String,
                       copies: Int): Unit = {
    val rot = "etaoinsrh"
    def rotated(c: Int): String = {
      val k = c % rot.length
      rot.drop(k) + rot.take(k)
    }

    val docs = Tables.documents(spark, baseDir)
    (0 until copies).map { c =>
      docs.select(
        (col("doc_id") + c * 1000000L).as("doc_id"),
        (if (c == 0) col("text")
         else translate(col("text"), rot, rotated(c))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = Tables.embeddings(spark, baseDir)
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)
    (0 until copies).map { c =>
      val k = (c * 7) % dim
      val shifted =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k))
      emb.select((col("vec_id") + c * 1000000L).as("vec_id"),
        shifted.as("embedding"), col("label"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val ev = Tables.events(spark, baseDir)
    (0 until copies).map { c =>
      ev.select((col("event_id") + c * 10000000L).as("event_id"), col("ts"),
        (col("user_id") + c * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val ord = Tables.orders(spark, baseDir)
    (0 until copies).map { c =>
      ord.withColumn("o_orderkey", col("o_orderkey") + c * 100000000L)
        .withColumn("o_custkey", col("o_custkey") + c * 1000000L)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    val li = Tables.lineitem(spark, baseDir)
    (0 until copies).map { c =>
      li.withColumn("l_orderkey", col("l_orderkey") + c * 100000000L)
        .withColumn("l_suppkey", col("l_suppkey") + c * 1000000L)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }
}
