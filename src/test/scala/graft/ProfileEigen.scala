package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Tables

/** Dev harness: g_eigen plan-diet experiment (round-9 verdict #5).
  * The catalog walkCounts builds ONE lazy plan with 6 unrolled
  * join+agg rounds (20 shuffles / deep Catalyst tree). Variants:
  *   A: catalog (single lazy plan)
  *   B: persist the symmetrized edge frame only
  *   C: persist edges + localCheckpoint the iterate every 2nd round
  * Interleaved in one JVM, same catalog query wrapper (max-window +
  * projection) so only the iteration strategy differs.
  */
object ProfileEigen {
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

    def finish(v: DataFrame): Long = {
      import org.apache.spark.sql.expressions.Window
      v.withColumn("__mx", max("w").over(Window.partitionBy(lit(1))))
        .select(col("node"), col("w"), (col("w").cast("double") / col("__mx")).as("score"))
        .count()
    }
    def edges(): DataFrame = graft.queries.GraphQ.nationGraph(s, dir)

    def runA(): Long = finish(graft.graph.Centrality.walkCounts(edges(), 6))

    def runWith(ckptEvery: Int): Long = {
      val und = graft.graph.Centrality.symmetrize(edges())
        .persist(StorageLevel.MEMORY_AND_DISK)
      var v = und.select(col("src").as("node")).distinct().withColumn("w", lit(1L))
      for (i <- 1 to 6) {
        v = und.join(v, und("dst") === v("node"))
          .groupBy(und("src").as("node")).agg(sum("w").as("w"))
        if (ckptEvery > 0 && i % ckptEvery == 0 && i < 6) v = v.localCheckpoint()
      }
      val n = finish(v)
      und.unpersist(false)
      n
    }

    time("warm A")(runA()); time("warm B")(runWith(0)); time("warm C")(runWith(2))
    for (r <- 1 to 3) {
      val a = time(s"A catalog ($r)")(runA())
      val b = time(s"B persist-und ($r)")(runWith(0))
      val c = time(s"C ckpt-every-2 ($r)")(runWith(2))
      println(s"rows: a=$a b=$b c=$c")
    }
    s.stop()
  }
}
