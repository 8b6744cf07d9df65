package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.core.Tables

/** Round-13 investigation harness: per-stage shuffle/spill bytes of the
  * big-regime [[Similarity.lshTopK]] at a given stress decade — the
  * ×2187 attempt died on disk inside s_lsh's scaled run and the stress
  * harness's aggregate wall numbers can't say which stage wrote the
  * bytes. Prints EVERY completed stage's shuffle write / spill with its
  * name, then the totals; on a disk-death the per-stage trail up to the
  * failure is the diagnosis.
  *
  * Usage: SPARK_GRAFT_SCALED_DIR=/tmp/graft_sf219 SPARK_GRAFT_COPIES=2187 \
  *   sbt "Test/runMain graft.sim.ProfileLshBytes"
  */
object ProfileLshBytes {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf219")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "2187").toInt
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("lshBytes")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val totW = new java.util.concurrent.atomic.AtomicLong
    val totS = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          totW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          totS.addAndGet(m.diskBytesSpilled)
          if (m.shuffleWriteMetrics.bytesWritten > 100L * 1024 * 1024 ||
              m.diskBytesSpilled > 100L * 1024 * 1024)
            println(f"STAGE ${sc.stageInfo.stageId}%5d rows=${m.shuffleWriteMetrics.recordsWritten}%12d " +
              f"write=${m.shuffleWriteMetrics.bytesWritten / 1e9}%8.2f GB " +
              f"spill=${m.diskBytesSpilled / 1e9}%8.2f GB  ${sc.stageInfo.name.take(80)}")
        }
      }
    })

    val planes = Capacity.lshPlanes(copies.toLong * Capacity.RefEmbeddingRows)
    println(s"[lsh] dir=$dir copies=$copies planes=$planes")
    val t0 = System.nanoTime()
    try {
      val out = Similarity.lshTopK(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 5, planes = planes, tables = 4)
      out.write.format("noop").mode("overwrite").save()
      println(f"[lsh] wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    } catch {
      case e: Throwable =>
        println(f"[lsh] DIED after ${(System.nanoTime() - t0) / 1e9}%.1f s: ${e.getMessage.take(200)}")
    }
    println(f"[lsh] totals: write=${totW.get / 1e9}%.2f GB spill=${totS.get / 1e9}%.2f GB")
    spark.stop()
  }
}
