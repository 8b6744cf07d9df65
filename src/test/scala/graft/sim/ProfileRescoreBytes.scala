package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorF

/** Round-12 verdict #1 evidence: the float32 rescore payload's
  * measured byte reduction on the ×243 t_embdup shape.
  *
  * Arm f64 replicates the ROUND-11 rescore exactly (SHUFFLE_HASH
  * hints, `array<double>` payload, graft_dot) over the same candidate
  * generation; arm f32 is the production [[Similarity.cosineDups]]
  * (whose too-big regime casts the payload to float32 below the
  * exchange and scores with graft_dotf). A stage-metrics listener
  * accumulates shuffle write bytes and disk/memory spill bytes per
  * arm — bytes are structural, so one rep per arm suffices (wall
  * times are printed but the BYTES are the claim).
  *
  * MEASURED (round 12, ×243 /tmp/graft_sf24 v3, one JVM, f32 first):
  *   f32  wall 217.2 s  shuffleWrite 51.22 GB  diskSpill 5.32 GB
  *   f64  wall 414.4 s  shuffleWrite 73.26 GB  diskSpill 5.32 GB
  * Disk/mem spill identical across arms (the candidate-generation
  * sort they share verbatim); subtracting the shared write (29.2 GB)
  * isolates the rescore-join payload: 44.06 → 22.02 GB = 2.001×, the
  * structural halving the f32 cast predicted; same-JVM wall 1.91×.
  *
  * Usage: SPARK_GRAFT_SCALED_DIR=/tmp/graft_sf24 \
  *   sbt "Test/runMain graft.sim.ProfileRescoreBytes"
  *
  * Lives in package graft.sim to reach the private[sim] candidate
  * pipeline so the f64 arm shares it verbatim (the arms differ ONLY in
  * the rescore payload).
  */
object ProfileRescoreBytes {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf24")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "243").toInt
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("rescoreBytes")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          diskSpill.addAndGet(m.diskBytesSpilled)
          memSpill.addAndGet(m.memoryBytesSpilled)
        }
      }
    })

    val planes = Capacity.lshPlanes(copies.toLong * Capacity.RefEmbeddingRows, basePlanes = 8)
    val vecs = Tables.embeddings(spark, dir)

    // the r11 form: double payload + SHUFFLE_HASH hints, same candidate
    // generation as cosineDups (threshold/planes/tables/maxBucket match
    // the t_embdup stress override)
    def dupsF64(): DataFrame = {
      val v = Similarity.prepped(vecs, "vec_id", "embedding")
      val tables = 8
      val sigs = v.select(col("vec_id"), Similarity.lshProjections(col("__v"), planes, tables).as("__p"))
        .select(col("vec_id"), explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), Similarity.packSignature(col("__p"), t, planes).as("sig"))): _*)).as("s"))
        .select(col("vec_id"), col("s.tbl"), col("s.sig"))
      val bounded = Similarity.capGroups(sigs, 10000, "tbl", "sig")
      val a = bounded.select(col("vec_id").as("id_a"), col("tbl"), col("sig"))
      val b = bounded.select(col("vec_id").as("id_b"), col("tbl"), col("sig"))
      val cands = a.join(b, Seq("tbl", "sig"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cands
        .join(v.select(col("vec_id").as("id_a"), col("__v").as("va"), col("__n").as("na"))
          .hint("SHUFFLE_HASH"), "id_a")
        .join(v.select(col("vec_id").as("id_b"), col("__v").as("vb"), col("__n").as("nb"))
          .hint("SHUFFLE_HASH"), "id_b")
        .select(col("id_a"), col("id_b"),
          (VectorF.dotp(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
        .where(col("cos") >= 0.9)
    }

    def dupsF32(): DataFrame =
      Similarity.cosineDups(vecs, "vec_id", "embedding", threshold = 0.9,
        planes = planes, tables = 8, maxBucket = 10000)

    def run(label: String, f: () => DataFrame): Unit = {
      shuffleW.set(0); diskSpill.set(0); memSpill.set(0)
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"BYTES $label%-4s wall=$wall%8.1f s  shuffleWrite=${shuffleW.get / 1e9}%8.3f GB" +
        f"  diskSpill=${diskSpill.get / 1e9}%8.3f GB  memSpill=${memSpill.get / 1e9}%8.3f GB")
    }

    // f32 first, then f64 (if the f64 arm exhausts disk it dies last)
    run("f32", dupsF32 _)
    run("f64", dupsF64 _)
    spark.stop()
  }
}
