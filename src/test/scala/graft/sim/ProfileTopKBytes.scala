package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorF

/** Round-12 top-k prefilter evidence: shuffle/spill bytes of the ANN
  * top-k rescore, measured per arm over the ×243 s_ivf2 shape (the
  * decade where BOTH arms still complete — at ×729 the f32 arm died on
  * one node's disk, which is the qualitative half of the claim).
  *
  * Arm f32 replicates the pre-prefilter ivfTopKFixed verbatim
  * (candidate generation + SHUFFLE_HASH float32 rescore joins + the
  * bounded top-k aggregate); arm pre is the production
  * [[Similarity.ivfTopKFixed]] (two-phase bounded top-k: int8 payload
  * through the probe join, in-stage cosine bounds, per-query bar,
  * survivors through the exact rescore). Output row counts printed per
  * arm — the specs pin full (query, rank, neighbor, cos) identity at
  * catalog scale; counts are the at-scale cross-check.
  *
  * MEASURED (round 12, ×243 /tmp/graft_sf24 v3, one JVM, pre→f32):
  *   pre  wall 34.6 s  rows 2 430 000  shuffleWrite  6.51 GB  diskSpill 2.44  memSpill 9.35
  *   f32  wall 31.9 s  rows 2 430 000  shuffleWrite 10.61 GB  diskSpill 2.45  memSpill 8.59
  * Row counts IDENTICAL (486k queries × k=5 — the at-scale cross-check
  * of the two-phase bar). The honest read: at ×243 the COMPRESSED
  * shuffle win is only 1.63× and wall is parity — this corpus is 243
  * coordinate-permuted copies, so lz4 squeezes the f32 vector payload
  * ~6:1 (243 M candidates × ~270 B raw ≈ 65 GB → 10.6 GB written);
  * real embeddings don't compress like that. The structural claim is
  * byte COMPOSITION, not this corpus's compressed totals: the pre
  * arm's remaining candidate-volume exchange is bare (ids, bound)
  * scalars for the bar join — ~12× less RAW per candidate — and the
  * vector payload is corpus-proportional. The deciding measurement is
  * the fifth decade: the f32 arm's first ×729 warm-up EXHAUSTED one
  * node's disk, the production arm reads 122.8 s ratio 108.6 (README).
  *
  * ROUND-13 RESOLUTION of the caveat above: re-run on the SIGN-FLIPPED
  * ×243 corpus (SPARK_GRAFT_STRESS_SIGNFLIP=1 — per-copy random sign
  * flips are an exact FP isometry that destroys cross-copy byte
  * redundancy): pre 6.515 GB / f32 10.615 GB — IDENTICAL to the
  * unflipped 6.51/10.61. The ~6:1 compression is therefore NOT a
  * permuted-copy artifact: it is the candidate stream repeating each
  * neighbor's ~256 B payload ~listSize times (identical rows adjacent
  * after the second rescore join's hash exchange) — generic to ANY
  * corpus, real embeddings included. The structural claim is
  * unchanged: the payload is candidate-VOLUME (raw bytes, spill
  * pressure, and the ×729 disk death are the facts), the prefilter's
  * is corpus-proportional.
  *
  * Usage: SPARK_GRAFT_SCALED_DIR=/tmp/graft_sf24 SPARK_GRAFT_COPIES=243 \
  *   sbt "Test/runMain graft.sim.ProfileTopKBytes"
  */
object ProfileTopKBytes {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf24")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "243").toInt
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("topkBytes")
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

    val k = 5
    val nProbe = 4
    val nLists = Capacity.ivfNLists(copies.toLong * Capacity.RefEmbeddingRows)
    val vecs = Tables.embeddings(spark, dir)

    def topkPre(): DataFrame =
      Similarity.ivfTopKFixed(vecs, "vec_id", "embedding", k = k,
        nLists = nLists, nProbe = nProbe)

    /** The pre-round-12 shape: id-only candidates → SHUFFLE_HASH f32
      * rescore joins → bounded top-k aggregate. Candidate generation
      * matches ivfTopKFixed's catalog branch verbatim.
      */
    def topkF32(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val v = Similarity.prepped(vecs, "vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val centroids = v.orderBy(col("vec_id")).limit(nLists)
        .select(row_number().over(Window.partitionBy(lit(1)).orderBy("vec_id")).as("__rn"),
          col("__v").as("centroid"))
        .select((col("__rn") - 1).as("list"), col("centroid"))
      val near = Similarity.nearestLists(v, "vec_id", centroids, nProbe)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assigned = near.select(col("vec_id").as("neighbor_id"),
        element_at(col("lists"), 1).as("list"))
      val probes = near.select(col("vec_id").as("query_id"),
        explode(col("lists")).as("list"))
      val cands = probes.join(assigned, "list")
        .where(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
      val vp = v.select(col("vec_id"), col("__v").cast("array<float>").as("__v"), col("__n"))
      val pairs = cands
        .join(vp.select(col("vec_id").as("query_id"), col("__v").as("va"), col("__n").as("na"))
          .hint("SHUFFLE_HASH"), "query_id")
        .join(vp.select(col("vec_id").as("neighbor_id"), col("__v").as("vb"), col("__n").as("nb"))
          .hint("SHUFFLE_HASH"), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          round(VectorF.dotpF(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      pairs.groupBy("query_id")
        .agg(graft.functions.AggF.topKNeighbors(col("neighbor_id"), col("cos"), k).as("__tk"))
        .select(col("query_id"), posexplode(col("__tk")))
        .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
          col("col.cos").as("cos"), (col("pos") + 1).cast("int").as("rank"))
    }

    def run(label: String, f: () => DataFrame): Unit = {
      shuffleW.set(0); diskSpill.set(0); memSpill.set(0)
      val t0 = System.nanoTime()
      val n = f().count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"BYTES $label%-4s wall=$wall%8.1f s  rows=$n%10d  shuffleWrite=${shuffleW.get / 1e9}%8.3f GB" +
        f"  diskSpill=${diskSpill.get / 1e9}%8.3f GB  memSpill=${memSpill.get / 1e9}%8.3f GB")
    }

    run("pre", topkPre _)
    run("f32", topkF32 _)
    spark.stop()
  }
}
