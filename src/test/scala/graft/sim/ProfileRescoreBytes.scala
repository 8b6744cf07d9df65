package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorF

/** Round-12 verdict #1 evidence: shuffle/spill bytes of the big-regime
  * near-dup rescore, measured per arm over the ×243 t_embdup shape.
  *
  * Three arms, one JVM, shared candidate generation parameters:
  *   f64   — the ROUND-11 shape verbatim: id-only candidates →
  *           distinct → SHUFFLE_HASH rescore joins dragging
  *           `array<double>` payloads (graft_dot);
  *   f32   — the first round-12 fix: same shape, payload cast to
  *           `array<float>` below the exchange (graft_dotf);
  *   pre   — the PRODUCTION [[Similarity.cosineDups]]: int8-quantized
  *           lossless cosine upper bound fused into the bucket
  *           self-join (graft_quant_i8/graft_dot_i8), so failing
  *           candidates never leave the join's stage; survivors
  *           through the exact f32 rescore.
  * A stage-metrics listener accumulates shuffle write and spill bytes
  * per arm — bytes are structural, so one rep per arm suffices (wall
  * times are corroboration). Each arm's output COUNT is printed too:
  * at ×243 the three must agree (the f32/f64 pair sets are 6dp-pinned
  * by Float32RescoreSpec; the prefilter is lossless by
  * QuantPrefilterSpec) — a cardinality cross-check of the prefilter at
  * a scale the specs can't reach.
  *
  * MEASURED (round 12, ×243 /tmp/graft_sf24 v3, one JVM, pre→f32→f64,
  * threshold 0.9 = the t_embdup stress shape):
  *   pre  wall  16.4 s  shuffleWrite  0.50 GB  diskSpill 0      memSpill 0
  *   f32  wall 209.6 s  shuffleWrite 50.30 GB  diskSpill 5.3 GB  memSpill 52.4 GB
  *   f64  wall 342.8 s  shuffleWrite 72.33 GB  diskSpill 5.3 GB  memSpill 52.3 GB
  * (the f32/f64 arms repeat the pre-prefilter session's readings —
  * 51.22/73.26 GB, walls 217/414 s — within run-to-run noise; `pre`'s
  * wall carries this arm-order's plan compile, the committed stress
  * min is 9.68 s.) The prefilter moves the payload from the
  * candidate-volume rescore exchanges to the corpus-volume signature
  * exchange and kills failing candidates inside the join's stage:
  * 72.33 → 0.50 GB total shuffle write (146×), spills eliminated. At
  * threshold 0.9 this corpus has NO true pairs (all arms rows=0 — the
  * byte cost measured is pure candidate volume), so the cardinality
  * cross-check ran separately at the catalog threshold 0.4
  * (SPARK_GRAFT_RESCORE_T=0.4), where ALL THREE ARMS COUNTED EXACTLY
  * 1 500 184 PAIRS (pre 41.8 s / 1.17 GB shuffle write / 0 spill;
  * f32 337.7 s / 50.30 GB; f64 399.0 s / 72.33 GB) — prefilter +
  * exact-f32 rescore is pair-for-pair the f32 arm by construction,
  * and no f64/f32 pair straddled the 0.4 boundary at this scale.
  *
  * ROUND-13: re-run on the SIGN-FLIPPED ×243 corpus (exact-isometry
  * sign flips kill cross-copy byte redundancy): pre 0.497 GB /
  * f32 50.328 GB — identical to the unflipped 0.50/50.30, refuting the
  * permuted-copy compressibility caveat (the compression is the
  * candidate stream's repeated per-neighbor payloads — generic to any
  * corpus; full resolution note on ProfileTopKBytes). The f64 replica
  * arm exhausted that session's remaining free disk (54 GB with two
  * ×243 corpora on disk vs its 72.33 GB on-record write) — consistent
  * with the flip not shrinking its bytes; its unflipped reading stands.
  *
  * Usage: SPARK_GRAFT_SCALED_DIR=/tmp/graft_sf24 \
  *   sbt "Test/runMain graft.sim.ProfileRescoreBytes"
  *
  * Lives in package graft.sim to reach the private[sim] candidate
  * pipeline so the replica arms share it verbatim (the arms differ
  * ONLY in candidate pruning / rescore payload).
  */
object ProfileRescoreBytes {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf24")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "243").toInt
    // 0.9 = the t_embdup stress shape (output empty on this corpus —
    // the bytes are the claim); 0.4 = the catalog threshold, used for
    // the NON-vacuous cardinality cross-check (prefilter + exact f32
    // rescore must equal the plain f32 arm pair-for-pair, so counts
    // match exactly)
    val threshold = sys.env.getOrElse("SPARK_GRAFT_RESCORE_T", "0.9").toDouble
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

    /** The r11/r12.1 shape: id-only candidates → distinct → hinted
      * rescore joins with a float64 (r11) or float32 (r12.1) payload.
      * Candidate generation matches cosineDups' parameters exactly
      * (threshold/planes/tables/maxBucket = the t_embdup stress
      * override).
      */
    def dupsNoPrefilter(f32: Boolean): DataFrame = {
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
      val vp = if (f32)
        v.select(col("vec_id"), col("__v").cast("array<float>").as("__v"), col("__n"))
      else v
      val dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
        if (f32) VectorF.dotpF else VectorF.dotp
      cands
        .join(vp.select(col("vec_id").as("id_a"), col("__v").as("va"), col("__n").as("na"))
          .hint("SHUFFLE_HASH"), "id_a")
        .join(vp.select(col("vec_id").as("id_b"), col("__v").as("vb"), col("__n").as("nb"))
          .hint("SHUFFLE_HASH"), "id_b")
        .select(col("id_a"), col("id_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
        .where(col("cos") >= threshold)
    }

    def dupsProduction(): DataFrame =
      Similarity.cosineDups(vecs, "vec_id", "embedding", threshold = threshold,
        planes = planes, tables = 8, maxBucket = 10000)

    def run(label: String, f: () => DataFrame): Unit = {
      shuffleW.set(0); diskSpill.set(0); memSpill.set(0)
      val t0 = System.nanoTime()
      val n = f().count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"BYTES $label%-4s wall=$wall%8.1f s  rows=$n%10d  shuffleWrite=${shuffleW.get / 1e9}%8.3f GB" +
        f"  diskSpill=${diskSpill.get / 1e9}%8.3f GB  memSpill=${memSpill.get / 1e9}%8.3f GB")
    }

    // cheapest first; if a heavy arm exhausts disk it dies last
    run("pre", dupsProduction _)
    run("f32", () => dupsNoPrefilter(f32 = true))
    run("f64", () => dupsNoPrefilter(f32 = false))
    spark.stop()
  }
}
