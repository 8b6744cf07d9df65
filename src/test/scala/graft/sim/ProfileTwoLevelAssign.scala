package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-13 verdict #1 evidence: the single-level IVF assignment
  * quadratic vs the two-level (hierarchical) scope, same JVM,
  * interleaved reps with bracket calib samples (the ScaleStress
  * discipline — this host stalls episodically and drifts).
  *
  * Arms (per rep, in this order):
  *   flat-assign — the flat op's quantize+assign term in isolation:
  *                 [[Similarity.fitQuantizer]] at the capacity-rule
  *                 nLists plus the broadcast [[Similarity.nearestLists]]
  *                 pass over the corpus (N·nLists distance arithmetic —
  *                 the measured ~430 s of t_semdedup's 484 s at ×729);
  *   two-assign  — the two-level replacement in isolation:
  *                 [[Similarity.fitTwoLevelQuantizer]] plus the
  *                 [[Similarity.twoLevelMemberships]] pass
  *                 ((1+cProbe)·√nLists per row);
  *   flat-full   — the t_semdedup stress shape end-to-end
  *                 ([[Semantic.semanticDups]], nProbe = 1);
  *   two-full    — [[Semantic.semanticDupsTwoLevel]] end-to-end at the
  *                 occupancy-preserving [[Capacity.twoLevelNLists]]
  *                 rule (cProbe = 2).
  * Heavy flat arms can be skipped (SPARK_GRAFT_TL_ARMS=two-assign,
  * two-full) when the flat side's numbers are already on record.
  *
  * The full arms also COUNT their pairs — at the stress threshold 0.9
  * this corpus has none (candidate volume is what's timed; the
  * ProfileRescoreBytes lesson), so a second run at
  * SPARK_GRAFT_TL_T=0.4 gives the non-vacuous cardinality disclosure:
  * the two scopes are DIFFERENT ops, and the committed table must show
  * how many of the flat scope's pairs the two-level scope reproduces
  * at scale (the in-spec recall contract measured at ×243/×729 reach).
  *
  * Usage: SPARK_GRAFT_SCALED_DIR=/tmp/graft_sf24 SPARK_GRAFT_COPIES=243 \
  *   sbt "Test/runMain graft.sim.ProfileTwoLevelAssign"
  */
object ProfileTwoLevelAssign {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf24")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "243").toInt
    val threshold = sys.env.getOrElse("SPARK_GRAFT_TL_T", "0.9").toDouble
    val reps = sys.env.getOrElse("SPARK_GRAFT_TL_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_TL_ARMS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("twoLevelAssign")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val rows = copies.toLong * Capacity.RefEmbeddingRows
    val nFlat = Capacity.ivfNLists(rows)
    val nTwo = Capacity.twoLevelNLists(rows, cProbe = 2)
    val vecs = Tables.embeddings(spark, dir)
    println(s"[tl] dir=$dir copies=$copies t=$threshold nFlat=$nFlat nTwo=$nTwo reps=$reps")

    def flatAssign(): Long = {
      import org.apache.spark.ml.functions.array_to_vector
      val v = Similarity.prepped(vecs, "vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val feats = v.select(col("vec_id"), array_to_vector(col("__v")).as("features"))
        val model = Similarity.fitQuantizer(feats, nFlat, seed = 42L)
        val centroids = Similarity.centroidFrame(spark, model)
        Similarity.nearestLists(v, "vec_id", centroids, nProbe = 1).count()
      } finally v.unpersist(blocking = false)
    }

    def twoAssign(): Long = {
      val v = Similarity.prepped(vecs, "vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val tl = Similarity.fitTwoLevelQuantizer(v, nTwo, seed = 42L)
        Similarity.twoLevelMemberships(v, "vec_id", tl.structure, cProbe = 2).count()
      } finally v.unpersist(blocking = false)
    }

    def fullCount(f: () => (DataFrame, () => Unit)): Long = {
      val (pairs, release) = f()
      try pairs.count() finally release()
    }

    val arms: Seq[(String, () => Long)] = Seq(
      "flat-assign" -> (() => flatAssign()),
      "two-assign" -> (() => twoAssign()),
      "flat-full" -> (() => fullCount(() =>
        Semantic.semanticDupsWithRelease(vecs, "vec_id", "embedding",
          threshold = threshold, nLists = nFlat, maxList = 10000))),
      "two-full" -> (() => fullCount(() =>
        Semantic.semanticDupsTwoLevelWithRelease(vecs, "vec_id", "embedding",
          threshold = threshold, nLists = nTwo, cProbe = 2, maxList = 10000)))
    ).filter { case (n, _) => only.forall(_.contains(n)) }

    // SPARK_GRAFT_TL_OVERLAP=1: instead of timing, count the PAIR-SET
    // overlap of the two scopes at the given threshold — the at-scale
    // recall disclosure (what fraction of the flat scope's pairs the
    // two-level scope reproduces, and vice versa). Not a timing mode.
    if (sys.env.get("SPARK_GRAFT_TL_OVERLAP").contains("1")) {
      // the UNGUARDED twins: the overlap disclosure runs at TL_T=0.4 —
      // the exact mid-threshold measurement the public guard cites
      // (round 14). Internal caches die with this standalone JVM.
      val fp = Semantic.semanticDupsUnguarded(vecs, "vec_id", "embedding",
        threshold = threshold, nLists = nFlat, maxList = 10000)
      val tp = Semantic.semanticDupsTwoLevelUnguarded(vecs, "vec_id", "embedding",
        threshold = threshold, nLists = nTwo, cProbe = 2, maxList = 10000)
      val f = fp.select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t2 = tp.select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nF = f.count(); val nT = t2.count()
      val both = f.join(t2, Seq("id_a", "id_b")).count()
      println(f"TLOVERLAP t=$threshold flat=$nF two=$nT both=$both " +
        f"two-covers-flat=${both.toDouble / nF}%.4f flat-covers-two=${both.toDouble / nT}%.4f")
      f.unpersist(); t2.unpersist()
      spark.stop()
      return
    }

    case class Rep(st: Double, wall: Double, rows: Long)
    val results = collection.mutable.Map.empty[String, Vector[Rep]].withDefaultValue(Vector())
    (1 to reps).foreach { r =>
      arms.foreach { case (label, f) =>
        val st0 = graft.Calib.singleThread()
        val t0 = System.nanoTime()
        val n = f()
        val wall = (System.nanoTime() - t0) / 1e9
        val st1 = graft.Calib.singleThread()
        spark.sharedState.cacheManager.clearCache()
        val rep = Rep(math.min(st0, st1), wall, n)
        results(label) = results(label) :+ rep
        println(f"[tl] rep$r $label%-12s wall=${rep.wall}%8.1f s  rows=$n%10d  st=${rep.st}%.3f")
      }
    }
    arms.foreach { case (label, _) =>
      val rs = results(label)
      val stFloor = rs.map(_.st).min
      val norm = rs.map(r => r.wall * stFloor / r.st).min
      println(f"TLASSIGN $label%-12s min=$norm%8.1f s  rows=${rs.head.rows}%10d" +
        s"  walls=${rs.map(r => f"${r.wall}%.1f").mkString(",")}" +
        s"  st=${rs.map(r => f"${r.st}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
