package graft.sim

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-13 diagnosis harness: the LSH bucket-size histogram and its
  * C(n,2) pair mass at a stress decade — the ×2187 s_lsh death wrote
  * 3.19e9 candidate occurrences (52 GB) from 17.5M signature rows, so
  * the pair mass is concentrated in a skew tail the +1-plane-per-
  * doubling capacity rule cannot dilute (2 more bits scale the UNIFORM
  * floor by 4× but leave structural heavy buckets intact). This prints
  * where the mass lives and how much a maxBucket cap removes.
  *
  * Usage: SPARK_GRAFT_SCALED_DIR=/tmp/graft_sf219 SPARK_GRAFT_COPIES=2187 \
  *   sbt "Test/runMain graft.sim.ProfileBucketHist"
  */
object ProfileBucketHist {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf219")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "2187").toInt
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("bucketHist")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val planes = Capacity.lshPlanes(copies.toLong * Capacity.RefEmbeddingRows)
    val tables = 4
    val vecs = Tables.embeddings(spark, dir)
    val v = vecs.select(col("vec_id"),
      Similarity.lshProjections(col("embedding"), planes, tables).as("__p"))
    val sigs = v.select(col("vec_id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          Similarity.packSignature(col("__p"), t, planes).as("sig"))): _*)).as("s"))
      .select(col("s.tbl"), col("s.sig"))
    val sizes = sigs.groupBy("tbl", "sig").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = sizes.agg(sum(col("n") * (col("n") - 1)).as("p")).head().getLong(0) / 2
    println(s"[hist] planes=$planes tables=$tables totalPairMass=$total")
    Seq(2L, 16L, 256L, 4096L, 10000L, 65536L).foreach { cap =>
      val row = sizes.where(col("n") > cap)
        .agg(count(lit(1)).as("b"), sum(col("n") * (col("n") - 1)).as("p"),
          max(col("n")).as("mx")).head()
      val b = row.getLong(0)
      val p = if (row.isNullAt(1)) 0L else row.getLong(1) / 2
      val mx = if (row.isNullAt(2)) 0L else row.getLong(2)
      println(f"[hist] buckets>n=$cap%6d: $b%10d buckets, pairMass=$p%14d (${100.0 * p / math.max(total, 1)}%6.2f%%), maxBucket=$mx")
    }
    sizes.unpersist()
    spark.stop()
  }
}
