package graft.sim

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import graft.core.Tables

/** One-off: static size estimates of the minhash frames vs the session
  * broadcast threshold, at a stress dir (round-14 hint-gate debugging).
  */
object ProfileEstimates {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x243d6")
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("est")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    println(s"threshold=${Bridge.broadcastThreshold(spark)}")
    println(s"docs=${Bridge.sizeEstimate(docs)}")
    val sh = docs.select(col("doc_id"),
      graft.text.TextOps.shingleHashes(col("text"), 3).as("hs"))
      .where(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"sh=${Bridge.sizeEstimate(sh)}")
    val sig = sh.withColumn("sig",
      graft.functions.HashF.minhashPolySigHashes(col("hs"), 64))
    val bands = graft.text.NearDup.lshBands(sig, "doc_id", "sig", 16, 4)
    println(s"bands=${Bridge.sizeEstimate(bands)}")
    val ex = sh.select(col("doc_id"), explode(col("hs")).as("h"))
    println(s"ex=${Bridge.sizeEstimate(ex)}")
    spark.stop()
  }
}
