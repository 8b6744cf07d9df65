package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextOps

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("tok")).cache()
    time("tokens-cold")(tok.count())
    time("tokens-cached")(tok.count())

    time("shinglesOf-from-cached-tokens")(
      tok.select(TextOps.shinglesOf(col("tok"), 3).as("sh")).count())
    time("wordShingles-inline-fold")(
      docs.select(TextOps.wordShingles(col("text"), 3).as("sh")).count())
    time("jaccard-query-end2end") {
      graft.queries.Catalog.queries("t_jaccard")(spark, dir).count()
    }
    time("minhash-query-end2end") {
      graft.queries.Catalog.queries("t_minhash")(spark, dir).count()
    }

    // variant without slice: concat_ws of element_at lookups
    val alt = transform(sequence(lit(0), greatest(size(col("tok")) - 3, lit(-1))),
      i => concat_ws(" ", element_at(col("tok"), i + 1),
        element_at(col("tok"), i + 2), element_at(col("tok"), i + 3)))
    time("shingles-elementat")(
      tok.select(array_distinct(alt).as("sh")).count())

    // variant: no array_distinct
    time("shingles-nodistinct")(
      tok.select(transform(sequence(lit(0), greatest(size(col("tok")) - 3, lit(0))),
        i => concat_ws(" ", slice(col("tok"), i + 1, lit(3)))).as("sh")).count())

    // just sequence+size
    time("sequence-only")(
      tok.select(sequence(lit(0), greatest(size(col("tok")) - 3, lit(0))).as("q")).count())

    spark.stop()
  }
}
