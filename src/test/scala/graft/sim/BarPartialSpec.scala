package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bounded per-partition partial top-rank that feeds the ANN bar
  * aggregate ([[Similarity.boundedPartialTopRank]] / [[BarPartial]] —
  * the round-13 verdict's lead fix for the ×2187 single-node spill).
  * Contract under test: the pre-reduce is a PURE reduction — the bar
  * frame computed from the reduced stream is IDENTICAL to the bar frame
  * computed straight from the raw bounds (same per-query thresholds,
  * same below-rank −∞ sentinel), for any partitioning, with duplicate
  * (id, lb) multiset entries (the LSH once-per-colliding-table case),
  * ties, NaN/null scores, and forced multi-epoch flushes.
  */
class BarPartialSpec extends SparkSpec {
  import spark.implicits._

  /** The thr frame exactly as topKViaBounds builds it, from any
    * (query_id, neighbor_id, __lb) stream.
    */
  private def barFrame(rows: org.apache.spark.sql.DataFrame, rank: Int) =
    rows.groupBy("query_id")
      .agg(graft.functions.AggF.topKNeighbors(col("neighbor_id"), col("__lb"), rank).as("__tk"))
      .select(col("query_id").cast("long"),
        when(size(col("__tk")) < rank, lit(Double.NegativeInfinity))
          .otherwise(element_at(col("__tk"), rank).getField("cos"))
          .as("__thr"))
      .as[(Long, Double)].collect().toMap

  private def randomBounds(seed: Int, n: Int, queries: Int, parts: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = Seq.tabulate(n) { _ =>
      val q = rnd.nextInt(queries).toLong
      val id = rnd.nextInt(40).toLong
      // duplicates with the SAME (id, lb) mimic the LSH multi-table
      // multiset; occasional NaN exercises the exclusion path
      val lb = if (rnd.nextInt(37) == 0) Double.NaN
        else math.rint(rnd.nextDouble() * 20) / 20.0 - 0.5
      (q, id, lb)
    }
    spark.createDataset(rows).toDF("query_id", "neighbor_id", "__lb")
      .repartition(parts)
  }

  test("pre-reduced bar == raw bar (random multisets, ties, NaN, ranks 1/3/20)") {
    for (rank <- Seq(1, 3, 20); seed <- Seq(7, 8)) {
      val bounds = randomBounds(seed, n = 5000, queries = 60, parts = 7)
        .persist()
      try {
        val raw = barFrame(bounds.where(!isnan(col("__lb"))), rank)
        val reduced = barFrame(Similarity.boundedPartialTopRank(bounds, rank), rank)
        assert(reduced == raw, s"rank=$rank seed=$seed: bar frames differ")
        assert(raw.nonEmpty && raw.values.exists(_ != Double.NegativeInfinity),
          s"rank=$rank seed=$seed: vacuous (no finite bars)")
      } finally bounds.unpersist()
    }
  }

  test("forced flush epochs (tiny budget) still produce the identical bar") {
    val bounds = randomBounds(seed = 11, n = 4000, queries = 200, parts = 3)
      .persist()
    try {
      val rank = 4
      val raw = barFrame(bounds.where(!isnan(col("__lb"))), rank)
      // flushBudgetBytes small enough that maxEntries floors at 2^16 —
      // exercise the epoch machinery directly via BarPartial instead:
      val reducedTiny = bounds
        .where(col("__lb").isNotNull && !isnan(col("__lb")))
        .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("__lb").cast("double"))
        .as[(Long, Long, Double)]
        .mapPartitions(it => BarPartial.reduce(it, rank, maxEntries = 5))
        .toDF("query_id", "neighbor_id", "__lb")
      assert(barFrame(reducedTiny, rank) == raw, "multi-epoch bar differs")
    } finally bounds.unpersist()
  }

  test("per-(partition, epoch) emission is bounded at rank entries per query") {
    val rank = 3
    val rows = Seq.tabulate(500)(i => (i % 5L, i.toLong, i / 1000.0))
    val counts = BarPartial.reduce(rows.iterator, rank, maxEntries = 1000)
      .toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts.values.forall(_ <= rank), s"emission exceeds rank: $counts")
    assert(counts.keySet == (0L until 5L).toSet)
    // and the kept entries are the best by (lb desc, id asc)
    val best = BarPartial.reduce(rows.iterator, rank, maxEntries = 1000)
      .toSeq.groupBy(_._1).map { case (q, es) => q -> es.map(_._3).sorted.reverse }
    val expected = rows.groupBy(_._1).map { case (q, es) =>
      q -> es.map(_._3).sorted.reverse.take(rank) }
    assert(best == expected)
  }

  test("queries with fewer than rank finite lowers keep the -inf sentinel") {
    // query 0: 2 finite entries (rank 3 unreachable -> -inf);
    // query 1: 3 finite + 2 NaN (NaN excluded -> finite bar)
    val bounds = Seq(
      (0L, 1L, 0.9), (0L, 2L, 0.8),
      (1L, 1L, 0.9), (1L, 2L, Double.NaN), (1L, 3L, 0.7),
      (1L, 4L, 0.6), (1L, 5L, Double.NaN)
    ).toDF("query_id", "neighbor_id", "__lb").repartition(2)
    val bar = barFrame(Similarity.boundedPartialTopRank(bounds, 3), 3)
    assert(bar(0L) == Double.NegativeInfinity)
    assert(bar(1L) == 0.6)
  }
}
