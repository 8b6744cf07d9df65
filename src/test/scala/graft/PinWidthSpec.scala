package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Tables.pinWidth: repartition CPU-dense frames ONLY when the planned
  * scan is narrower than the session parallelism — the guard is the
  * contract (a corpus-scale scan must never pay an extra exchange).
  */
class PinWidthSpec extends SparkSpec {

  test("narrow frame is widened to the session shuffle parallelism") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val narrow = spark.range(0, 1000).coalesce(1).toDF("id")
    assert(narrow.queryExecution.toRdd.getNumPartitions == 1)
    val pinned = Tables.pinWidth(narrow)
    assert(pinned.queryExecution.toRdd.getNumPartitions == parts)
    // values unchanged
    assert(pinned.agg(sum("id")).head().getLong(0) == 499500L)
  }

  test("already-wide frame passes through untouched — no added exchange") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wide = spark.range(0, 1000, 1, parts + 4).toDF("id")
    val pinned = Tables.pinWidth(wide)
    // the SAME DataFrame back: no repartition node, no new plan
    assert(pinned eq wide)
  }

  test("pinned plan carries a user-specified round-robin exchange AQE keeps") {
    val narrow = spark.range(0, 100).coalesce(1).toDF("id")
    val p = Tables.pinWidth(narrow).queryExecution.executedPlan.toString
    assert(p.contains("Exchange RoundRobinPartitioning"), p)
  }
}
