package graft.core

import org.apache.spark.sql.DataFrame

/** Partitioning-preserving `localCheckpoint`.
  *
  * Under AQE (the session default) `Dataset.localCheckpoint()` plans the
  * checkpointed subtree adaptively, and the resulting LogicalRDD reports
  * unknown/coalesced output partitioning — so every downstream join
  * re-shuffles a frame that was explicitly `repartition()`ed onto its
  * join key moments earlier. Measured on the `g_hits` loop: the
  * pre-partitioned edge frame was re-Exchanged in every round, exactly
  * the shuffle the materialization was built to avoid. Materializing
  * with AQE disabled keeps `HashPartitioning` on the LogicalRDD, and
  * EnsureRequirements honors it even when the consuming query runs with
  * AQE on (probed on Spark 4.1.2: 2 exchanges → 0).
  *
  * Use for checkpoints whose PARTITIONING is the point (an edge/fact
  * frame joined repeatedly on the partition key). For small per-round
  * state frames the plain `localCheckpoint()` is fine — their exchange
  * is the cheap side of the join.
  *
  * NOT thread-safe across queries: the helper toggles the
  * session-global `spark.sql.adaptive.enabled` around the eager
  * checkpoint, so any query planned CONCURRENTLY on the same session
  * races on the flag (it may silently plan non-adaptively, or the
  * restore may clobber a concurrent toggle). All current callers —
  * Bench / Verify / the driver — plan queries one at a time on the
  * session; a concurrent caller must synchronize externally or use a
  * separate session.
  */
object Ckpt {
  def partitioned(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try df.localCheckpoint()
    finally spark.conf.set(key, prev)
  }
}
