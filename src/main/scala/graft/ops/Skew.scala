package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins (the brief's "salting for
  * skew"; complements AQE's skew-join splitting, which only rebalances
  * the probe side of a sort-merge join after the fact).
  *
  * A hot join key sends all its rows to ONE reducer; at 100 TB a single
  * hot customer/date key turns a 1000-executor shuffle into a one-task
  * straggler. Salting splits each left key across `buckets` reducers and
  * replicates the (small, but too big to broadcast) right side once per
  * bucket — shuffle volume grows by right×buckets, the straggler shrinks
  * by ×buckets.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `keys` with an added salt: every left
    * row gets one salt value in [0, buckets); the right side is
    * replicated once per salt. Row-identical to
    * `left.join(right, keys, joinType)` for `inner` and `left` joins —
    * each left row still meets exactly the right rows of its key (the
    * salt value never changes WHAT matches, only WHERE it matches).
    * Right/full-outer joins are rejected: an unmatched right row would
    * surface `buckets` times.
    *
    * The salt is drawn from a seeded `rand()` — correctness does not
    * depend on the assignment, so a task retry re-salting a row is
    * harmless.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(right rows would duplicate per bucket)")
    val salt = "__salt"
    val l = left.withColumn(salt, floor(rand(42) * buckets).cast("int"))
    val r = right.withColumn(salt,
      explode(array((0 until buckets).map(lit(_)): _*)))
    // The join is PINNED to shuffle-hash, build side = the replicated
    // right. Salting presupposes the right side is too big to broadcast
    // (a broadcastable right needs no salt — the join wouldn't shuffle at
    // all), yet Catalyst sizes the post-explode frame from PRE-explode
    // stats and will happily plan a broadcast of the ×buckets-replicated
    // rows — observed as a driver broadcast OOM at 30× data (4.5M-row
    // orders × 8 salts = 36M rows pushed into one 8 GB broadcast). The
    // hint keeps the demonstrated shape at every scale: shuffle on
    // (keys, salt) — a hot key now spreads over `buckets` reducers — and
    // a per-partition hash build of right×buckets/partitions rows, which
    // the salt keeps bounded; no sort of the big left side (SMJ would
    // sort both sides).
    l.join(r.hint("shuffle_hash"), keys :+ salt, joinType).drop(salt)
  }
}
