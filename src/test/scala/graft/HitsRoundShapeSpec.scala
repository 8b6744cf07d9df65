package graft

import org.apache.spark.sql.functions._
import graft.graph.Centrality

/** Plan-shape gate for the hitsCounts LOOP BODY (round-5 verdict #3): the
  * eager per-round checkpoints hide the loop's joins from the final
  * audited plan, so a plan regression inside the loop would pass the
  * PlanAudit gate silently. `Centrality.hitsRoundForAudit` rebuilds one
  * un-checkpointed hub+auth round over the same materialized edge pair
  * the production loop uses; this spec pins its shape:
  *
  *   - both per-round joins are SHUFFLE_HASH (an SMJ would re-sort the
  *     |E| side every round);
  *   - the pre-partitioned |E| legs join WITHOUT a fresh Exchange — the
  *     whole point of the Ckpt.partitioned materialization (under a
  *     plain AQE localCheckpoint each round re-shuffled the edge frame);
  *   - only the |V|-row aggregation exchanges remain (≤3 for one round).
  */
class HitsRoundShapeSpec extends SparkSpec {

  test("hits round body: 2 shuffle-hash joins, no SMJ, no |E| re-shuffle") {
    val edges = spark.range(0, 5000)
      .select((col("id") % 123).as("src"), (col("id") % 77).as("dst"))
    val round = Centrality.hitsRoundForAudit(edges)
    val p = round.queryExecution.executedPlan.toString

    assert("ShuffledHashJoin".r.findAllIn(p).length == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)

    // the checkpointed edge frames surface as `Scan ExistingRDD`; if their
    // HashPartitioning were lost, EnsureRequirements would insert an
    // Exchange directly above the scan (one tree line below it)
    val lines = p.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange hashpartitioning")).foreach {
      case (_, i) =>
        val child = lines.drop(i + 1).find(l => l.trim.startsWith("+-") || l.trim.startsWith(":-"))
        assert(!child.exists(_.contains("Scan ExistingRDD")),
          s"edge frame re-shuffled at line $i:\n$p")
    }
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 3, p)
  }

  test("hitsCounts values are unchanged by the round-1 outdegree shortcut") {
    // tiny directed graph with a node that has only out-edges (1), only
    // in-edges (4), and both (2,3) — exercises the sparse-zero semantics
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val got = Centrality.hitsCounts(edges, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hand-unrolled: a0=1 everywhere; h1=outdeg: {1:2,2:2,3:1,4:0}
    // a1(v)=Σ_{u→v}h1(u): {2:2,3:4,4:3,1:0}
    // h2(u)=Σ_{u→v}a1(v): {1:6,2:7,3:3,4:0}
    // a2(v)=Σ_{u→v}h2(u): {2:6,3:13,4:10,1:0}
    assert(got == Set((1L, 6L, 0L), (2L, 7L, 6L), (3L, 3L, 13L), (4L, 0L, 10L)))
  }
}
