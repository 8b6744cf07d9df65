package graft

import graft.queries.Catalog

/** Physical-plan discipline checks: predicates reach the parquet scan,
  * dimension joins broadcast, and the as-of join never plans a
  * nested-loop join (SURVEY.md §4 — these are the properties that decide
  * whether the same plan survives a 100 TB scale-up).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Catalog.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("p1_scan pushes range+in filters into the parquet scan") {
    val p = plan("p1_scan")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("In(l_suppkey"), p)
  }

  test("q5_join broadcasts the dimension tables") {
    val p = plan("q5_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("j2_asof plans sort-merge over the union, never a nested loop") {
    val p = plan("j2_asof")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("j6_range binned interval join is a real equi-join") {
    val p = plan("j6_range")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q1_agg partial-aggregates before the exchange") {
    val p = plan("q1_agg")
    // partial_ functions appear in the pre-shuffle HashAggregate
    assert(p.contains("partial_"), p)
  }

  test("t_simhash candidates come from a banded equi-join, not a cross join") {
    val p = plan("t_simhash")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("s_lsh candidate dedup shuffles id pairs only, never embeddings") {
    val p = plan("s_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the distinct's exchange partitions on the id pair — if an embedding
    // array rode through it, the HashAggregate keys would include va/vb
    val distinctAggs = p.linesIterator.filter(l =>
      l.contains("HashAggregate(keys=[query_id") || l.contains("HashAggregate(keys=[neighbor_id"))
    assert(distinctAggs.forall(l => !l.contains("va") && !l.contains("vb")), p)
  }
}
