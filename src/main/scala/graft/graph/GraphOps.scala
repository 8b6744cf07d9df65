package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics as declarative DataFrame plans (SURVEY.md §2.9;
  * reference: `finds/recipes/graph.py:185-317` on networkx).
  *
  * The graph is an edge DataFrame (src, dst). Degree/centrality and the
  * neighborhood-overlap link-prediction scores (common neighbors,
  * Jaccard, Adamic-Adar, preferential attachment, resource allocation)
  * are joins + aggregations — fully distributed, no vertex program
  * needed. PageRank is iterated DataFrame joins ([[pageRank]]).
  */
object GraphOps {

  /** Node degrees of an undirected edge list (edges deduped by caller). */
  def degrees(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame =
    // ONE pass over the edge list: explode each edge to its two
    // endpoints. The former unionAll(select(src), select(dst)) planned
    // the ENTIRE upstream of `edges` twice — for g_degree that was two
    // scans + two joins + two distinct aggregations (AQE's stage cache
    // reuses the map side at runtime, but each union branch still ran
    // its own reduce-side dedup and final aggregate). Same multiset of
    // nodes (explode keeps null endpoints as null rows, exactly like
    // the union did), so the degree counts are identical.
    edges.select(explode(array(col(src), col(dst))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Link-prediction scores for node pairs (a < b) on one side of a
    * bipartite edge list sharing neighbors on the other side:
    * common-neighbor count, Jaccard, Adamic-Adar, preferential
    * attachment (graph.py:295-317).
    *
    * Duplicate (node, neighbor) rows are tolerated — both the degree agg
    * (count_distinct) and the adjacency set dedup inside their own
    * aggregation, so callers need NOT pre-`distinct()` the edge list
    * (that's a whole extra shuffle + materialization of the raw edges).
    *
    * A shared neighbor of degree d emits d² pair rows, so one hub
    * neighbor dominates the join at scale; `maxNeighborDegree` drops
    * hub neighbors from pair generation (node degrees for Jaccard /
    * pref-attach stay full). The per-neighbor adjacency list is built in
    * ONE shuffle with [[graft.functions.AggF.cappedSortedSet]] — the
    * guard is enforced INSIDE the aggregation (a hub group stops
    * accumulating and yields NULL the moment it crosses the cap, on the
    * map side too), replacing the former distinct + degree-count + join
    * + collect four-shuffle pipeline with identical semantics.
    */
  def linkPrediction(edges0: DataFrame, node: String, neighbor: String,
                     maxNeighborDegree: Int = Int.MaxValue): DataFrame = {
    // two consumers (node degrees, pair generation) scan the edge list.
    // Deliberately NOT persisted: profiled at sf0.1, the InMemoryRelation
    // build + columnar re-scan cost ~4.7 s while the saved re-scan of a
    // codegen'd broadcast-join upstream is ~1 s. Callers with a genuinely
    // expensive upstream can persist before calling.
    val edges = edges0
    // deg (one row per node) backs TWO broadcast joins (deg_a, deg_b);
    // persisting the tiny aggregate stops the second broadcast from
    // re-running the full edge scan + distinct-count shuffle
    val deg = edges.groupBy(col(node).as("n"))
      .agg(count_distinct(col(neighbor)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one groupBy builds the sorted adjacency list per shared neighbor; a
    // native generator then emits its d(d−1)/2 pairs — no self-join. The
    // per-neighbor weights (1/log d, 1/d) come from size(ns) = the true
    // neighbor degree (kept groups never overflowed). nbdeg == 1
    // neighbors can't form a pair — dropped before the weight arithmetic
    // (also keeps 1/log(1) out of the plan).
    val cappable = edges.schema(node).dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val adj =
      if (cappable)
        edges.groupBy(col(neighbor).as("nb"))
          .agg(graft.functions.AggF.cappedSortedSet(col(node), maxNeighborDegree).as("ns"))
          .where(col("ns").isNotNull)
      else // non-int ids: plain collect_set, guard applied after the fact
        edges.groupBy(col(neighbor).as("nb"))
          .agg(sort_array(collect_set(col(node))).as("ns"))
          .where(size(col("ns")) <= maxNeighborDegree)
    // AQE sizes reducer coalescing on PRE-explode bytes: the adjacency
    // is ~|N| compact array rows (a few MB at sf0.1), so the
    // pair-generation stage — explode to Σ d²/2 rows + partial pair
    // aggregation — was coalesced to 2 tasks and ran 1.6 s of the
    // query's 2.6 s on two cores (ProfileQ stage trace, round 7). An
    // explicit round-robin repartition to the session's shuffle
    // parallelism pins the explode's input width: the extra exchange
    // moves only the compact array rows, and the d²/2-row explosion
    // runs at full width. At cluster scale the adjacency is large
    // enough that AQE keeps the width anyway; the repartition then
    // only rebalances the array rows across that same width.
    val parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val byNbr = adj.where(size(col("ns")) > 1)
      .select(col("ns"),
        (lit(1.0) / log(size(col("ns")).cast("double"))).as("w_aa"),
        (lit(1.0) / size(col("ns")).cast("double")).as("w_ra"))
      .repartition(parts)
    // int node ids take the PACKED pair path: each pair is one primitive
    // long (a<<32)|b — the explode emits primitive longs (no per-pair row
    // allocation) and the d²/2-row aggregation runs on a single primitive
    // key. Wider id types keep the struct-pair kernel.
    val intIds = byNbr.schema("ns").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }
    val shared = if (intIds) {
      byNbr
        .select(explode(graft.functions.HashF.packedPairs(col("ns"))).as("pk"),
          col("w_aa"), col("w_ra"))
        .groupBy("pk")
        .agg(count(lit(1)).as("common"),
          sum(col("w_aa")).as("adamic_adar"),
          sum(col("w_ra")).as("resource_alloc"))
        .select(shiftrightunsigned(col("pk"), 32).cast("int").as("n_a"),
          col("pk").bitwiseAND(lit(0xffffffffL)).cast("int").as("n_b"),
          col("common"), col("adamic_adar"), col("resource_alloc"))
    } else byNbr
      .select(explode(graft.functions.HashF.sortedPairs(col("ns"))).as("p"),
        col("w_aa"), col("w_ra"))
      .groupBy(col("p.a").as("n_a"), col("p.b").as("n_b"))
      .agg(count(lit(1)).as("common"),
        sum(col("w_aa")).as("adamic_adar"),
        sum(col("w_ra")).as("resource_alloc"))
    // The deg joins are left UNHINTED on purpose: AQE converts both to
    // BroadcastHashJoin at runtime (verified on the executed adaptive
    // plan — the static audit's 2 SMJs never actually run), so the
    // Σd²/2-row `shared` frame is not shuffled for the degree lookups.
    // A static broadcast() needs a size guard, and the deg.count() that
    // sizes it serializes the deg build ahead of the main job (measured
    // ~1 s slower end-to-end at sf0.1); AQE makes the same call from
    // accurate runtime sizes for free, and on a graph whose |N|-row deg
    // frame outgrows the broadcast threshold it falls back to a shuffled
    // join — the correct shape — again without a hand-rolled probe.
    shared
      .join(deg.select(col("n").as("n_a"), col("deg").as("deg_a")), "n_a")
      .join(deg.select(col("n").as("n_b"), col("deg").as("deg_b")), "n_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("deg_a") + col("deg_b") - col("common")))
      .withColumn("pref_attach", col("deg_a") * col("deg_b"))
  }

  /** [[linkPrediction]]'s candidate-pair OCCURRENCE count — Σ over kept
    * shared neighbors of C(d, 2), i.e. exactly the number of pair rows
    * the explode stage would emit — WITHOUT emitting them: the same
    * capped adjacency aggregation (one shuffle of compact array rows),
    * then one scalar sum of size·(size−1)/2. No d²-row explode, no
    * pair aggregation, no edge materialization.
    *
    * Exists for the stress harness's wall-time-independent linearity
    * gate (round-13 verdict #5): the DISTINCT-pair count
    * (`linkPrediction(...).count()`) proved exact ×10/×30/×81/×243
    * linearity across four decades, but at ×729 materializing the pair
    * set (plus the checkpointed edge build feeding it) exceeded one
    * node's local disk — generator volume, not a plan regression. The
    * occurrence count carries the same signal at a fraction of the
    * cost: over `copies` disjoint isomorphic graph copies it must be
    * EXACTLY copies × the base count, and it is strictly MORE sensitive
    * than the distinct count (any cross-copy adjacency contamination
    * inflates occurrences even where pair dedup could mask it; a pair
    * gaining a shared neighbor changes occurrences but not distinct
    * pairs). GraphSpec pins it equal to `sum(common)` of the full op.
    */
  def linkPredictionPairOccurrences(edges: DataFrame, node: String, neighbor: String,
                                    maxNeighborDegree: Int = Int.MaxValue): Long = {
    val cappable = edges.schema(node).dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val adj =
      if (cappable)
        edges.groupBy(col(neighbor).as("nb"))
          .agg(graft.functions.AggF.cappedSortedSet(col(node), maxNeighborDegree).as("ns"))
          .where(col("ns").isNotNull)
      else
        edges.groupBy(col(neighbor).as("nb"))
          .agg(sort_array(collect_set(col(node))).as("ns"))
          .where(size(col("ns")) <= maxNeighborDegree)
    // sum d·(d−1) in LONG and halve on the driver: Spark's `/` on longs
    // is double division, and the gate's whole point is exact integers
    val d = size(col("ns")).cast("long")
    val twice = adj.agg(sum(d * (d - 1L)).as("occ2")).head()
    if (twice.isNullAt(0)) 0L else twice.getLong(0) / 2L
  }

  /** Connected components of an undirected graph by iterated min-label
    * propagation: every node repeatedly adopts the smallest component id
    * in its closed neighborhood until a fixed point (≤ component-diameter
    * rounds). Deterministic; returns (node, component) with component =
    * the smallest node id in the component.
    *
    * Each round is one join + one aggregation; the iterate is eagerly
    * localCheckpoint'ed (referenced twice: by the neighbor-min join and
    * the convergence anti-check — un-materialized it doubles lineage per
    * round).
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // TWO round-body tiers behind one probe (r17, round-16 VERDICT #1 —
    // the hitsCounts small/large-|V| split applied to min-label
    // propagation). The label frame is re-joined to the edges every
    // round, and WHICH side should move depends on |V|, not |E|:
    //
    //  - BROADCAST tier (|V|-row label frame under the session broadcast
    //    threshold): keep the round-16 shape — persisted unpartitioned
    //    edges, un-hinted joins. AQE broadcasts the label side at
    //    runtime, so the |E| side never shuffles AT ALL; pre-partitioning
    //    here is a strict loss (measured on a 1.17M-edge/16k-node graph:
    //    the co-partitioned shape shuffled 39.5 MB vs 18.2 MB — the
    //    upfront |E| repartition pays for exchanges AQE never runs, and
    //    the SHUFFLE_HASH hint would FORBID the broadcast).
    //  - SHUFFLE tier (labels past broadcast): the un-hinted planner
    //    degrades to a per-round SortMergeJoin that re-shuffles AND
    //    re-sorts the |E| side every round (each round is its own job —
    //    eager localCheckpoint — so exchange reuse never spans rounds).
    //    Pre-partition the edges by dst ONCE through an AQE-stable
    //    checkpoint (Ckpt.partitioned) and SHUFFLE_HASH the label
    //    builds: the |E| side streams exchange-free and unsorted every
    //    round, the |V|-row label joins pair already-co-partitioned
    //    frames sort-free. Measured in the tier's REAL regime (ProfileCC
    //    "tree 4000000": 4M nodes — labels ~190 MB, genuinely past
    //    broadcast — 8M symmetrized edges, 23 rounds): old
    //    152.3/145.6 s vs new 55.2/36.8 s, a 3-4x win.
    //
    // The probe is ONE map-side pass (approx_count_distinct of src; ±2%
    // against a threshold with wide headroom), riding the persist/
    // checkpoint materialization the loop needs anyway.
    val bcThresh = org.apache.spark.sql.graftx.Bridge
      .broadcastThreshold(edges.sparkSession)
    val und0 = graft.graph.Centrality.symmetrize(edges)
    val undSmall = und0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nv = undSmall.agg(approx_count_distinct(col("src"))).head().getLong(0)
    // label row ≈ two longs + row overhead in the broadcast relation
    val labelsBig = bcThresh < 0 || nv * 48L > bcThresh
    val und =
      if (!labelsBig) undSmall
      else {
        // shuffle tier re-materializes partitioned-by-dst and drops the
        // columnar cache (the checkpointed rows replace it)
        val p = graft.core.Ckpt.partitioned(undSmall.repartition(col("dst")))
        undSmall.unpersist(blocking = false)
        p
      }
    def hinted(df: DataFrame): DataFrame =
      if (labelsBig) df.hint("shuffle_hash") else df
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("component", col("node")).localCheckpoint()
    var changed = true
    var it = 0
    while (changed && it < maxIters) {
      it += 1
      val nbrMin = und.join(hinted(labels), und("dst") === labels("node"))
        .groupBy(und("src").as("node")).agg(min("component").as("__nc"))
      val next = labels.join(hinted(nbrMin), Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("__nc"), col("component"))).as("component"))
        .localCheckpoint()
      changed = !next.as("a").join(hinted(labels.as("b")), "node")
        .where(col("a.component") =!= col("b.component")).isEmpty
      labels = next
    }
    labels
  }

  /** One UN-checkpointed SHUFFLE-tier round of [[connectedComponents]]
    * over the same pre-partitioned edge frame — exposed so PlanAudit can
    * see the loop shape the eager per-round checkpoints hide (the
    * [[graft.graph.Centrality.hitsRoundForAudit]] precedent). The
    * broadcast tier needs no twin: it is the round-16 shape, unchanged.
    * Not a query path.
    */
  def ccRoundForAudit(edges: DataFrame): DataFrame = {
    val und = graft.core.Ckpt.partitioned(
      graft.graph.Centrality.symmetrize(edges).repartition(col("dst")))
    val labels = und.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
    val nbrMin = und.join(labels.hint("shuffle_hash"), und("dst") === labels("node"))
      .groupBy(und("src").as("node")).agg(min("component").as("__nc"))
    labels.join(nbrMin.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"),
        least(col("component"), coalesce(col("__nc"), col("component"))).as("component"))
  }

  /** Driver-local union-find components for a PROVABLY-SMALL aggregated
    * graph (size-guarded collect, the closenessLocal/greedyModularity
    * precedent): same (node, component = smallest member id) contract as
    * [[connectedComponents]], which remains the corpus-scale path. The
    * min-label iteration costs ~2 Spark jobs per diameter step — pure
    * scheduler overhead at 25 nodes.
    */
  def connectedComponentsLocal(edges: DataFrame, maxEdges: Long = 200000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    connectedComponentsLocalPairs(edges, maxEdges).toSeq.toDF("node", "component")
  }

  /** Driver-local core of [[connectedComponentsLocal]]: (node → min
    * component id) pairs as a plain array, for callers that continue
    * locally (group sizes, keep/drop) instead of round-tripping the tiny
    * result through another Spark job — see [[graft.text.NearDup.dupGroups]].
    */
  def connectedComponentsLocalPairs(edges: DataFrame,
                                    maxEdges: Long = 200000L,
                                    preGuarded: Boolean = false): Array[(Long, Long)] = {
    // guard stays count-then-collect (2 jobs): the tempting one-job
    // limit(maxEdges+1).collect() plans CollectLimitExec, whose
    // incremental partition fetch (1, then 4x, ...) runs FOUR sequential
    // rounds when a tiny graph never fills the limit — measured
    // g_components 0.60 -> 0.94 s before reverting (round 10).
    // preGuarded (r17): a caller that has ALREADY proven the symmetrized
    // count fits (symmetrize dedups and drops self-loops, so it emits
    // ≤ 2× the input pairs — dupGroups knows its exact pair count from
    // the persist-materializing probe) skips the redundant count job.
    val und = Centrality.symmetrize(edges)
    if (!preGuarded) {
      val cnt = und.count()
      require(cnt <= maxEdges,
        s"local components guard: $cnt symmetrized edges > $maxEdges — use connectedComponents")
    }
    val es = und.selectExpr("cast(src as long)", "cast(dst as long)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val find = unionFind(es)
    es.map(_._1).distinct.map(n => (n, find(n)))
  }

  /** Union-find over a collected edge array with path compression;
    * the MIN root id wins each union (matching the distributed
    * min-label propagation). Returns the `find` closure — shared by
    * [[connectedComponentsLocalPairs]] and [[graphInfoLocal]] so the
    * min-id invariant can't drift between the two local twins.
    */
  private def unionFind(es: Array[(Long, Long)]): Long => Long = {
    val parent = scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min id wins
    }
    find
  }

  /** One-row whole-graph summary (graph.py:30-86 `graph_info`, undirected
    * unweighted form): node/edge counts, density, transitivity
    * (3·triangles / wedges), average clustering coefficient, connected
    * components count + the largest component's size.
    *
    * Everything except the component iteration is ONE lazy plan; the
    * component frame comes from [[connectedComponents]] (inherently
    * iterative) — or, with `smallGraph = true`, from the size-guarded
    * local union-find — and joins in as a small aggregate.
    */
  def graphInfo(edges: DataFrame, smallGraph: Boolean = false): DataFrame = {
    if (smallGraph) return graphInfoLocal(edges)
    val cc = Centrality.clusteringCoefficient(edges)
    val compFrame = connectedComponents(edges)
    val comp = compFrame
      .groupBy("component").agg(count(lit(1)).as("csz"))
      .agg(count(lit(1)).as("components"), max("csz").as("largest_component"))
    val und = Centrality.symmetrize(edges)
    val base = cc.agg(
      count(lit(1)).as("nodes"),
      (sum(col("triangles")) / 3).cast("long").as("triangles"),
      sum(col("degree") * (col("degree") - 1) / 2).as("wedges"),
      avg(col("clustering")).as("avg_clustering"))
    val m = und.agg((count(lit(1)) / 2).cast("long").as("edges"))
    base.crossJoin(m).crossJoin(comp).select(
      col("nodes"), col("edges"),
      // nodes ≥ 2 guard: an empty graph's 0·(0−1) divisor is a hard
      // DIVIDE_BY_ZERO under ANSI mode (Spark 4 default), not a null
      when(col("nodes") >= 2,
        col("edges") * 2.0 / (col("nodes") * (col("nodes") - 1))).as("density"),
      when(col("wedges") > 0, col("triangles") * 3.0 / col("wedges"))
        .otherwise(0.0).as("transitivity"),
      col("avg_clustering"),
      col("components"), col("largest_component"))
  }

  /** Size-guarded driver-local twin of [[graphInfo]] — the same pattern
    * as [[connectedComponentsLocal]]: count the symmetrized edges first,
    * `require`-refuse above `maxEdges`, and otherwise compute the whole
    * 1-row summary in one pass over the collected edge list. The
    * distributed form runs ~4 independent job chains (triangle joins,
    * edge count, component agg, final crossJoins) whose scheduler
    * overhead dwarfs a tiny graph (g_info measured 1.16 s on the 5-node
    * sf0.1 nation graph; this path ~0.15 s). GraphInfoSpec pins equality
    * with the distributed twin on random graphs; above the guard the
    * distributed form is the corpus path, unchanged.
    *
    * Arithmetic mirrors the distributed/oracle form operation-for-
    * operation: triangles = Σ per-node / 3 in integers, wedges =
    * Σ d(d−1)/2 (exact integer values in double), transitivity =
    * triangles·3/wedges, avg clustering summed in ascending node order
    * (ulp-level order sensitivity is absorbed by the catalog's round-6
    * projection, same as the distributed sum's partition order).
    */
  def graphInfoLocal(edges: DataFrame, maxEdges: Long = 200000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // count-then-collect guard, NOT limit+collect — see the measured
    // CollectLimitExec note in connectedComponentsLocal
    val und = Centrality.symmetrize(edges)
    val cnt = und.count()
    require(cnt <= maxEdges,
      s"local graphInfo guard: $cnt symmetrized edges > $maxEdges — use graphInfo(smallGraph=false)")
    val es = und.selectExpr("cast(src as long)", "cast(dst as long)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val schema = Seq("nodes", "edges", "density", "transitivity",
      "avg_clustering", "components", "largest_component")
    // empty graph: the distributed twin's global aggregates over zero
    // rows yield (0, 0, null density — via its nodes≥2 guard — and
    // transitivity 0.0 via the wedges>0 guard, null avg, 0 components,
    // null max); mirror that row instead of letting empty.max throw
    if (es.isEmpty)
      return Seq((0L, 0L, Option.empty[Double], 0.0, Option.empty[Double],
        0L, Option.empty[Long])).toDF(schema: _*)
    val adj = scala.collection.mutable.LongMap.empty[scala.collection.mutable.HashSet[Long]]
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty[Long]) += b
    }
    val nodes = adj.keys.toArray.sorted
    val n = nodes.length.toLong
    val m = es.length.toLong / 2 // symmetrize emits both directions, distinct
    // Per-node triangle counts by FORWARD adjacency over a degree order
    // (count each triangle once at its lowest-ordered vertex, credit all
    // three corners): O(Σ fwd-degree²) ≤ O(m^1.5), where the naive
    // all-neighbor-pairs loop is O(Σ d²) — a 100k-edge star passes the
    // edge guard yet would cost 5·10⁹ set probes single-threaded there.
    // Pre-resolve the degree order to dense int indices once — the
    // merge-intersect inner loop then runs pure primitive int compares
    // (a LongMap probe per comparison would undo the rewrite's point)
    val byOrder = nodes.sortBy(u => (adj(u).size, u))
    val ordOf = scala.collection.mutable.LongMap.empty[Int]
    byOrder.zipWithIndex.foreach { case (u, i) => ordOf(u) = i }
    val fwd: Array[Array[Int]] = byOrder.map { u =>
      val ou = ordOf(u)
      adj(u).iterator.map(ordOf).filter(_ > ou).toArray.sorted
    }
    val triByOrd = new Array[Long](byOrder.length)
    var uo = 0
    while (uo < fwd.length) {
      val fu = fwd(uo)
      var i = 0
      while (i < fu.length) {
        val vo = fu(i)
        // merge-intersect the two order-sorted forward lists
        val fv = fwd(vo)
        var a = 0
        var b = 0
        while (a < fu.length && b < fv.length) {
          val oa = fu(a)
          val ob = fv(b)
          if (oa == ob) {
            triByOrd(uo) += 1; triByOrd(vo) += 1; triByOrd(oa) += 1
            a += 1; b += 1
          } else if (oa < ob) a += 1
          else b += 1
        }
        i += 1
      }
      uo += 1
    }
    var triTotal = 0L
    var wedges = 0.0
    var clusterSum = 0.0
    nodes.foreach { u => // ascending node order: the scaladoc'd sum order
      val d = adj(u).size.toLong
      val t = triByOrd(ordOf(u))
      triTotal += t
      wedges += (d * (d - 1) / 2).toDouble
      clusterSum += (if (d >= 2) t * 2.0 / (d * (d - 1)) else 0.0)
    }
    val triangles = triTotal / 3
    // components: shared union-find (min id wins)
    val find = unionFind(es)
    val compSizes = nodes.groupBy(find).map(_._2.length)
    Seq((n, m,
        m * 2.0 / (n * (n - 1)),
        if (wedges > 0) triangles * 3.0 / wedges else 0.0,
        clusterSum / n,
        compSizes.size.toLong, compSizes.max.toLong))
      .toDF(schema: _*)
  }

  /** PageRank by iterated joins (damping d, fixed iteration count —
    * deterministic; graph.py's networkx pagerank analog). Dangling mass
    * is redistributed uniformly, matching networkx semantics.
    *
    * No per-iteration driver-side aggregate: the dangling mass is a 1-row
    * aggregate cross-joined (broadcast) into the update plan. Each round
    * is eagerly localCheckpoint'ed: the update references the previous
    * ranks through BOTH the dangling aggregate and the contribution join,
    * so an un-materialized iteration DOUBLES the lineage (the
    * GraphX-Pregel per-round materialization pattern).
    */
  def pageRank(edges0: DataFrame, iters: Int = 10, d: Double = 0.85): DataFrame = {
    // per-round edge join tiered like connectedComponents (r17): the
    // edge frame is materialized ONCE (it used to re-run its upstream
    // subtree every round — each round is its own job) and, past the
    // broadcast threshold, pre-partitioned by src with the rank side
    // riding SHUFFLE_HASH — see [[graft.graph.Centrality.tieredByKey]].
    val (edges, hinted) =
      graft.graph.Centrality.tieredByKey(
        edges0.select(col("src"), col("dst")), "src")
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count().toDouble
    val outDeg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("out"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val withOut = ranks.join(outDeg, Seq("node"), "left")
      val dangling = withOut.where(col("out").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      val contribs = hinted(withOut.where(col("out").isNotNull))
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), (col("rank") / col("out")).as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      ranks = nodes.join(contribs, Seq("node"), "left").crossJoin(dangling)
        .select(col("node"),
          (lit((1 - d) / n) + lit(d) * (coalesce(col("in_rank"), lit(0.0)) + col("__dm") / n))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
