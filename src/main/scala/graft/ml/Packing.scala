package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Token-budget sequence packing for training pipelines: group documents
  * into packs whose token totals stay within a fixed budget (the
  * sequence-length packing step between corpus cleaning and batching —
  * no single reference analog; [[Splits]] covers the reference's
  * index-level batching, this covers the token-level packing a trainer
  * with fixed context length needs).
  *
  * Plan shape (the 100 TB story): ONE shuffle — a deterministic hash
  * repartition on the id — then per-partition work only. Each partition
  * sorts its documents by token count descending and runs best-fit
  * decreasing over a balanced tree of open packs keyed by remaining
  * capacity, so a partition of n documents packs in O(n log n) time and
  * O(open packs) heap. Nothing ever collects to the driver and no
  * partition needs another's state: pack ids are made globally unique by
  * prefixing the partition id. Packing quality is per-partition BFD,
  * which is within 11/9·OPT + 1 packs of that partition's optimum; the
  * cross-partition loss is at most one under-filled pack per partition,
  * amortized to nothing at corpus scale (a 100 TB corpus has millions of
  * packs per partition).
  *
  * mapPartitions (not a window/aggregate) is the honest primitive here:
  * bin packing is inherently sequential per partition — each assignment
  * depends on every previous one through the open-pack state, which no
  * window frame or aggregate buffer expresses.
  */
object Packing {

  /** Pack id layout: partition id in the high bits, partition-local pack
    * index in the low 40 — supports 2^23 partitions × 2^40 packs each.
    */
  private val LocalBits = 40

  /** Assign every row a `pack` (long) such that the sum of `ntokCol`
    * within a pack is <= `budget`, except single-document packs whose
    * one document alone exceeds the budget (they are emitted as their
    * own pack rather than dropped — the caller decides whether to
    * truncate or discard; filter `ntokCol > budget` beforehand to
    * exclude them). Null token counts pack as 0.
    *
    * Deterministic: hash partitioning on the id, a (ntok desc, id) sort
    * within each partition, and tie-breaks on insertion order make the
    * assignment a pure function of (rows, budget, partition count).
    */
  def pack(df: DataFrame, idCol: String, ntokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("pack"),
      "input already has a 'pack' column — drop it before re-packing")
    val schema = df.schema.add("pack", LongType, nullable = false)
    val ti = df.schema.fieldIndex(ntokCol)
    val packed = df
      .repartition(col(idCol))
      .sortWithinPartitions(col(ntokCol).desc, col(idCol))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // open packs: remaining capacity -> stack of pack ids with that
        // remaining; best fit = smallest remaining that still admits the
        // document = ceilingEntry(ntok)
        val open = new java.util.TreeMap[Long, java.util.ArrayDeque[Long]]()
        var nextLocal = 0L
        def push(packId: Long, rem: Long): Unit =
          open.computeIfAbsent(rem, _ => new java.util.ArrayDeque[Long]()).push(packId)
        it.map { r =>
          val ntok = if (r.isNullAt(ti)) 0L
            else r.get(ti).asInstanceOf[Number].longValue
          val fit = open.ceilingEntry(ntok)
          val packId = if (fit != null) {
            // a pack's remaining capacity IS its TreeMap key — no side
            // table needed
            val stack = fit.getValue
            val id = stack.pop()
            val rem = fit.getKey - ntok
            if (stack.isEmpty) open.remove(fit.getKey)
            if (rem > 0) push(id, rem)
            id
          } else {
            val id = (pid << LocalBits) | nextLocal
            nextLocal += 1
            val rem = budget - ntok // negative only for oversize docs
            if (rem > 0) push(id, rem)
            id
          }
          Row.fromSeq(r.toSeq :+ packId)
        }
      }(Encoders.row(schema))
    packed
  }

  /** Per-pack audit frame: document count, token total, and fill rate —
    * one groupBy over the packed output.
    */
  def packStats(packed: DataFrame, ntokCol: String, budget: Long): DataFrame =
    packed.groupBy("pack").agg(
      count(lit(1)).as("n_docs"),
      sum(coalesce(col(ntokCol).cast("long"), lit(0L))).as("n_tokens"))
      .withColumn("fill", round(col("n_tokens").cast("double") / budget, 6))
}
