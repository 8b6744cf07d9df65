package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Mutable buffer for [[CappedSortedSet]]: a distinct-value set that
  * gives up (overflow) once it exceeds the cap, freeing its memory. Both
  * map-side partial aggregation and the shuffled merge carry at most
  * cap+1 values per group — the property that makes a groupBy-adjacency
  * build safe under hub keys at scale.
  */
final class CappedSet(var overflow: Boolean) {
  val values = new java.util.HashSet[java.lang.Long]()
}

/** `cappedSortedSet(child, cap)` — distinct values of an int/long column
  * per group as a SORTED array, or NULL when the group has more than
  * `cap` distinct values.
  *
  * The point versus `collect_set` + post-filter is bounded state: a hub
  * group stops accumulating the moment it crosses the cap (update AND
  * merge), so per-group memory and shuffle payload are O(cap), not
  * O(group size). Used by [[graft.graph.GraphOps.linkPrediction]] to
  * build per-neighbor adjacency lists in ONE shuffle with the
  * hub-neighbor guard enforced inside the aggregation.
  *
  * Int values sort by their sign-extended long form (order-preserving).
  */
case class CappedSortedSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedSet] with UnaryLike[Expression] {

  override def prettyName: String = "graft_capped_sorted_set"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType if cap > 0 => TypeCheckResult.TypeCheckSuccess
    case IntegerType | LongType =>
      TypeCheckResult.TypeCheckFailure(s"cap must be positive, got $cap")
    case t =>
      TypeCheckResult.TypeCheckFailure(s"int/long column required, got $t")
  }

  override def createAggregationBuffer(): CappedSet = new CappedSet(false)

  override def update(buf: CappedSet, input: InternalRow): CappedSet = {
    if (!buf.overflow) {
      val v = child.eval(input)
      if (v != null) {
        val l = v match {
          case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
          case l: java.lang.Long => l
        }
        buf.values.add(l)
        if (buf.values.size > cap) { buf.overflow = true; buf.values.clear() }
      }
    }
    buf
  }

  override def merge(buf: CappedSet, other: CappedSet): CappedSet = {
    if (other.overflow) { buf.overflow = true; buf.values.clear() }
    else if (!buf.overflow) {
      buf.values.addAll(other.values)
      if (buf.values.size > cap) { buf.overflow = true; buf.values.clear() }
    }
    buf
  }

  override def eval(buf: CappedSet): Any =
    if (buf.overflow) null
    else {
      val arr = new Array[Long](buf.values.size)
      val it = buf.values.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      java.util.Arrays.sort(arr)
      if (child.dataType == LongType) UnsafeArrayData.fromPrimitiveArray(arr)
      else {
        val ints = new Array[Int](arr.length)
        var j = 0
        while (j < arr.length) { ints(j) = arr(j).toInt; j += 1 }
        UnsafeArrayData.fromPrimitiveArray(ints)
      }
    }

  override def serialize(buf: CappedSet): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + 8 * buf.values.size)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putInt(buf.values.size)
    val it = buf.values.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedSet = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedSet(bb.get() == 1)
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.values.add(java.lang.Long.valueOf(bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedSortedSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedSortedSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedSortedSet =
    copy(child = newChild)
}

/** Column-level entry points for graft's native aggregates. */
object AggF {
  /** Sorted distinct int/long array per group; NULL once the group
    * exceeds `cap` distinct values (bounded state — see
    * [[CappedSortedSet]]).
    */
  def cappedSortedSet(c: Column, cap: Int): Column =
    Bridge.column(CappedSortedSet(Bridge.expression(c), cap).toAggregateExpression())

  /** Bounded top-k per group, ordered (score desc, id asc) — see
    * [[TopKNeighbors]]. Returns array<struct<neighbor_id:long,
    * cos:double>> in rank order.
    */
  def topKNeighbors(id: Column, score: Column, k: Int): Column =
    Bridge.column(TopKNeighbors(Bridge.expression(id), Bridge.expression(score), k)
      .toAggregateExpression())
}

/** Mutable buffer for [[TopKNeighbors]]: parallel arrays of the current
  * best ≤ k (score, id) entries kept sorted (score desc, id asc). Both
  * map-side partial aggregation and the shuffled merge carry at most k
  * entries per group.
  */
final class TopKBuf(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true when (s, id) ranks strictly better than slot i. */
  @inline private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !beats(s, id, n - 1)) return
    var i = if (n < k) n else n - 1 // slot that will shift/drop
    if (n < k) n += 1
    while (i > 0 && beats(s, id, i - 1)) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(i) = s; ids(i) = id
  }
}

/** `topKNeighbors(id, score, k)` — the k best (score desc, id asc)
  * entries per group as an array of structs in rank order: the
  * aggregation form of `row_number().over(partitionBy(g).orderBy(score
  * desc, id)) <= k`.
  *
  * The point versus the window form is the SHUFFLE SHAPE at scale: a
  * window sorts and shuffles EVERY candidate row to its group's
  * partition before ranking (the ANN rescoring stage emits
  * queries × probed-list-size rows), while the aggregate keeps a k-entry
  * buffer per group map-side and shuffles at most k entries per (group,
  * input partition) — the candidate volume never crosses the wire.
  * Identical output to the window form incl. the id tie-break on equal
  * scores (spec-pinned) for finite scores; null and NaN scores are
  * excluded deterministically (the window's desc sort ranked NaN FIRST —
  * an ordering artifact, not a neighbor), so a group with fewer than k
  * finite-scored candidates returns fewer than k entries.
  */
case class TopKNeighbors(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def prettyName: String = "graft_topk_neighbors"
  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (id.dataType, score.dataType) match {
    case _ if k <= 0 => TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    case (IntegerType | LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (i, s) => TypeCheckResult.TypeCheckFailure(
      s"(int/long id, double score) required, got ($i, $s)")
  }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val iv = id.eval(input)
    val sv = score.eval(input)
    if (iv != null && sv != null) {
      val s = sv.asInstanceOf[java.lang.Double].doubleValue()
      // NaN is EXCLUDED, not ranked: every NaN comparison is false, so a
      // NaN admitted while the buffer is unfilled would sit where it
      // landed and block later finite scores from shifting past it —
      // breaking the (score desc, id asc) invariant the merge relies on.
      // (Exclusion also replaces the window form's desc-sort artifact of
      // ranking NaN FIRST; a NaN cosine is never a meaningful neighbor.)
      if (!java.lang.Double.isNaN(s)) {
        val l = iv match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long => l.longValue()
        }
        buf.insert(s, l)
      }
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val l = bb.getLong()
      buf.insert(s, l)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNeighbors =
    copy(id = newChildren(0), score = newChildren(1))
}
