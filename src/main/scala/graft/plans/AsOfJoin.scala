package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftx.Bridge

/** Native sort-merge as-of join (SURVEY.md §4.2.1 — the declared 100 TB
  * endgame for the J2/J3/W8 family): a custom logical node, planner
  * strategy, and physical operator.
  *
  * Physical shape: both sides hash-clustered on the join keys and sorted
  * by (keys, time) — EnsureRequirements inserts exactly one exchange +
  * sort per side — then each partition pair is a LINEAR single-pass
  * merge: the right cursor trails the left one, carrying the latest
  * qualifying value row. No candidate-pair expansion (vs the decorrelated
  * range-join form), no window materialization of the union frame (vs the
  * union-merge form); memory per task is O(1) beyond the sorters.
  *
  * Enabled behind the `spark.graft.asof.native` flag via
  * `spark.experimental.extraStrategies` (so it works on any session, no
  * builder-time extension wiring); [[graft.ops.AsOf.joinBackward]]
  * dispatches on that flag and is differential-tested against the
  * union-merge form (AsOfStrategySpec).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        rightValues: Seq[Attribute], allowExact: Boolean)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  // every left column passes through to the output — declare them all
  // referenced so ColumnPruning cannot cut them; the right side prunes
  // down to keys + time + carried values (desirable)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ rightKeys ++ Seq(rightTime) ++ rightValues ++ leftKeys :+ leftTime)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, ae) =>
      SortMergeAsOfExec(lk, rk, lt, rt, rv, ae, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class SortMergeAsOfExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                             leftTime: Attribute, rightTime: Attribute,
                             rightValues: Seq[Attribute], allowExact: Boolean,
                             left: SparkPlan, right: SparkPlan)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  // The merge zips child partitions pairwise, so the sides must be
  // EXACTLY co-partitioned: require ALL cluster keys (a subset-key hash
  // partitioning would satisfy plain ClusteredDistribution yet misalign
  // the pairs). The partition COUNT is deliberately NOT pinned — that is
  // EnsureRequirements' job (it shuffles a mismatched side to the
  // compatible count, exactly the SortMergeJoin contract), and pinning
  // it forced a full re-shuffle of inputs already bucketed by the join
  // key (the zero-exchange bucketed as-of, asserted in PlanSpec). AQE
  // coalesces the two shuffled sides consistently for binary nodes and
  // re-validates requirements after each re-plan; misalignment would
  // fail the pairwise zip loudly (and is exercised by AsOfPropertySpec
  // with AQE on).
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightKeys :+ rightTime).map(a => SortOrder(a, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val exact = allowExact
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val rValsB = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val rValProj = UnsafeProjection.create(rValsB, rOut)
      // bind the output projection against NULLABLE copies of the value
      // attributes: unmatched left rows feed a null row, and a projection
      // bound to a nullable=false attribute skips the null check and
      // writes a raw 0 (caught by AsOfPropertySpec)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rValsB.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      val nullVals = new GenericInternalRow(rValsB.length)
      val joined = new JoinedRow

      // one-row right lookahead (copied — operators reuse row objects)
      var hasHead = false
      var headKey: UnsafeRow = null
      var headTime: UnsafeRow = null
      var headVal: UnsafeRow = null
      def pull(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          headKey = rKeyProj(r).copy()
          headTime = rTimeProj(r).copy()
          headVal = rValProj(r).copy()
          hasHead = true
        } else hasHead = false
      pull()

      var curKey: UnsafeRow = null
      var curVal: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        while (hasHead && {
          val kc = keyOrd.compare(headKey, lk)
          kc < 0 || (kc == 0 && {
            val tc = timeOrd.compare(headTime, lt)
            tc < 0 || (exact && tc == 0)
          })
        }) {
          curKey = headKey
          curVal = headVal
          pull()
        }
        val matched = curKey != null && keyOrd.compare(curKey, lk) == 0
        outProj(joined(l, if (matched) curVal else nullVals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsOfExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Install the strategy into the session (idempotent). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }

  /** Backward as-of join through the native operator: left columns plus
    * `valueCols` from the latest right row with rightTime ≤ leftTime
    * (strict < when `allowExact` is false), matched on `keys`.
    * `right` must not share value-column names with `left`.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   timeCol: String, valueCols: Seq[String],
                   allowExact: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    Bridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, timeCol), attr(rPlan, timeCol),
      valueCols.map(attr(rPlan, _)), allowExact))
  }
}
