package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bootstrap resampling of risk statistics (reference `bootstrap_risk`
  * finance.py:339-357: n× sample-with-replacement, historical risk per
  * sample).
  *
  * The reference draws with `np.random.choice`; here the draw is a
  * DETERMINISTIC double Lehmer step
  * idx(g) = (((g+1)·48271 mod M)·16807 mod M) mod N, M = 2³¹−1, over the
  * global draw index g = b·N+i — reproducible across engines (the oracle
  * replicates the identical integer arithmetic in SQL). The SECOND
  * multiply is load-bearing: with one step, the b→b+1 shift of
  * 48271·N ≡ 0 (mod N) survives the mod M for nearly every draw and all
  * replicates collapse to the same sample; the second modmul wraps M
  * ~19000× across a replicate, decorrelating them. Fully distributed:
  * `spark.range(n·N)` → index join against the ranked observations →
  * per-replicate aggregation; no driver-side loop.
  */
object Bootstrap {

  /** `n` bootstrap replicates of (VaR, ES, vol) at tail prob `alpha`
    * from the non-null values of `valueCol`, ordered deterministically by
    * `idCol` for the index join. Output: (b, var_a, es_a, vol, n_obs).
    */
  def bootstrapRisk(df: DataFrame, idCol: String, valueCol: String,
                    alpha: Double, n: Int): DataFrame = {
    val spark = df.sparkSession
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(valueCol).as("__v"))
      // rid assignment is inherently a GLOBAL enumeration of the
      // (bounded) observation set; run it as one named partition rather
      // than an unpartitioned window (same plan, no WindowExec warning)
      .withColumn("__rid",
        row_number().over(Window.partitionBy(lit(1)).orderBy(idCol)) - 1)
    val nObs = vals.count()
    val draws = spark.range(n.toLong * nObs)
      .select((col("id") / nObs).cast("long").as("b"),
        ((((col("id") + 1) * 48271L) % 2147483647L * 16807L) % 2147483647L % nObs)
          .as("__rid"))
    val sampled = draws.join(vals.select("__rid", "__v"), "__rid")
    val q = sampled.groupBy("b")
      .agg(expr(s"percentile(__v, ${alpha})").as("__q"))
    // q is exactly n rows (one per replicate — a caller constant, not a
    // data-dependent size), so broadcast it: the planner's static
    // estimate for the percentile aggregate is unknown and it planned a
    // SortMergeJoin, which re-shuffled and sorted the n·N-row sample by
    // `b` (plan audit r16: SMJ + Exchange + 2 Sorts on the sample side)
    // just to attach 20 quantile scalars. With the hint the sample flows
    // straight from the index join into the final aggregation.
    // REPLICATE-COUNT ASSUMPTION (round-16 ADVICE): the hint is
    // unconditional on the caller's n — correct for the intended use
    // (bootstrap replicate counts are tens to thousands; n·~50 B rows
    // stay far under any broadcast limit), but a caller passing a very
    // large n (≳ 10⁷) would force a correspondingly large driver-side
    // broadcast. Replicates, not observations, set n — keep it small.
    sampled.join(broadcast(q), "b")
      .groupBy("b")
      .agg(min("__q").as("var_a"),
        avg(when(col("__v") <= col("__q"), col("__v"))).as("es_a"),
        stddev_pop(col("__v")).as("vol"),
        count(lit(1)).as("n_obs"))
  }
}
