package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting + batching for training pipelines
  * (reference `finds/recipes/learn.py:36-73` `form_batches` /
  * `form_splits`, re-expressed for a 100 TB corpus).
  *
  * The reference shuffles index lists in memory; here the "shuffle" is a
  * DETERMINISTIC double-Lehmer hash of the row id (the
  * [[graft.ops.Bootstrap]] generator — reproducible across engines and
  * cluster sizes, no RNG state). Split assignment is a pure per-row map
  * (no shuffle); batch numbering is one window per split. Stratification
  * falls out of hashing the ID: within every label slice the hash is
  * uniform, so fractions hold per label in expectation; `strataCol`
  * makes it exact per stratum (row_number within label).
  */
object Splits {

  /** Double-Lehmer uniform in [0, 1) from a non-negative long id —
    * the Bootstrap draw generator normalized to a fraction.
    *
    * Id domain: [0, 2⁴⁶). The first Lehmer step `(id + 1) * 48271`
    * overflows Long for ids ≳ 2⁴⁷ and Java's `%` then returns a
    * NEGATIVE residue — every such row would silently land in the first
    * split (`u < c` always true) and make [[batches]] ordering
    * degenerate; a snowflake-style 64-bit id corpus would hit this on
    * every row. The formula itself is oracle-pinned (the t_split DuckDB
    * replay), so out-of-domain ids raise per-row instead of the formula
    * changing: 2⁴⁶ · 48271 < 2⁶³ keeps the product exact with margin.
    * The TRUE overflow point is (2⁶³/48271 − 1) ≈ 2⁴⁷·⁴ — ids in
    * [2⁴⁶, ~2⁴⁷·⁴) previously produced correct, oracle-pinned output
    * and now raise; the 2⁴⁶ cutoff is a DELIBERATELY conservative
    * power-of-two margin (~2.7× below the edge), chosen so the
    * documented domain is round and the guard never sits one
    * arithmetic slip from silent wraparound. Callers with formerly
    * valid ids in that band must now re-key too (hard behavior change,
    * intentional). Re-key wider ids first (e.g.
    * `xxhash64 & ((1L << 46) - 1)` — or
    * use [[sampleWeighted]]/[[sampleLogWeighted]], which hash the id
    * and have no domain bound).
    */
  def uniform01(id: Column): Column = {
    val guarded = when(id >= 0 && id < (1L << 46), id).otherwise(
      raise_error(concat(
        lit("graft.ml.Splits.uniform01: id out of domain [0, 2^46) — " +
          "the Lehmer step would overflow and silently skew the split; " +
          "re-key the id first (got "),
        id.cast("string"), lit(")"))))
    (((guarded + 1) * 48271L % 2147483647L * 16807L) % 2147483647L)
      .cast("double") / 2147483647.0
  }

  /** Add a `split` column: `names(i)` where the id-hash falls in the
    * i-th cumulative fraction bucket. Pure per-row projection — at any
    * scale this is a free map over the scan.
    */
  def assign(df: DataFrame, idCol: String, fractions: Seq[Double],
             names: Seq[String]): DataFrame = {
    require(fractions.length == names.length && fractions.sum <= 1.0 + 1e-9)
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    val u = uniform01(col(idCol).cast("long"))
    val expr = names.zip(cum).foldRight(lit(names.last)) { case ((n, c), acc) =>
      when(u < c, n).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Exact stratified split: within each stratum, rank rows by
    * (id-hash, id) and cut by cumulative fractions — every stratum gets
    * the exact proportions (the reference's per-label split of
    * form_splits). One shuffle on the stratum key.
    */
  def assignStratified(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Seq[Double], names: Seq[String]): DataFrame = {
    require(fractions.length == names.length && fractions.sum <= 1.0 + 1e-9)
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    val u = uniform01(col(idCol).cast("long"))
    val w = Window.partitionBy(strataCol).orderBy(u, col(idCol))
    val n = Window.partitionBy(strataCol)
    val frac = (row_number().over(w).cast("double") - 0.5) / count(lit(1)).over(n)
    val expr = names.zip(cum).foldRight(lit(names.last)) { case ((nm, c), acc) =>
      when(frac < c, nm).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Number rows into fixed-size batches within each split (form_batches
    * learn.py:36-49): batch = floor(rank / batchSize), rank ordered by
    * (id-hash, id) so batch membership is deterministic and independent
    * of physical layout.
    */
  def batches(df: DataFrame, idCol: String, batchSize: Int,
              splitCol: String = "split"): DataFrame = {
    val w = Window.partitionBy(splitCol)
      .orderBy(uniform01(col(idCol).cast("long")), col(idCol))
    df.withColumn("batch",
      ((row_number().over(w) - 1) / batchSize).cast("long"))
  }

  /** Weighted sampling of `k` rows WITHOUT replacement, by the
    * Efraimidis–Spirtes exponential-key scheme: each row draws a
    * deterministic uniform u from (0, 1) and the k rows with the largest
    * u^(1/w) win — equivalent to sequential weighted draws without
    * replacement. The curation use case is quality-weighted corpus
    * subsampling (`weightCol` = the quality score), where plain
    * `df.sample` cannot bias toward better documents.
    *
    * Plan shape (the 100 TB story): the key is a per-row projection and
    * the selection is `orderBy(key).limit(k)`, which Spark plans as
    * TakeOrderedAndProject — a map-side top-k per partition and one
    * k·partitions-row reduce, never a full sort or shuffle of the
    * corpus. Rows with weight <= 0 or null are excluded (zero weight =
    * zero inclusion probability; the reference semantics of
    * numpy.random.choice with p=0).
    *
    * Deterministic: u comes from xxhash64(id, seed) — reruns and
    * different layouts return the same sample; vary `seed` for fresh
    * draws. Maximizing u^(1/w) is ordering by ln(u)/w (both negative;
    * larger = closer to 0), computed in log space so tiny u at extreme
    * weights cannot underflow.
    */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    eligible(df, weightCol)
      .withColumn("__es_key", esKey(idCol, weightCol, seed))
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** [[sampleWeighted]] with the weight given in LOG space (natural
    * log), for weights whose linear form under- or overflows double —
    * the DSIR importance weight ([[graft.text.NgramLm]]) is a sum of
    * thousands of log-ratios, so exp() of it is not representable.
    * Gumbel-top-k: the k rows maximizing ln w + G win, where
    * G = −ln(−ln u) is a standard Gumbel draw from the SAME
    * deterministic u as [[sampleWeighted]] — ln w + G is a monotone
    * transform of the Efraimidis–Spirtes key ln(u)/w, so for any
    * weight column where both forms are representable the two methods
    * select IDENTICAL rows at the same seed (spec-pinned). Same
    * TakeOrderedAndProject plan shape. Rows with a null, NaN, or
    * non-finite log weight are excluded (−∞ = zero weight; +∞ would
    * monopolize the sample).
    */
  def sampleLogWeighted(df: DataFrame, idCol: String, logWeightCol: String,
                        k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val lw = col(logWeightCol).cast("double")
    df.where(lw.isNotNull && !isnan(lw) &&
        lw > Double.NegativeInfinity && lw < Double.PositiveInfinity)
      .withColumn("__es_key", lw - log(-log(u01(idCol, seed))))
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** The Efraimidis–Spirtes selection key ln(u)/w (both negative; larger
    * = closer to 0 = better). 63-bit fraction in (0, 1): never exactly 0
    * (the +0.5) so ln(u) is finite, never 1 so ln(u) < 0.
    */
  private def esKey(idCol: String, weightCol: String, seed: Long): Column =
    log(u01(idCol, seed)) / col(weightCol).cast("double")

  /** The deterministic uniform draw in (0, 1) both sampling keys share:
    * 63-bit hash fraction, never exactly 0 (the +0.5) or 1.
    */
  private def u01(idCol: String, seed: Long): Column =
    (xxhash64(col(idCol), lit(seed)).bitwiseAND(lit(Long.MaxValue))
      .cast("double") + 0.5) / 9.223372036854776e18

  /** Rows with a usable positive FINITE weight. NaN must be excluded
    * explicitly: Spark's NaN-ordering makes `NaN > 0` TRUE and sorts
    * the resulting NaN keys above every real key, so NaN-weight rows
    * (e.g. a degenerate quality score) would otherwise monopolize the
    * sample. +∞ likewise: its key ln(u)/∞ = −0.0 ties at the top and
    * such rows would win in id order — and [[sampleLogWeighted]]
    * already excludes non-finite log weights, so the two spec-pinned-
    * identical methods must agree on the edge (round-11 ADVICE).
    */
  private def eligible(df: DataFrame, weightCol: String): DataFrame = {
    val w = col(weightCol).cast("double")
    df.where(col(weightCol).isNotNull && !isnan(w) &&
      w > 0 && w < Double.PositiveInfinity)
  }

  /** [[sampleWeighted]] stratified by `groupCol`: an independent
    * weighted draw of `k` rows (without replacement) inside every group
    * — per-source corpus subsampling where a global draw would let one
    * large domain crowd out the rest.
    *
    * Plan shape (the 100 TB story): NOT a window sort. The per-group
    * winners come from the bounded [[graft.functions.AggF.topKNeighbors]]
    * aggregate — map-side buffers hold at most k (key, id) entries per
    * group per partition, so only k·partitions rows per group cross the
    * wire (a row_number window would sort every group's full row set).
    * The winning ids then semi-join back, a join AQE broadcasts (the
    * winner side is ≤ k·groups ids by construction).
    */
  /** The per-group paths route winner ids through a long-typed
    * aggregate and join them back BY VALUE, so the id column must be
    * integral — a silent cast would null out string ids (empty sample)
    * or collapse distinct decimals onto one long (over-sized sample).
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
      s"per-group sampling needs an int/long id column; '$idCol' is $dt")
  }

  def sampleWeightedPerGroup(df: DataFrame, idCol: String, weightCol: String,
                             groupCol: String, k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIntegralId(df, idCol)
    val winners = eligible(df, weightCol)
      .groupBy(col(groupCol))
      .agg(graft.functions.AggF.topKNeighbors(
        col(idCol).cast("long"), esKey(idCol, weightCol, seed), k).as("__top"))
      .select(explode(col("__top")).as("__w"))
      .select(col("__w.neighbor_id").as("__wid"))
    df.join(winners, col(idCol).cast("long") === col("__wid"), "left_semi")
  }

  /** Draw a target MIXTURE: `counts(g)` weighted-sampled rows from each
    * group `g` (domain/source re-balancing to a prescribed recipe, the
    * Pile/Dolma-style mixing step). Groups absent from `counts`
    * contribute nothing; a group smaller than its target yields all its
    * eligible rows. One aggregate pass sized by the LARGEST target: the
    * per-group top-max(counts) winners are ranked by the aggregate's
    * sorted output and cut to each group's own target, so the plan is
    * identical to [[sampleWeightedPerGroup]] plus a literal-map lookup.
    */
  def sampleMixture(df: DataFrame, idCol: String, weightCol: String,
                    groupCol: String, counts: Map[String, Int],
                    seed: Long = 0L): DataFrame = {
    require(counts.nonEmpty, "counts must name at least one group")
    require(counts.values.forall(_ > 0), s"counts must be positive: $counts")
    requireIntegralId(df, idCol)
    // the recipe keys are strings, so the group column must be too — an
    // implicit cast would silently match on number rendering
    require(df.schema(groupCol).dataType == org.apache.spark.sql.types.StringType,
      s"sampleMixture keys its recipe by string group values; '$groupCol' is " +
        s"${df.schema(groupCol).dataType}")
    val kmax = counts.values.max
    val targets = typedLit(counts)
    val winners = eligible(df, weightCol)
      .where(col(groupCol).isin(counts.keys.toSeq: _*))
      .groupBy(col(groupCol))
      .agg(graft.functions.AggF.topKNeighbors(
        col(idCol).cast("long"), esKey(idCol, weightCol, seed), kmax).as("__top"))
      // the aggregate's array is sorted best-first: position = rank
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__rank", "__w")))
      .where(col("__rank") < element_at(targets, col(groupCol)))
      .select(col("__w.neighbor_id").as("__wid"))
    df.join(winners, col(idCol).cast("long") === col("__wid"), "left_semi")
  }
}
