package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import graft.functions.{NgramBuckets, NgramScore}

/** Hashed bag-of-ngram language models over the document corpus: the
  * two standard model-based curation gates of an LLM data pipeline,
  * built on one shared feature space ([[graft.functions.NgramLmKernel]]
  * — whitespace word k-grams, k = 1..n, hashed into a fixed bucket
  * table):
  *
  *  - '''quality scoring''' (CCNet, Wenzek et al. 2020): fit the model
  *    on a trusted target corpus, score every raw document with its
  *    cross-entropy (bits/ngram) under that model — low bits = looks
  *    like the target distribution, high bits = gibberish/boilerplate.
  *    The hashed bag model stands in for CCNet's KenLM (no pure-JVM
  *    KenLM exists); the gate semantics — rank by likelihood under a
  *    target-corpus LM, keep the head/tail — are the same.
  *  - '''importance resampling''' (DSIR, Xie et al. 2023): fit the SAME
  *    feature distribution on target and raw, weight every raw document
  *    by log p_target(doc) − log p_raw(doc), and sample ∝ weight —
  *    the paper's exact estimator (§3: hashed unigram+bigram bag,
  *    importance weights on feature counts, Gumbel-top-k resample).
  *
  * Scale shape (the 100 TB story): `fit` is ONE shuffle whose width is
  * bounded by the bucket-table size regardless of corpus size — the
  * per-row featurizer explodes bucket ids and the groupBy partially
  * aggregates map-side, so each partition ships ≤ `buckets` rows; the
  * driver collects the ≤ `buckets`-row table once (a constant, like the
  * IVF quantizer sample — never corpus-proportional). Scoring is a
  * shuffle-free per-row projection: the log-prob table rides the
  * serialized plan to executors, so it composes into the same fused
  * Project as the other per-doc scores (`t_pipeline` pattern), and
  * selection reuses the [[graft.ml.Splits]] TakeOrderedAndProject
  * top-k (never a full sort).
  */
object NgramLm {

  /** A fitted hashed-ngram model: `logProbs(b)` = log₂ of the
    * add-alpha-smoothed probability of bucket b. Plain data — ships
    * inside expressions; `grams` is the total gram mass it was fit on.
    */
  case class Model(n: Int, buckets: Int, alpha: Double,
                   logProbs: Array[Double], grams: Long)

  /** Hashed n-gram bucket ids of `textCol` (with repetition) —
    * the featurizer both gates share.
    */
  def ngramBuckets(text: Column, n: Int = 2, buckets: Int = 1 << 16): Column =
    Bridge.column(NgramBuckets(Bridge.expression(text), n, buckets))

  /** struct<sum, grams>: Σ weights(bucket) over `text`'s n-grams. */
  private def score(text: Column, weights: Array[Double], n: Int,
                    buckets: Int): Column =
    Bridge.column(NgramScore(Bridge.expression(text), weights, n, buckets))

  /** Fit the bucket distribution of `textCol` over `docs` with
    * add-alpha smoothing: p(b) = (c_b + alpha) / (total + alpha·B).
    * One bounded-width shuffle + one ≤ `buckets`-row collect (see the
    * object scaladoc); `docs` is typically the TARGET (trusted) corpus,
    * which in curation practice is the small side.
    */
  def fit(docs: DataFrame, textCol: String, n: Int = 2,
          buckets: Int = 1 << 16, alpha: Double = 0.1): Model = {
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    // the fitted table is driver-collected and then ships INSIDE the
    // scoring expression to every task (that locality is what lets the
    // score ride the fused pipeline Project with zero shuffle): 2^22
    // buckets = a 32 MB double table, the same order as Spark's default
    // broadcast budget — beyond that the "bounded collect" stops being
    // bounded in any useful sense (a 2^24+ caller would get a
    // multi-hundred-MB driver array and per-task serialization with no
    // warning). Hashed-ngram curation models use 2^16..2^20 in practice
    // (DSIR's paper setting is 2^16).
    require(buckets >= 1 && buckets <= (1 << 22),
      s"buckets must be in [1, 2^22] (the model table is driver-collected " +
        s"and ships with the scoring expression); got $buckets")
    val counts = docs
      .select(explode(ngramBuckets(col(textCol), n, buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect()
    val c = new Array[Long](buckets)
    var total = 0L
    counts.foreach { r =>
      val cnt = r.getLong(1)
      c(r.getInt(0)) = cnt
      total += cnt
    }
    val denom = total + alpha * buckets
    val lp = Array.tabulate(buckets)(b =>
      math.log((c(b) + alpha) / denom) / math.log(2.0))
    Model(n, buckets, alpha, lp, total)
  }

  /** Cross-entropy of `text` under `model` as a column: −(1/m) Σ log₂
    * p(bucket_i) — bits per n-gram; null when the document has no
    * n-grams (no tokens) rather than a fake 0.0 ("0 bits" would read as
    * a perfect score). A plain projection, so it composes into a fused
    * kernel Project ([[CorpusPipeline.clean]]'s LM gate); the repeated
    * score subtree is shared by subexpression elimination.
    */
  def bits(text: Column, model: Model): Column = {
    val s = score(text, model.logProbs, model.n, model.buckets)
    when(s.getField("grams") > 0, -s.getField("sum") / s.getField("grams"))
  }

  /** [[bits]] over a frame: `docs` plus the score as `outCol`. */
  def crossEntropy(docs: DataFrame, textCol: String, model: Model,
                   outCol: String = "bits"): DataFrame = {
    require(!docs.columns.contains(outCol),
      s"crossEntropy output column '$outCol' already exists — " +
        "drop it or pass a different outCol")
    docs.withColumn(outCol, bits(col(textCol), model))
  }

  /** DSIR log importance weight of every document: `outCol` =
    * Σ_grams (ln p_target(b) − ln p_raw(b)) — the paper's importance
    * weight on hashed n-gram counts, in log space (the raw weight
    * overflows double for long documents; every consumer — ranking,
    * Gumbel-top-k sampling — works on the log). NATURAL log, because
    * that is what [[graft.ml.Splits.sampleLogWeighted]]'s Gumbel key
    * exponentiates: a base-2 log here would sample ∝ w^(1/ln 2) ≈
    * w^1.44 instead of ∝ w (the model's log₂ tables are rescaled by
    * ln 2 — NgramLmSpec pins the base). Null when the document has no
    * n-grams. Both models must share one feature space. Shuffle-free.
    */
  def importanceWeights(docs: DataFrame, textCol: String, target: Model,
                        raw: Model, outCol: String = "log_w"): DataFrame = {
    require(target.n == raw.n && target.buckets == raw.buckets,
      s"models disagree on the feature space: n ${target.n}/${raw.n}, " +
        s"buckets ${target.buckets}/${raw.buckets}")
    // withColumn silently REPLACES an existing column of the same name —
    // reject reserved/output collisions up front (the LineDedup/Packing/
    // Semantic convention; round-11 ADVICE)
    require(!docs.columns.contains("__lm"),
      "column name '__lm' is reserved by importanceWeights — rename it first")
    require(!docs.columns.contains(outCol),
      s"importanceWeights output column '$outCol' already exists — " +
        "drop it or pass a different outCol")
    val ln2 = math.log(2.0)
    val diff = Array.tabulate(target.buckets)(b =>
      (target.logProbs(b) - raw.logProbs(b)) * ln2)
    val s = score(col(textCol), diff, target.n, target.buckets)
    docs.withColumn("__lm", s)
      .withColumn(outCol, when(col("__lm.grams") > 0, col("__lm.sum")))
      .drop("__lm")
  }

  /** DSIR selection: importance-weight `docs` against target/raw and
    * draw `k` documents without replacement with probability ∝ weight
    * ([[graft.ml.Splits.sampleLogWeighted]] — Gumbel-top-k on the log
    * weight, the paper's §3.2 resample). Documents with no n-grams are
    * excluded (no weight). Returns the sampled rows with the log
    * weight attached.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 target: Model, raw: Model, k: Int, seed: Long = 0L,
                 outCol: String = "log_w"): DataFrame =
    graft.ml.Splits.sampleLogWeighted(
      importanceWeights(docs, textCol, target, raw, outCol),
      idCol, outCol, k, seed)
}
