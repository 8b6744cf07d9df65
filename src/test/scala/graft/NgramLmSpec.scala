package graft

import org.apache.spark.sql.functions._
import graft.text.NgramLm
import graft.ml.Splits

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // --- local twin of the kernel's feature walk (whitespace tokens,
  // ASCII-lowercase, dual-prime token hash, FNV k-gram roll, avalanche
  // bucket fold) for the differential tests ---
  private val FNV = 1099511628211L
  private def tokHash(tok: String): Long = {
    var h1 = 0L; var h2 = 0L
    tok.getBytes("UTF-8").foreach { bb =>
      var b = bb & 0xff
      if (b >= 'A' && b <= 'Z') b += 32
      h1 = (h1 * 31 + b) % 1000000007L
      h2 = (h2 * 131 + b) % 998244353L
    }
    h1 * 2147483648L + h2
  }
  private def localBuckets(text: String, n: Int, buckets: Int): Seq[Int] = {
    val toks = text.split("\\s+").filter(_.nonEmpty).map(tokHash)
    val grams = (1 to n).flatMap(k => toks.sliding(k).filter(_.length == k)
      .map(_.reduceLeft((a, h) => a * FNV ^ h)))
    grams.map(h => java.lang.Long.hashCode(h * -7046029254386353131L) & (buckets - 1))
  }

  private val english = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine every single day",
    "all that glitters is not gold said the poet",
    "the early bird catches the worm in the garden",
    "actions speak louder than words in the long run")
  private val gibberish = "zq xv jkl wpf qqq zzx vnm plk ghw zzq xxj"

  private def docsDf = english.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("ngramBuckets matches the local twin (incl. unicode and edge tokens)") {
    val texts = Seq("The quick  brown\tfox", "one", "", "  \n ",
      "中文 mixed ASCII tokens", "a b c d e",
      "vertical\u000btab and\u000cform feed split tokens")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val got = df.select(col("id"),
        NgramLm.ngramBuckets(col("t"), n = 2, buckets = 1 << 10).as("b"))
      .as[(Int, Seq[Int])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i).sorted == localBuckets(t, 2, 1 << 10).sorted, s"text: '$t'")
    }
  }

  test("fit + score agree across the two kernel paths (Σ doc sums = Σ bucket counts · logp)") {
    val model = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 12)
    // total log-likelihood via the score kernel
    val viaScore = NgramLm.crossEntropy(docsDf, "text", model)
      .select(sum(-col("bits") * size(NgramLm.ngramBuckets(col("text"), 2, 1 << 12))))
      .as[Double].head()
    // ... and via the featurizer + driver-side table
    val viaCounts = docsDf
      .select(explode(NgramLm.ngramBuckets(col("text"), 2, 1 << 12)).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect()
      .map { case (b, c) => c * model.logProbs(b) }.sum
    assert(math.abs(viaScore - viaCounts) < 1e-6, s"$viaScore vs $viaCounts")
    // gram mass accounted: model.grams = all grams of the fit corpus
    val grams = english.map(t => localBuckets(t, 2, 1 << 12).size).sum
    assert(model.grams == grams)
  }

  test("cross-entropy separates in-distribution text from gibberish; no-gram docs are null") {
    val model = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 12)
    val scored = NgramLm.crossEntropy(
      Seq((1L, english.head), (2L, gibberish), (3L, ""), (4L, null: String))
        .toDF("doc_id", "text"), "text", model)
      .select("doc_id", "bits").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(scored(1L).get < scored(2L).get,
      s"in-distribution ${scored(1L)} should beat gibberish ${scored(2L)}")
    assert(scored(3L).isEmpty && scored(4L).isEmpty)
  }

  test("DSIR importance weights rank target-like docs above out-of-distribution docs") {
    val target = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 12)
    val rawCorpus = (english ++ Seq(gibberish, gibberish + " extra zz qq",
        "xjq wvv kkz pqr mnb vvx zzl")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val raw = NgramLm.fit(rawCorpus, "text", n = 2, buckets = 1 << 12)
    val w = NgramLm.importanceWeights(rawCorpus, "text", target, raw)
      .select("doc_id", "log_w").as[(Long, Double)].collect().toMap
    val engIds = english.indices.map(_.toLong)
    val gibIds = Seq(5L, 6L, 7L)
    assert(engIds.map(w).min > gibIds.map(w).max,
      s"english ${engIds.map(w)} vs gibberish ${gibIds.map(w)}")
    // the log weight is in NATURAL log — what sampleLogWeighted's Gumbel
    // key exponentiates (a base-2 weight would sample ∝ w^1.44, not ∝ w):
    // log_w(doc) = ln2 · Σ_grams (log₂ p_target(b) − log₂ p_raw(b))
    val want = localBuckets(english.head, 2, 1 << 12)
      .map(b => (target.logProbs(b) - raw.logProbs(b)) * math.log(2.0)).sum
    assert(math.abs(w(0L) - want) < 1e-9, s"${w(0L)} vs $want")
    // dsirSelect: the k = |english| draw is dominated by target-like docs
    val picked = NgramLm.dsirSelect(rawCorpus, "doc_id", "text", target, raw,
      k = english.size, seed = 3L).select("doc_id").as[Long].collect().toSet
    assert(gibIds.count(picked) <= 1, s"picked $picked")
    // deterministic and layout-independent
    val again = NgramLm.dsirSelect(rawCorpus.repartition(7), "doc_id", "text",
      target, raw, k = english.size, seed = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == picked)
  }

  test("scoring is a shuffle-free projection; fit aggregates map-side before one exchange") {
    val model = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 12)
    val scorePlan = NgramLm.crossEntropy(docsDf, "text", model)
      .queryExecution.executedPlan.toString
    assert(!scorePlan.contains("Exchange"), scorePlan)
    val fitPlan = docsDf
      .select(explode(NgramLm.ngramBuckets(col("text"), 2, 1 << 12)).as("b"))
      .groupBy("b").agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(fitPlan.contains("partial_count"), fitPlan) // map-side combine
    assert("Exchange".r.findAllIn(fitPlan).size == 1, fitPlan)
  }

  test("feature-space and argument validation") {
    val m1 = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 12)
    val m2 = NgramLm.fit(docsDf, "text", n = 3, buckets = 1 << 12)
    val m3 = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 10)
    intercept[IllegalArgumentException](
      NgramLm.importanceWeights(docsDf, "text", m1, m2))
    intercept[IllegalArgumentException](
      NgramLm.importanceWeights(docsDf, "text", m1, m3))
    intercept[IllegalArgumentException](
      NgramLm.fit(docsDf, "text", buckets = 1000)) // not a power of two
    intercept[IllegalArgumentException](
      NgramLm.fit(docsDf, "text", alpha = 0.0))
    intercept[IllegalArgumentException](
      NgramLm.fit(docsDf, "text", n = 0))
    // the fitted table is driver-collected and ships inside the scoring
    // expression — beyond 2^22 the "bounded collect" stops being bounded
    intercept[IllegalArgumentException](
      NgramLm.fit(docsDf, "text", buckets = 1 << 23))
    // withColumn silently replaces same-named columns — collisions with
    // the temp/output names are rejected up front (r11 ADVICE)
    val m = NgramLm.fit(docsDf, "text", n = 2, buckets = 1 << 12)
    intercept[IllegalArgumentException](
      NgramLm.importanceWeights(docsDf.withColumn("__lm", lit(1)), "text", m, m))
    intercept[IllegalArgumentException](
      NgramLm.importanceWeights(docsDf.withColumn("log_w", lit(1.0)), "text", m, m))
    intercept[IllegalArgumentException](
      NgramLm.crossEntropy(docsDf.withColumn("bits", lit(1.0)), "text", m))
  }

  test("sampleLogWeighted selects the same rows as sampleWeighted at the same seed") {
    val rows = (1L to 200L).map(i => (i, 0.5 + (i % 17) * 0.3)).toDF("id", "w")
      .withColumn("lw", log(col("w")))
    for (seed <- Seq(0L, 7L, 99L)) {
      val lin = Splits.sampleWeighted(rows, "id", "w", k = 20, seed = seed)
        .select("id").as[Long].collect().toSet
      val logd = Splits.sampleLogWeighted(rows, "id", "lw", k = 20, seed = seed)
        .select("id").as[Long].collect().toSet
      assert(lin == logd, s"seed $seed")
    }
  }

  test("sampleLogWeighted excludes null/NaN/infinite log weights") {
    val rows = Seq((1L, Some(0.0)), (2L, Some(Double.NaN)),
      (3L, Some(Double.NegativeInfinity)), (4L, Some(Double.PositiveInfinity)),
      (5L, Some(-1e300)), (6L, None: Option[Double])).toDF("id", "lw")
    val got = Splits.sampleLogWeighted(rows, "id", "lw", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 5L), s"got $got")
  }
}
