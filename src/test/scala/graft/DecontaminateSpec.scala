package graft

import org.apache.spark.sql.functions._
import graft.text.Decontaminate

/** Benchmark decontamination: planted eval leakage must be flagged and
  * removed, clean documents kept, and the membership test must be a
  * broadcast join (corpus rows never shuffled for it).
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchSentence =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val benchmark = Seq(
    (1L, benchSentence),
    (2L, "all happy families are alike every unhappy family is unhappy in its own way"),
    (3L, "the train travels 450 km in 9 hours before reaching the central station platform")
  ).toDF("qid", "question")

  private def corpus = Seq(
    // verbatim leak: contains the benchmark sentence inside padding
    (10L, s"some leading words then $benchSentence and some trailing words here"),
    // clean document, same vocabulary register but no shared 8-gram
    (11L, "a slow red fox walks under a busy dog far from any river bank at dawn"),
    // partial leak: shares a few 8-grams of the second benchmark row
    (12L, "all happy families are alike every unhappy family goes its separate way entirely"),
    // too short to form one 8-gram: must simply be kept
    (13L, "tiny doc"),
    // numbers COUNT as tokens: differing numerics break every 8-gram of
    // benchmark row 3, so this must NOT be flagged (the letters-only
    // tokenizer would have read it as 100% identical)
    (14L, "the train travels 120 km in 2 hours before reaching the central station platform"),
    // ...while a verbatim numeric leak of row 3 IS caught
    (15L, "note that the train travels 450 km in 9 hours before reaching the central station platform indeed")
  ).toDF("id", "text")

  test("verbatim leakage is flagged with high overlap and removed") {
    val rep = Decontaminate.report(corpus, "id", "text", benchmark, "question")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("overlap")).toMap
    assert(rep.contains(10L) && rep(10L) > 0.3, s"got $rep")
    assert(rep.contains(12L) && rep(12L) > 0.0 && rep(12L) < rep(10L))
    assert(rep.contains(15L) && rep(15L) > 0.3) // numeric leak caught
    assert(!rep.contains(11L) && !rep.contains(13L))
    assert(!rep.contains(14L), // numeric difference breaks the shingles
      s"doc differing only in numbers was flagged: $rep")

    val cleaned = Decontaminate.decontaminate(
      corpus, "id", "text", benchmark, "question")
    assert(cleaned.select("id").as[Long].collect().sorted.toSeq == Seq(11L, 13L, 14L))
    assert(cleaned.columns.toSeq == corpus.columns.toSeq)
  }

  test("maxOverlap threshold keeps partial overlaps below it") {
    val rep = Decontaminate.report(corpus, "id", "text", benchmark, "question")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("overlap")).toMap
    val thresh = (rep(10L) + rep(12L)) / 2 // between the two overlaps
    val cleaned = Decontaminate.decontaminate(
      corpus, "id", "text", benchmark, "question", maxOverlap = thresh)
    assert(cleaned.select("id").as[Long].collect().sorted.toSeq == Seq(11L, 12L, 13L, 14L))
  }

  test("a bad shingle width fails fast at the API, not per-task") {
    val e = intercept[IllegalArgumentException](
      Decontaminate.report(corpus, "id", "text", benchmark, "question", shingleWidth = 0))
    assert(e.getMessage.contains("shingle width"))
  }

  test("overlap is hits over the doc's own distinct-shingle count") {
    val rep = Decontaminate.report(corpus, "id", "text", benchmark, "question")
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Int]("n_shingles"), r.getAs[Long]("hits"), r.getAs[Double]("overlap")))
    rep.foreach { case (id, n, h, o) =>
      assert(n > 0 && h > 0 && h <= n, s"id=$id")
      assert(math.abs(o - h.toDouble / n) < 1e-12, s"id=$id")
    }
  }

  test("benchReport attributes contamination to the benchmark items that leaked") {
    val rep = Decontaminate.benchReport(corpus, "id", "text", benchmark, "qid", "question")
      .collect().map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Int]("n_grams"), r.getAs[Long]("grams_hit"),
          r.getAs[Double]("coverage"), r.getAs[Long]("n_docs")))).toMap
    // every benchmark row leaked somewhere in this corpus; attribution:
    // row 1 (15 tokens, 8 grams) fully embedded in doc 10; row 2 shares
    // exactly its first 8-gram with doc 12; row 3 (14 tokens, 7 grams)
    // fully embedded in doc 15 (and doc 14's numeric change hits none)
    assert(rep.keySet == Set(1L, 2L, 3L), s"got $rep")
    assert(rep(1L) == ((8, 8L, 1.0, 1L)), s"row1: ${rep(1L)}")
    assert(rep(2L)._1 == 7 && rep(2L)._2 == 1L && rep(2L)._4 == 1L)
    assert(math.abs(rep(2L)._3 - 1.0 / 7) < 1e-12)
    assert(rep(3L) == ((7, 7L, 1.0, 1L)), s"row3: ${rep(3L)}")
    // n_docs counts DISTINCT docs: a second doc leaking row 1 bumps it
    val extra = corpus.union(Seq(
      (16L, s"another page carrying $benchSentence verbatim once more")).toDF("id", "text"))
    val rep2 = Decontaminate.benchReport(extra, "id", "text", benchmark, "qid", "question")
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_docs")).toMap
    assert(rep2(1L) == 2L && rep2(2L) == 1L && rep2(3L) == 1L)
    // plan: benchmark side broadcasts, corpus is never cartesian'd
    val plan = Decontaminate.benchReport(corpus, "id", "text", benchmark, "qid", "question")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("the membership test plans as a broadcast join") {
    val rep = Decontaminate.report(corpus, "id", "text", benchmark, "question")
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
