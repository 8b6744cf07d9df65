package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeWeighted
import graft.taq.Taq
import graft.text.DocStore

class TaqSpec extends SparkSpec {
  import spark.implicits._

  test("time-weighted bins split spans across bin boundaries exactly") {
    // one key; bin width 100; events at t=0 (v=10) and t=250 (v=20), end 400
    // bins: [0,100): v10 w100 | [100,200): v10 w100 | [200,300): v10 w50 + v20 w50
    //       [300,400): v20 w100
    val df = Seq((1, 0L, 1L, 10.0), (1, 250L, 2L, 20.0))
      .toDF("k", "us", "seq", "v")
    val out = TimeWeighted.bins(df, Seq("k"), "us", "seq", Seq("v"), 100L, 400L)
      .select(col("bin_us"), col("tw_v"), col("covered_us"))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L) == ((10.0, 100L)))
    assert(out(100L) == ((10.0, 100L)))
    assert(math.abs(out(200L)._1 - 15.0) < 1e-12 && out(200L)._2 == 100L)
    assert(out(300L) == ((20.0, 100L)))
  }

  test("quote cleaning drops crossed/oversized/unchanged quotes") {
    val q = Seq(
      ("A", 1L, 1L, 10.0, 10.2, 5.0, 5.0),   // ok
      ("A", 2L, 2L, 10.3, 10.1, 5.0, 5.0),   // crossed: ask < bid
      ("A", 3L, 3L, 10.0, 16.0, 5.0, 5.0),   // spread > 5
      ("A", 4L, 4L, 10.0, 10.2, 5.0, 5.0),   // unchanged vs t=1 -> dropped
      ("A", 5L, 5L, 10.0, 10.4, 5.0, 5.0)    // changed -> kept
    ).toDF("symbol", "ts", "seqno", "bid", "ask", "bidsize", "asksize")
    val kept = Taq.cleanQuotes(q).select("ts").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
  }

  test("trade cleaning: reference condition set, null conds kept") {
    val t = Seq(
      ("A", 1L, 1L, 10.0, 10L, 0, null.asInstanceOf[String]), // null cond kept
      ("A", 2L, 2L, 10.0, 10L, 0, "T"),  // extended hours excluded (ref set)
      ("A", 3L, 3L, 10.0, 10L, 0, "@"),  // regular kept
      ("A", 4L, 4L, 10.0, 10L, 1, "@"),  // corrected dropped
      ("A", 5L, 5L, 10.0, 10L, 0, "4")   // derivatively priced dropped
    ).toDF("symbol", "us", "seqno", "price", "volume", "corr", "cond")
    val kept = Taq.cleanTrades(t).select("us").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("Lee-Ready alignment: midquote test with tick-test fallback") {
    val trades = Seq(
      ("A", 100L, 1L, 10.30, 10L, 0),  // above prevailing mid 10.25 -> +1
      ("A", 200L, 2L, 10.20, 10L, 0),  // below mid -> -1
      ("A", 300L, 3L, 10.25, 10L, 0)   // at mid -> tick test: 10.25 > 10.20 -> +1
    ).toDF("symbol", "us", "seqno", "price", "volume", "corr")
    val quotes = Seq(("A", 50L, 1L, 10.20, 10.30, 1.0, 1.0))
      .toDF("symbol", "us", "seqno", "bid", "ask", "bidsize", "asksize")
    val out = Taq.alignTrades(trades, quotes, fwdUs = 1000L)
      .select("us", "sign").as[(Long, Double)].collect().toMap
    assert(out(100L) == 1.0 && out(200L) == -1.0 && out(300L) == 1.0)
  }

  test("trade bins: vwap and first/last by time") {
    val aligned = Seq(
      ("A", 10L, 1L, 10.0, 100L, 0, 10.25, 1.0),
      ("A", 20L, 2L, 11.0, 300L, 0, 10.25, 1.0),
      ("A", 120L, 3L, 12.0, 100L, 0, 10.25, 1.0)
    ).toDF("symbol", "us", "seqno", "price", "volume", "corr", "prev_mid", "sign")
    val out = Taq.binTrades(aligned, 100L)
      .select("bin_us", "volume", "vwap", "first_price", "last_price")
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == 400L)
    assert(math.abs(out(0L)._3 - (10.0 * 100 + 11.0 * 300) / 400) < 1e-12)
    assert(out(0L)._4 == 10.0 && out(0L)._5 == 11.0)
    assert(out(100L)._4 == 12.0)
  }

  test("trade bins: same-microsecond trades tie-break on seqno") {
    // two trades share us=10 — first/last must follow seqno, not an
    // arbitrary pick among the tied rows
    val aligned = Seq(
      ("A", 10L, 2L, 11.0, 100L, 0, 10.25, 1.0),
      ("A", 10L, 1L, 10.0, 100L, 0, 10.25, 1.0),
      ("A", 20L, 3L, 12.0, 100L, 0, 10.25, 1.0)
    ).toDF("symbol", "us", "seqno", "price", "volume", "corr", "prev_mid", "sign")
    val out = Taq.binTrades(aligned.repartition(4), 100L)
      .select("first_price", "last_price").as[(Double, Double)].collect().head
    assert(out == ((10.0, 12.0)), s"got $out")
  }
}

class DocStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", 100, "a"), (2L, "es", 200, "b"), (3L, "en", 300, "a"), (4L, "de", 50, "c")
  ).toDF("doc_id", "lang", "n_chars", "source")

  test("where-DSL compiles ops to predicates") {
    val got = DocStore.select(docs, Map(
        "lang" -> Map("_in" -> Seq("en", "es")),
        "n_chars" -> Map("_ge" -> 150),
        "source" -> Map("_ne" -> "b")))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
    val eq = DocStore.select(docs, Map("lang" -> "de"))
      .select("doc_id").as[Long].collect().toSet
    assert(eq == Set(4L))
  }

  test("upsert replaces by key, delete inverts the predicate") {
    val incoming = Seq((3L, "fr", 999, "z"), (9L, "zh", 1, "q"))
      .toDF("doc_id", "lang", "n_chars", "source")
    val up = DocStore.upsert(docs, incoming, "doc_id")
    assert(up.count() == 5)
    assert(up.where(col("doc_id") === 3L).select("lang").as[String].head() == "fr")
    val del = DocStore.delete(docs, Map("lang" -> "en"))
    assert(del.select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
  }
}
