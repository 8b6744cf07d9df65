package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TimeWeighted
import graft.text.DocStore
import QHelp._

/** Third coverage batch: time-weighted bins (A8 — the bin_quotes
  * semantics) and the document-store where-DSL (S6).
  */
object Batch3 {

  val qs: Seq[Q] = Seq(

    // A8: time-weighted tumbling bins — each event's value holds until
    // the user's next event; weight in a 6h bin = interval overlap,
    // spanning bins exactly like the reference's reindex-onto-bin-edges
    // forward fill (taq.py:417-491).
    Q("a8_timeweighted", (s, dir) => {
      val binUs = 21600000000L           // 6h
      val endUs = 1706659200000000L      // 2024-01-31T00:00:00Z, past max ts
      val e = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id").as("seqno"), col("value"))
      TimeWeighted.bins(e, Seq("user_id"), "us", "seqno", Seq("value"), binUs, endUs)
        .select(bi(col("user_id")).as("user_id"), bi(col("bin_us")).as("bin_us"),
          r6(col("tw_value")).as("tw_value"),
          bi(col("covered_us")).as("covered_us"),
          bi(col("n_spans")).as("n_spans"))
    }, Some("""
      WITH q AS (
        SELECT user_id, epoch_us(ts) AS us, event_id, value,
               coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        1706659200000000) AS next_us
        FROM events
      ), sp AS (
        SELECT * FROM q WHERE next_us > us
      ), ex AS (
        SELECT user_id, value, us, next_us,
               unnest(generate_series(us - us % 21600000000,
                                      (next_us - 1) - (next_us - 1) % 21600000000,
                                      21600000000)) AS bin_us
        FROM sp
      )
      SELECT CAST(user_id AS BIGINT) AS user_id, CAST(bin_us AS BIGINT) AS bin_us,
             ROUND(SUM(value * (least(next_us, bin_us + 21600000000) - greatest(us, bin_us)))
                 / SUM(least(next_us, bin_us + 21600000000) - greatest(us, bin_us)), 6) AS tw_value,
             CAST(SUM(least(next_us, bin_us + 21600000000) - greatest(us, bin_us)) AS BIGINT) AS covered_us,
             COUNT(*) AS n_spans
      FROM ex GROUP BY 1, 2""")),

    // S6: document-store where-DSL compiled to Column predicates
    // (mongodb.py:11-48 parse_where).
    Q("s6_docselect", (s, dir) => {
      DocStore.select(Tables.documents(s, dir), Map(
          "lang" -> Map("_in" -> Seq("en", "es")),
          "n_chars" -> Map("_ge" -> 300),
          "source" -> Map("_ne" -> "src0")))
        .select(bi(col("doc_id")).as("doc_id"), col("lang"),
          bi(col("n_chars")).as("n_chars"), col("source"))
    }, Some("""
      SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, source
      FROM documents
      WHERE lang IN ('en', 'es') AND n_chars >= 300 AND source <> 'src0'"""))
  )
}
