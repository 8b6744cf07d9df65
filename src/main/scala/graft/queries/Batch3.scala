package graft.queries

import org.apache.spark.sql.functions._
import graft.backtest.Backtesting
import graft.core.Tables
import graft.ops.TimeWeighted
import graft.text.DocStore
import QHelp._

/** Third coverage batch: time-weighted bins (A8 — the bin_quotes
  * semantics), the document-store where-DSL (S6), and the daily drift
  * performance loop (dailyperformance.py) as one plan.
  */
object Batch3 {

  val qs: Seq[Q] = Seq(

    // DailyPerformance (dailyperformance.py:14-47): holdings drift by
    // retx between rebalances; daily portfolio return = sum of drifted
    // weight x ret. Synthetic panel from orders (deterministic decimal
    // sums); two rebalances with different compositions exercise the
    // holdings switch. The windowed drift product replays exactly in
    // DuckDB (same multiply order).
    Q("j14_dailyperf", (s, dir) => {
      import s.implicits._
      val daily = Tables.orders(s, dir)
        .groupBy((col("o_custkey") % 50).as("permno"),
          (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
            dayofmonth(col("o_orderdate"))).as("date"))
        .agg((((dsum(col("o_totalprice")) % 100) / 1000.0) - 0.05).as("ret"))
        .withColumn("retx", col("ret") / 2)
      val h = ((0 until 50 by 5).map(p => (19960101, p, 0.1)) ++
        (0 until 50 by 10).map(p => (19970101, p, 0.2)))
        .toDF("rebaldate", "permno", "weight")
      Backtesting.dailyPerformance(h, daily)
        .select(bi(col("date")).as("date"), r6(col("ret")).as("ret"),
          bi(col("n_holdings")).as("n_holdings"))
    }, Some("""
      WITH daily AS (
        SELECT o_custkey % 50 AS permno,
               year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS date,
               (CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) % 100) / 1000.0 - 0.05 AS ret
        FROM orders GROUP BY 1, 2
      ), d2 AS (
        SELECT date, permno, ret, ret / 2 AS retx FROM daily
      ), h(rebaldate, permno, weight) AS (
        VALUES (19960101, 0, 0.1), (19960101, 5, 0.1), (19960101, 10, 0.1),
               (19960101, 15, 0.1), (19960101, 20, 0.1), (19960101, 25, 0.1),
               (19960101, 30, 0.1), (19960101, 35, 0.1), (19960101, 40, 0.1),
               (19960101, 45, 0.1),
               (19970101, 0, 0.2), (19970101, 10, 0.2), (19970101, 20, 0.2),
               (19970101, 30, 0.2), (19970101, 40, 0.2)
      ), dd AS (
        SELECT d.date, d.permno, d.ret, d.retx, h.rebaldate AS r, h.weight
        FROM d2 d JOIN h ON d.permno = h.permno
          AND h.rebaldate = CASE WHEN d.date > 19970101 THEN 19970101
                                 WHEN d.date > 19960101 THEN 19960101 END
      ), drift AS (
        SELECT date, weight, ret,
               coalesce(product(1.0 + coalesce(retx, 0.0)) OVER (
                 PARTITION BY r, permno ORDER BY date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0) AS dr
        FROM dd
      )
      SELECT CAST(date AS BIGINT) AS date,
             ROUND(sum(weight * dr * coalesce(ret, 0.0)), 6) AS ret,
             COUNT(*) AS n_holdings
      FROM drift GROUP BY 1""")),

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
