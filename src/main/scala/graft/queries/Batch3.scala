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
      WHERE lang IN ('en', 'es') AND n_chars >= 300 AND source <> 'src0'""")),

    // S3: dup-key merge write (INSERT-or-replace, sql.py:251-266 /
    // unstructured.py upsert) — incoming docs replace same-key rows via
    // anti-join + union; replays as two UNION ALL branches.
    Q("s3_upsert", (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val incoming = d.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit("upserted").as("source"),
          (col("n_chars") + 1).as("n_chars"))
      DocStore.upsert(d, incoming, "doc_id")
        .select(bi(col("doc_id")).as("doc_id"), col("source"),
          bi(col("n_chars")).as("n_chars"))
    }, Some("""
      SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT CAST(doc_id AS BIGINT), 'upserted', CAST(n_chars + 1 AS BIGINT)
      FROM documents WHERE doc_id % 7 = 0""")),

    // P5: trade cleaning (clean_trades taq.py:330-340) on a TAQ-shaped
    // frame synthesized from events — positive price/volume, corr = 0,
    // condition code not in the excluded set (nulls pass).
    Q("p5_clean", (s, dir) => {
      val e = Tables.events(s, dir)
      val trades = e.select(
        concat(lit("S"), (col("user_id") % 5)).as("symbol"),
        col("event_id"), col("value").as("price"),
        (col("event_id") % 100 - 5).as("volume"),
        (col("event_id") % 3).as("corr"),
        element_at(array(lit("@"), lit("A"), lit("M"), lit("O"), lit(null)),
          (col("event_id") % 5 + 1).cast("int")).as("cond"))
      graft.taq.Taq.cleanTrades(trades)
        .select(col("symbol"), bi(col("event_id")).as("event_id"),
          col("price"), bi(col("volume")).as("volume"), col("cond"))
    }, Some("""
      WITH t AS (
        SELECT 'S' || CAST(user_id % 5 AS VARCHAR) AS symbol, event_id,
               value AS price, event_id % 100 - 5 AS volume, event_id % 3 AS corr,
               (['@', 'A', 'M', 'O', NULL])[event_id % 5 + 1] AS cond
        FROM events
      )
      SELECT symbol, CAST(event_id AS BIGINT) AS event_id, price,
             CAST(volume AS BIGINT) AS volume, cond
      FROM t
      WHERE price > 0 AND volume > 0 AND corr = 0
        AND (cond IS NULL OR NOT regexp_matches(cond, '[MOZBTLGWJK145789]'))""")),

    // P6: NBBO quote cleaning (clean_nbbo taq.py:342-380) — positive
    // prices/sizes, ask > bid, spread cap, best-sequence per timestamp,
    // unchanged consecutive quotes dropped; windowed replay in DuckDB.
    Q("p6_quotes", (s, dir) => {
      val e = Tables.events(s, dir)
      val quotes = e.select(
        concat(lit("S"), (col("user_id") % 5)).as("symbol"),
        unix_micros(col("ts")).as("ts"), col("event_id").as("seqno"),
        col("value").as("bid"),
        (col("value") + (col("event_id") % 14) / 2.0 - 1.0).as("ask"),
        (col("event_id") % 50 - 2).as("bidsize"),
        (col("event_id") % 30 + 1).as("asksize"))
      graft.taq.Taq.cleanQuotes(quotes, maxSpread = 5.0)
        .select(col("symbol"), bi(col("ts")).as("ts"), bi(col("seqno")).as("seqno"),
          col("bid"), r6(col("ask")).as("ask"),
          bi(col("bidsize")).as("bidsize"), bi(col("asksize")).as("asksize"))
    }, Some("""
      WITH q0 AS (
        SELECT 'S' || CAST(user_id % 5 AS VARCHAR) AS symbol,
               epoch_us(ts) AS ts, event_id AS seqno,
               value AS bid, value + (event_id % 14) / 2.0 - 1.0 AS ask,
               event_id % 50 - 2 AS bidsize, event_id % 30 + 1 AS asksize
        FROM events
      ), base AS (
        SELECT * FROM q0
        WHERE bid > 0 AND ask > 0 AND bidsize > 0 AND asksize > 0
          AND ask > bid AND ask - bid <= 5.0
      ), best AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY symbol, ts ORDER BY seqno DESC) AS rn
          FROM base) WHERE rn = 1
      ), chg AS (
        SELECT *,
               (lag(bid) OVER w IS NULL OR lag(bid) OVER w <> bid
                OR lag(ask) OVER w <> ask OR lag(bidsize) OVER w <> bidsize
                OR lag(asksize) OVER w <> asksize) AS c
        FROM best WINDOW w AS (PARTITION BY symbol ORDER BY ts, seqno)
      )
      SELECT symbol, CAST(ts AS BIGINT) AS ts, CAST(seqno AS BIGINT) AS seqno,
             bid, ROUND(ask, 6) AS ask,
             CAST(bidsize AS BIGINT) AS bidsize, CAST(asksize AS BIGINT) AS asksize
      FROM chg WHERE c""")),

    // J3: as-of LINK join with the linkdt = 0 "always valid" sentinel
    // (structured.py:274-328, pstat.py:449-455): every odd custkey has
    // only the sentinel link; even custkeys gain a dated link that
    // prevails from 1997-01-01 on.
    Q("j3_sentinel", (s, dir) => {
      val o = Tables.orders(s, dir)
      val fact = o.select(col("o_orderkey"), col("o_custkey").as("key"),
        (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
          dayofmonth(col("o_orderdate"))).as("fdate"))
      val keys = Tables.customer(s, dir).select(col("c_custkey").as("key"))
      val links = keys.select(col("key"), lit(0).as("linkdt"),
          (col("key") * 10).as("gvkey"))
        .unionByName(keys.where(col("key") % 2 === 0)
          .select(col("key"), lit(19970101).as("linkdt"),
            (col("key") * 10 + 1).as("gvkey")))
      graft.ops.AsOf.linkJoin(fact, links, key = "key",
          factDate = "fdate", linkDate = "linkdt", linkCols = Seq("gvkey"))
        .select(bi(col("o_orderkey")).as("o_orderkey"), bi(col("key")).as("key"),
          bi(col("fdate")).as("fdate"), bi(col("gvkey")).as("gvkey"))
    }, Some("""
      WITH fact AS (
        SELECT o_orderkey, o_custkey AS key,
               year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS fdate
        FROM orders
      ), links AS (
        SELECT c_custkey AS key, 0 AS linkdt, c_custkey * 10 AS gvkey FROM customer
        UNION ALL
        SELECT c_custkey, 19970101, c_custkey * 10 + 1 FROM customer WHERE c_custkey % 2 = 0
      )
      SELECT CAST(f.o_orderkey AS BIGINT) AS o_orderkey, CAST(f.key AS BIGINT) AS key,
             CAST(f.fdate AS BIGINT) AS fdate, CAST(l.gvkey AS BIGINT) AS gvkey
      FROM fact f LEFT JOIN links l
        ON l.key = f.key
       AND l.linkdt = (SELECT MAX(x.linkdt) FROM links x
                       WHERE x.key = f.key AND x.linkdt <= f.fdate)"""))
  )
}
