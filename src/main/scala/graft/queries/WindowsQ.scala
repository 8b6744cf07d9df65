package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{DateInt, Tables}
import graft.ops.{Dedup, Fractiles, WindowOps}
import QHelp._

/** Window-family queries (SURVEY.md §2.5) plus int-date/string scalar
  * functions (§2.7 F1/F4). Running sums/products along a fully-ordered
  * window are computed sequentially by both engines → bit-identical.
  */
object WindowsQ {

  val qs: Seq[Q] = Seq(

    // W1: prevailing row per key at an as-of date (get_section stocks.py:394-406)
    // — THE load-bearing window of the reference.
    Q("w1_prevailing", (s, dir) => {
      val o = Tables.orders(s, dir).where(col("o_orderdate") <= ts("1997-06-30"))
      Dedup.keepLast(o, Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
        .select(bi(col("o_custkey")).as("o_custkey"),
          bi(col("o_orderkey")).as("o_orderkey"),
          bi(DateInt.fromTimestamp(col("o_orderdate"))).as("odate"),
          col("o_totalprice"))
    }, Some("""
      SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
             CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS BIGINT) AS odate,
             o_totalprice
      FROM orders WHERE o_orderdate <= TIMESTAMP '1997-06-30'
      QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""")),

    // W2: dedup keep-last after sort (sql.py:49-52). The synthetic lineitem
    // has duplicate (orderkey, linenumber) pairs, so the sort key includes
    // enough columns to be a deterministic total order.
    Q("w2_dedup", (s, dir) => {
      Dedup.keepLast(Tables.lineitem(s, dir), Seq("l_orderkey"),
          Seq(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))
        .select(bi(col("l_orderkey")).as("l_orderkey"),
          bi(col("l_linenumber")).as("l_linenumber"),
          col("l_quantity"))
    }, Some("""
      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_quantity
      FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) = 1""")),

    // W3: cumulative sum along event order (eventstudy.py:120-122).
    Q("w3_cumsum", (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          bi(row_number().over(w)).as("cum_n"),
          r6(WindowOps.cumSum(col("o_totalprice"), w)).as("cum_spend"))
    }, Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(row_number() OVER w AS BIGINT) AS cum_n,
             ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // W4: running max / maximum drawdown (finance.py:286-307).
    Q("w4_drawdown", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val e = Tables.events(s, dir)
        .withColumn("cum", WindowOps.cumSum(col("value"), w))
        .withColumn("runmax", WindowOps.runningMax(col("cum"), w))
      e.groupBy("user_id")
        .agg(r6(max(col("runmax") - col("cum"))).as("max_dd"),
          bi(count(lit(1))).as("n"))
        .select(bi(col("user_id")).as("user_id"), col("max_dd"), col("n"))
    }, Some("""
      WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM events
      ), y AS (
        SELECT user_id, cum,
               MAX(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        FROM x
      )
      SELECT CAST(user_id AS BIGINT) AS user_id,
             ROUND(MAX(runmax - cum), 6) AS max_dd,
             COUNT(*) AS n
      FROM y GROUP BY 1""")),

    // W5: lag/diff/pct-change transform chain (Alfred.transform alfred.py:205-242).
    Q("w5_lag", (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          r6(WindowOps.pctChange(col("o_totalprice"), 1, w)).as("pct_chg"),
          r6(WindowOps.diffK(col("o_totalprice"), 1, w)).as("diff1"))
    }, Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             lag(o_totalprice, 1) OVER w AS prev_price,
             ROUND(o_totalprice / lag(o_totalprice, 1) OVER w - 1.0, 6) AS pct_chg,
             ROUND(o_totalprice - lag(o_totalprice, 1) OVER w, 6) AS diff1
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // W6: gaps-and-islands run grouping (Alfred.date_spans alfred.py:244-259).
    Q("w6_islands", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("island", WindowOps.islandId(col("event_type"), w))
        .groupBy("user_id", "island")
        .agg(min(col("event_type")).as("etype"),
          bi(count(lit(1))).as("n"),
          bi(min(unix_micros(col("ts")))).as("beg_us"),
          bi(max(unix_micros(col("ts")))).as("end_us"))
        .select(bi(col("user_id")).as("user_id"), bi(col("island")).as("island"),
          col("etype"), col("n"), col("beg_us"), col("end_us"))
    }, Some("""
      WITH x AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               CASE WHEN lag(event_type) OVER w IS NULL OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), y AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM x
      )
      SELECT CAST(user_id AS BIGINT) AS user_id, CAST(island AS BIGINT) AS island,
             MIN(event_type) AS etype, COUNT(*) AS n, MIN(us) AS beg_us, MAX(us) AS end_us
      FROM y GROUP BY 1, 2""")),

    // W9: forward-fill of sparse values (taq.py:556, real_time.py:88).
    Q("w9_ffill", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(bi(col("event_id")).as("event_id"),
          WindowOps.ffill(when(col("event_type") === "purchase", col("value")), w)
            .as("last_purchase"))
    }, Some("""
      SELECT CAST(event_id AS BIGINT) AS event_id,
             last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
      FROM events""")),

    // W10: reverse cumulative product — split back-adjustment (real_time.py:71-80).
    Q("w10_revcumprod", (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val factor = lit(1.0) + col("o_totalprice") / lit(1.0e7)
      Tables.orders(s, dir)
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          r6(WindowOps.reverseCumProdAfter(factor, w)).as("adj"))
    }, Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             ROUND(COALESCE(product(1.0 + o_totalprice / 10000000.0)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 1.0), 6) AS adj
      FROM orders""")),

    // W12: release sequence numbering (alfred.py:388-393).
    Q("w12_release", (s, dir) => {
      val w = Window.partitionBy("o_orderdate").orderBy("o_orderkey")
      Tables.orders(s, dir)
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          bi(WindowOps.releaseNum(w)).as("seq"))
    }, Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_orderdate ORDER BY o_orderkey) - 1 AS BIGINT) AS seq
      FROM orders""")),

    // W13: NYSE-style fractiles — breakpoints from a DIFFERENT population
    // than the ranked values (fractile_split filters.py:267-287).
    Q("w13_fractile", (s, dir) => {
      val cust = Tables.customer(s, dir)
      val pop = cust.where(col("c_mktsegment") === "BUILDING")
      Fractiles.split(cust, pop, "c_acctbal", 10, "decile")
        .select(bi(col("c_custkey")).as("c_custkey"), bi(col("decile")).as("decile"))
    }, Some("""
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             CAST(1 + len(list_filter(bp.b, x -> x < c_acctbal)) AS BIGINT) AS decile
      FROM customer,
           (SELECT quantile_cont(c_acctbal, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS b
            FROM customer WHERE c_mktsegment = 'BUILDING') bp""")),

    // W7: tick test — naive sign-of-price-change (align_trades
    // taq.py:330-359) AND the classic variant where zero-ticks carry the
    // prior nonzero sign forward; per customer-group price path ordered
    // by (date, orderkey). signum on identical parquet doubles is
    // cross-engine exact.
    Q("w7_tick", (s, dir) => {
      val w = Window.partitionBy("g").orderBy("ts", "o_orderkey")
      val o = Tables.orders(s, dir)
        .select((col("o_custkey") % 50).as("g"), col("o_orderdate").as("ts"),
          col("o_orderkey"), col("o_totalprice").as("p"))
      o.select(bi(col("g")).as("g"), bi(col("o_orderkey")).as("o_orderkey"),
          WindowOps.tickSign(col("p"), w).as("tick"),
          WindowOps.classicTickSign(col("p"), w).as("classic_tick"))
    }, Some("""
      WITH x AS (
        SELECT o_custkey % 50 AS g, o_orderdate AS ts, o_orderkey, o_totalprice AS p,
               sign(o_totalprice - lag(o_totalprice) OVER
                 (PARTITION BY o_custkey % 50 ORDER BY o_orderdate, o_orderkey)) AS raw
        FROM orders
      )
      SELECT CAST(g AS BIGINT) AS g, CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(coalesce(raw, 0.0) AS DOUBLE) AS tick,
             CAST(last_value(CASE WHEN raw <> 0 THEN raw END IGNORE NULLS) OVER
               (PARTITION BY g ORDER BY ts, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS classic_tick
      FROM x""")),

    // W11: overlapping-holdings smoothing (backtest.py:140-149) — each
    // permno's weight averaged over its last k rebalances on the DENSE
    // rebalance grid (missing months count 0), zero rows dropped.
    // Holdings derived from orders; the dates×permnos grid cross is two
    // provably-small dimensions (allowlisted in PlanAudit).
    Q("w11_smooth", (s, dir) => {
      val h = Tables.orders(s, dir)
        .groupBy((year(col("o_orderdate")) * 100 + 12).as("rebaldate"),
          (col("o_custkey") % 40).as("permno"))
        .agg(r6((dsum(col("o_totalprice")) % 10) / 100.0).as("weight"))
        .where(col("weight") > 0.02)
      graft.backtest.Backtesting.smooth(h, k = 3)
        .select(bi(col("rebaldate")).as("rebaldate"), bi(col("permno")).as("permno"),
          r6(col("smoothed")).as("smoothed"))
    }, Some("""
      WITH h AS (
        SELECT year(o_orderdate) * 100 + 12 AS rebaldate, o_custkey % 40 AS permno,
               ROUND((CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) % 10) / 100.0, 6) AS weight
        FROM orders GROUP BY 1, 2
        HAVING ROUND((CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) % 10) / 100.0, 6) > 0.02
      ), grid AS (
        SELECT d.rebaldate, p.permno
        FROM (SELECT DISTINCT rebaldate FROM h) d
        CROSS JOIN (SELECT DISTINCT permno FROM h) p
      ), filled AS (
        SELECT g.rebaldate, g.permno, coalesce(h.weight, 0.0) AS w0
        FROM grid g LEFT JOIN h ON g.rebaldate = h.rebaldate AND g.permno = h.permno
      ), sm AS (
        SELECT rebaldate, permno,
               AVG(w0) OVER (PARTITION BY permno ORDER BY rebaldate
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS smoothed
        FROM filled
      )
      SELECT CAST(rebaldate AS BIGINT) AS rebaldate, CAST(permno AS BIGINT) AS permno,
             ROUND(smoothed, 6) AS smoothed
      FROM sm WHERE smoothed <> 0.0""")),

    // P7: winsorize at exact [0.05, 0.95] quantiles + Tukey IQR fences
    // (filters.py:145-205) — the two scalar quantile pairs fold back as
    // literals (one aggregate pass each, no per-row second shuffle).
    Q("p7_winsor", (s, dir) => {
      val o = Tables.orders(s, dir)
      graft.ops.Outliers.winsorizeAndFence(o, "o_totalprice", 0.05, 0.95, 1.5, "w", "f")
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          r6(col("w")).as("winsorized"), r6(col("f")).as("fenced"))
    }, Some("""
      WITH q AS (
        SELECT quantile_cont(o_totalprice, 0.05) AS lo,
               quantile_cont(o_totalprice, 0.95) AS hi,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
      )
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             ROUND(CASE WHEN o_totalprice < q.lo THEN q.lo
                        WHEN o_totalprice > q.hi THEN q.hi
                        ELSE o_totalprice END, 6) AS winsorized,
             ROUND(CASE WHEN o_totalprice < q.q1 - 1.5 * (q.q3 - q.q1)
                          OR o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1)
                        THEN NULL ELSE o_totalprice END, 6) AS fenced
      FROM orders CROSS JOIN q""")),

    // F1: int-date algebra — YYYYMMDD extraction, month/quarter-end
    // rounding, FF June fiscal mapping (busday.py:288-468).
    Q("f1_dates", (s, dir) => {
      val d = DateInt.fromTimestamp(col("o_orderdate"))
      Tables.orders(s, dir)
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          bi(d).as("d"),
          bi(DateInt.yearOf(d)).as("y"),
          bi(DateInt.monthOf(d)).as("m"),
          bi(DateInt.endmo(d)).as("eom"),
          bi(DateInt.endqr(d)).as("eoq"),
          bi(DateInt.ffMonthEnd(d)).as("ff_june"))
    }, Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS BIGINT) AS d,
             CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS eom,
             CAST(year(o_orderdate)*10000 + (((month(o_orderdate)-1)//3)*3+3)*100
                  + (CASE WHEN ((month(o_orderdate)-1)//3)*3+3 IN (3, 12) THEN 31 ELSE 30 END) AS BIGINT) AS eoq,
             CAST(CASE WHEN month(o_orderdate) < 6 THEN year(o_orderdate)*10000 + 630
                       ELSE (year(o_orderdate)+1)*10000 + 630 END AS BIGINT) AS ff_june
      FROM orders""")),

    // F4: string cleanup + regroup (sql.py:47,65-66).
    Q("f4_strings", (s, dir) => {
      Tables.part(s, dir)
        .groupBy(regexp_replace(lower(col("p_type")), "[aeiou]", "").as("cls"))
        .agg(bi(count(lit(1))).as("n"), r6(avg(col("p_retailprice"))).as("avg_price"))
    }, Some("""
      SELECT regexp_replace(lower(p_type), '[aeiou]', '', 'g') AS cls,
             COUNT(*) AS n, ROUND(AVG(p_retailprice), 6) AS avg_price
      FROM part GROUP BY 1"""))
  )
}
