package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Calendar, DateInt, Tables}
import graft.graph.GraphOps
import graft.ops.{AsOf, IntervalJoin}
import QHelp._

/** Second coverage batch: parent-cap window (A3), same-date mean (A5),
  * forward as-of (W8), point-lookup batch (J1), event-window matrix (J7),
  * portfolio accounting (J11), grouped OLS via exact normal equations
  * (A9), business-day calendar ops (F2), graph degree/link-prediction,
  * pivot (sql.py:285-342), finder (P8), and type coercion (F5/S2).
  */
object Batch2 {

  val qs: Seq[Q] = Seq(

    // A3: cap aggregation by parent via window sum (CRSP.get_cap use_permco,
    // crsp.py:181-188): each supplier's share of its nation's total.
    Q("a3_parentcap", (s, dir) => {
      val w = Window.partitionBy("s_nationkey")
      Tables.supplier(s, dir)
        .select(bi(col("s_suppkey")).as("s_suppkey"),
          bi(col("s_nationkey")).as("s_nationkey"),
          col("s_acctbal"),
          r6(sum(col("s_acctbal")).over(w)).as("nation_total"),
          r6(col("s_acctbal") / sum(col("s_acctbal")).over(w)).as("share"))
    }, Some("""
      SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
             CAST(s_nationkey AS BIGINT) AS s_nationkey,
             s_acctbal,
             ROUND(SUM(s_acctbal) OVER (PARTITION BY s_nationkey), 6) AS nation_total,
             ROUND(s_acctbal / SUM(s_acctbal) OVER (PARTITION BY s_nationkey), 6) AS share
      FROM supplier""")),

    // A5: same-date portfolio mean (eventstudy.py:231).
    Q("a5_datemean", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(DateInt.fromTimestamp(col("ts")).as("d"))
        .agg(r6(avg(col("value"))).as("mean_value"), bi(count(lit(1))).as("n"))
        .select(bi(col("d")).as("d"), col("mean_value"), col("n"))
    }, Some("""
      SELECT CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS d,
             ROUND(AVG(value), 6) AS mean_value, COUNT(*) AS n
      FROM events GROUP BY 1""")),

    // W8: forward as-of — next error event's value at or after each signup
    // (the +5min forward midquote shape, taq.py:406-411).
    Q("w8_asof_fwd", (s, dir) => {
      val e = Tables.events(s, dir)
      val left = e.where(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinForward(left, right, Seq("user_id"), "ts", Seq("value"),
          allowExact = true, tieBreak = Some("value"))
        .select(bi(col("event_id")).as("event_id"),
          bi(col("user_id")).as("user_id"),
          col("value").as("next_error_value"))
    }, Some("""
      SELECT CAST(e.event_id AS BIGINT) AS event_id,
             CAST(e.user_id AS BIGINT) AS user_id,
             (SELECT r.value FROM events r
               WHERE r.user_id = e.user_id AND r.event_type = 'error' AND r.ts >= e.ts
               ORDER BY r.ts ASC, r.value ASC LIMIT 1) AS next_error_value
      FROM events e WHERE e.event_type = 'signup'""")),

    // J1: batch point-lookup — broadcast key-pair table LEFT JOIN fact on
    // both keys (Stocks.get_many exact=True, stocks.py:316-335).
    Q("j1_lookup", (s, dir) => {
      val o = Tables.orders(s, dir)
      val keys = o.where(col("o_orderkey") % 100 === 0)
        .select(col("o_custkey").as("k_cust"), col("o_orderdate").as("k_date"))
        .distinct()
      // the preserved (outer) side of an outer join can never be the
      // broadcast build side, so a small-keys LEFT join runs as a shuffle
      // join — acceptable: the shuffle is sized by the fact side, same as
      // any equi-join on it.
      keys.join(o,
          col("k_cust") === col("o_custkey") && col("k_date") === col("o_orderdate"), "left")
        .select(bi(col("k_cust")).as("k_cust"),
          bi(DateInt.fromTimestamp(col("k_date"))).as("k_d"),
          bi(col("o_orderkey")).as("o_orderkey"),
          col("o_totalprice"))
    }, Some("""
      WITH keys AS (SELECT DISTINCT o_custkey AS k_cust, o_orderdate AS k_date
                    FROM orders WHERE o_orderkey % 100 = 0)
      SELECT CAST(k_cust AS BIGINT) AS k_cust,
             CAST(year(k_date)*10000 + month(k_date)*100 + day(k_date) AS BIGINT) AS k_d,
             CAST(o_orderkey AS BIGINT) AS o_orderkey,
             o_totalprice
      FROM keys LEFT JOIN orders ON k_cust = o_custkey AND k_date = o_orderdate""")),

    // J7: event-window matrix — per sampled order event, the customer's
    // lineitem activity by relative day in ±30d (get_window avg=False,
    // stocks.py:260-294), binned range join + groupBy(event, rel).
    Q("j7_eventmatrix", (s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val fact = l.join(o.select(col("o_orderkey").as("lo_key"), col("o_custkey").as("custkey")),
          col("l_orderkey") === col("lo_key"))
        .select(col("custkey"), datediff(col("l_shipdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("t"), col("l_quantity"))
      val ev = o.where(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").as("event_id"), col("o_custkey").as("custkey"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("t0"))
        .withColumn("lo", col("t0") - 30).withColumn("hi", col("t0") + 30)
      IntervalJoin.joinRange(ev, fact, Seq("custkey"), "t", "lo", "hi", 30L)
        .groupBy(col("event_id"), (col("t") - col("t0")).as("rel"))
        .agg(bi(count(lit(1))).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(bi(col("event_id")).as("event_id"), bi(col("rel")).as("rel"),
          col("n"), col("sum_qty"))
    }, Some("""
      WITH fact AS (
        SELECT o_custkey AS custkey, datediff('day', DATE '1995-01-01', l_shipdate::DATE) AS t,
               l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ), ev AS (
        SELECT o_orderkey AS event_id, o_custkey AS custkey,
               datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS t0
        FROM orders WHERE o_orderkey % 50 = 0
      )
      SELECT CAST(event_id AS BIGINT) AS event_id,
             CAST(t - t0 AS BIGINT) AS rel,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      FROM ev JOIN fact ON ev.custkey = fact.custkey AND fact.t BETWEEN t0 - 30 AND t0 + 30
      GROUP BY 1, 2""")),

    // J11: holdings × returns accounting — cap-weighted portfolio return
    // per nation with deterministic synthetic returns
    // (BackTest.__call__ backtest.py:152-153).
    Q("j11_portfolio", (s, dir) => {
      val w = Window.partitionBy("s_nationkey")
      val sup = Tables.supplier(s, dir).where(col("s_acctbal") > 0)
        .withColumn("wt", col("s_acctbal") / sum(col("s_acctbal")).over(w))
        .withColumn("ret", (col("s_suppkey") % 7).cast("double") / 100.0)
      sup.groupBy("s_nationkey")
        .agg(r6(sum(col("wt") * col("ret"))).as("port_ret"), bi(count(lit(1))).as("n"))
        .select(bi(col("s_nationkey")).as("s_nationkey"), col("port_ret"), col("n"))
    }, Some("""
      WITH x AS (
        SELECT s_nationkey,
               s_acctbal / SUM(s_acctbal) OVER (PARTITION BY s_nationkey) AS wt,
               CAST(s_suppkey % 7 AS DOUBLE) / 100.0 AS ret
        FROM supplier WHERE s_acctbal > 0
      )
      SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
             ROUND(SUM(wt * ret), 6) AS port_ret, COUNT(*) AS n
      FROM x GROUP BY 1""")),

    // A9: per-group cross-sectional OLS via EXACT decimal normal equations
    // (least_squares econs.py:238-265, RiskPremium riskpremium.py:42-82):
    // slope/intercept of totalprice on day-of-month, per priority class.
    Q("a9_fmb", (s, dir) => {
      val x = dayofmonth(col("o_orderdate")).cast("double")
      val y = col("o_totalprice")
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(dsum(x).as("sx"), dsum(y).as("sy"), dsum(x * y).as("sxy"),
          dsum(x * x).as("sxx"), count(lit(1)).cast("double").as("n"))
        .select(col("o_orderpriority"),
          r6((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
          r6((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"))
            .as("intercept"),
          bi(col("n")).as("n"))
    }, Some("""
      WITH a AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(CAST(day(o_orderdate) AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(CAST(day(o_orderdate) AS DOUBLE) * o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(CAST(day(o_orderdate) AS DOUBLE) * CAST(day(o_orderdate) AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM orders GROUP BY 1
      )
      SELECT o_orderpriority,
             ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept,
             CAST(n AS BIGINT) AS n
      FROM a""")),

    // F2: business-day roll + offset against the calendar dimension
    // (busday.py:202-228): previous business day of each order date and
    // the business day 5 steps later.
    Q("f2_busday", (s, dir) => {
      val cal = Calendar.dense(s, "1995-01-01", "2002-01-31")
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), DateInt.fromTimestamp(col("o_orderdate")).as("di"))
      val rolled = Calendar.rollPrev(o, "di", cal)
      Calendar.offset(rolled, cal, 5, "fwd5_di")
        .select(bi(col("o_orderkey")).as("o_orderkey"),
          bi(col("roll_di")).as("roll_di"),
          bi(col("fwd5_di")).as("fwd5_di"))
    }, Some("""
      WITH cal AS (
        SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS di,
               row_number() OVER (ORDER BY d) AS seq
        FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '2002-01-31',
                     INTERVAL 1 DAY))::DATE AS d)
        WHERE dayofweek(d) BETWEEN 1 AND 5
      )
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(r.di AS BIGINT) AS roll_di,
             CAST(f.di AS BIGINT) AS fwd5_di
      FROM orders
      LEFT JOIN cal r ON r.di = (SELECT max(c.di) FROM cal c
        WHERE c.di <= year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate))
      LEFT JOIN cal f ON f.seq = r.seq + 5""")),

    // Graph: degree centrality of the customer-supplier trade graph
    // (graph.py:185-210).
    Q("g_degree", (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst")).distinct()
      GraphOps.degrees(edges)
        .select(bi(col("node")).as("node"), bi(col("degree")).as("degree"))
    }, Some("""
      WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT CAST(node AS BIGINT) AS node, COUNT(*) AS degree
      FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
      GROUP BY 1""")),

    // Graph: link prediction between suppliers sharing customers —
    // common neighbors, Jaccard, Adamic-Adar, preferential attachment
    // (graph.py:295-317).
    Q("g_linkpred", (s, dir) => {
      // NO .distinct() here: linkPrediction dedups inside its own aggs
      // (count_distinct degrees + set-valued adjacency), so the raw
      // join output feeds it directly — the distinct was a whole extra
      // shuffle + cache materialization of the edge list
      // localCheckpoint (NOT persist): the op's two consumers (degrees,
      // adjacency) each re-ran the lineitem⋈orders build (~0.7 s of the
      // 2.4 s total); the earlier profiled alternative — a columnar
      // persist — cost more to build (4.7 s) than the re-scan it saved,
      // but a checkpoint write of the 550k-row projection is ~0.2 s and
      // both consumers then read in-memory rows
      // The checkpoint keeps the scan's 3 partitions DELIBERATELY: a
      // repartition(32) ahead of it (to widen the two consumers' partial
      // aggs, which stage-trace at 3 tasks) measured 1.74 s -> 2.60 s —
      // the extra eager exchange job serializes ahead of everything while
      // the 3-wide partial aggs it would widen already overlap the main
      // job's other stages in the warmed JVM.
      val edges = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
        .localCheckpoint()
      // maxNeighborDegree=500 is the hub guard (observed max customer
      // degree 102 at sf0.1 — a no-op here, the ceiling at scale); the
      // oracle applies the identical cap
      GraphOps.linkPrediction(edges, "supp", "cust", maxNeighborDegree = 500)
        .where(col("common") >= 20)
        .select(bi(col("n_a")).as("supp_a"), bi(col("n_b")).as("supp_b"),
          bi(col("common")).as("common"),
          r6(col("jaccard")).as("jaccard"),
          r6(col("adamic_adar")).as("adamic_adar"),
          bi(col("pref_attach")).as("pref_attach"))
    }, Some("""
      WITH e AS (SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deg AS (SELECT supp, COUNT(*) AS deg FROM e GROUP BY 1),
      cdeg AS (SELECT cust, COUNT(*) AS cdeg FROM e GROUP BY 1),
      shared AS (
        SELECT a.supp AS supp_a, b.supp AS supp_b, COUNT(*) AS common,
               SUM(1.0 / LN(cdeg)) AS adamic_adar
        FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
        JOIN cdeg ON cdeg.cust = a.cust AND cdeg.cdeg <= 500
        GROUP BY 1, 2
      )
      SELECT CAST(supp_a AS BIGINT) AS supp_a, CAST(supp_b AS BIGINT) AS supp_b,
             CAST(common AS BIGINT) AS common,
             ROUND(CAST(common AS DOUBLE) / (da.deg + db.deg - common), 6) AS jaccard,
             ROUND(adamic_adar, 6) AS adamic_adar,
             CAST(da.deg * db.deg AS BIGINT) AS pref_attach
      FROM shared JOIN deg da ON da.supp = supp_a JOIN deg db ON db.supp = supp_b
      WHERE common >= 20""")),

    // Wide pivot (SQL.pivot sql.py:285-342): quantity by returnflag,
    // pivoted on linestatus.
    Q("o_pivot", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
    }, Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS qty_f,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS qty_o
      FROM lineitem GROUP BY 1""")),

    // P8: identifier search — LIKE dispatch (Finder finder.py:32-104).
    Q("p8_finder", (s, dir) => {
      Tables.part(s, dir)
        .where(lower(col("p_name")).like("%re%") && col("p_brand").like("Brand#1%"))
        .select(bi(col("p_partkey")).as("p_partkey"), col("p_name"), col("p_brand"))
    }, Some("""
      SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand
      FROM part
      WHERE lower(p_name) LIKE '%re%' AND p_brand LIKE 'Brand#1%'""")),

    // F5/S2: to_numeric(errors='coerce') analog — TRY_CAST of a mixed
    // string column (as_dtypes sql.py:17-71).
    Q("f5_coerce", (s, dir) => {
      val mixed = when(col("event_id") % 2 === 0, round(col("value"), 3).cast("string"))
        .otherwise(concat(lit("x"), col("event_type")))
      Tables.events(s, dir)
        .withColumn("mixed", mixed)
        .select(bi(col("event_id")).as("event_id"),
          expr("try_cast(mixed AS double)").as("coerced"))
    }, Some("""
      WITH x AS (
        SELECT event_id,
               CASE WHEN event_id % 2 = 0 THEN CAST(ROUND(value, 3) AS VARCHAR)
                    ELSE 'x' || event_type END AS mixed
        FROM events
      )
      SELECT CAST(event_id AS BIGINT) AS event_id,
             TRY_CAST(mixed AS DOUBLE) AS coerced
      FROM x"""))
  )
}
