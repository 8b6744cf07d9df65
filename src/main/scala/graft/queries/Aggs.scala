package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.CompoundReturn
import QHelp._

/** Aggregation-family queries (SURVEY.md §2.4): the compounded-return
  * product aggregate (A1), summary stats (A2), weighted means (A4), VWAP
  * (A7), risk stats (A12), distinct counts (A13), vocabulary build (A14).
  */
object Aggs {

  val qs: Seq[Q] = Seq(

    // A1: prod(1+ret, min_count=1)-1 with pandas null semantics
    // (stocks.py:136-145). ret := nullif(l_discount, 0) so all-zero groups
    // exercise the all-null → null path; cret_log is the codegen-friendly
    // log1p form (provably-positive factors here).
    Q("a1_compound", (s, dir) => {
      val ret = nullIf(col("l_discount"), 0.0)
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(r6(CompoundReturn.compoundRet(ret)).as("cret"),
          bi(count(ret)).as("n_legs"))
        .select(bi(col("l_orderkey")).as("l_orderkey"),
          col("cret"), col("n_legs"))
    }, Some("""
      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             ROUND(product(1.0 + NULLIF(l_discount, 0.0)) - 1.0, 6) AS cret,
             COUNT(NULLIF(l_discount, 0.0)) AS n_legs
      FROM lineitem GROUP BY 1""")),

    // A2: count/avg/std/min/max summary by group (SQL.summary sql.py:176-201).
    Q("a2_summary", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(bi(count(lit(1))).as("n"),
          r6(avg(col("l_quantity"))).as("mean_qty"),
          r6(stddev_samp(col("l_quantity"))).as("std_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          dsum(col("l_quantity")).as("sum_qty"))
    }, Some("""
      SELECT l_returnflag, COUNT(*) AS n,
             ROUND(AVG(l_quantity), 6) AS mean_qty,
             ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
             MIN(l_quantity) AS min_qty,
             MAX(l_quantity) AS max_qty,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag""")),

    // A4: null-aware weighted mean (weighted_average filters.py:208-228).
    Q("a4_wavg", (s, dir) => {
      val x = nullIf(col("l_discount"), 0.0)
      val w = col("l_quantity")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(r6(dsum(when(x.isNotNull, x * w)) / dsum(when(x.isNotNull, w))).as("wavg_disc"),
          bi(count(when(x.isNotNull, lit(1)))).as("n_used"))
    }, Some("""
      SELECT p_brand,
             ROUND(CAST(SUM(CASE WHEN l_discount <> 0.0 THEN CAST(l_discount * l_quantity AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(SUM(CASE WHEN l_discount <> 0.0 THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE), 6) AS wavg_disc,
             COUNT(CASE WHEN l_discount <> 0.0 THEN 1 END) AS n_used
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand""")),

    // A7: VWAP-shaped weighted aggregate (taq.py:568-601).
    Q("a7_vwap", (s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(r6(dsum(col("l_extendedprice") * col("l_quantity")) / dsum(col("l_quantity"))).as("vwap"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      SELECT p_brand,
             ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS vwap,
             COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand""")),

    // A12: historical VaR/ES per group (finance.py:320-337) — exact
    // percentile then conditional mean below it.
    Q("a12_risk", (s, dir) => {
      val e = Tables.events(s, dir)
      val v = e.groupBy("event_type").agg(expr("percentile(value, 0.05)").as("v5"))
      e.join(broadcast(v), "event_type")
        .groupBy("event_type")
        .agg(r6(min(col("v5"))).as("var5"),
          r6(avg(when(col("value") <= col("v5"), col("value")))).as("es5"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      WITH v AS (SELECT event_type, quantile_cont(value, 0.05) AS v5 FROM events GROUP BY 1)
      SELECT e.event_type,
             ROUND(MIN(v5), 6) AS var5,
             ROUND(AVG(CASE WHEN value <= v5 THEN value END), 6) AS es5,
             COUNT(*) AS n
      FROM events e JOIN v USING (event_type)
      GROUP BY e.event_type""")),

    // A12b: bootstrap-resampled risk statistics (bootstrap_risk
    // finance.py:339-357) — deterministic Lehmer draws so the oracle can
    // replicate the exact resample.
    Q("a15_bootstrap", (s, dir) => {
      import graft.ops.Bootstrap
      val e = Tables.events(s, dir).where(col("event_type") === "purchase")
      Bootstrap.bootstrapRisk(e, "event_id", "value", alpha = 0.05, n = 20)
        .select(bi(col("b")).as("b"), r6(col("var_a")).as("var_a"),
          r6(col("es_a")).as("es_a"), r6(col("vol")).as("vol"),
          bi(col("n_obs")).as("n_obs"))
    }, Some("""
      WITH v AS (
        SELECT value AS vv, row_number() OVER (ORDER BY event_id) - 1 AS rid
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      ), nn AS (SELECT count(*) AS n FROM v),
      draws AS (
        SELECT CAST(floor(i / n) AS BIGINT) AS b,
               (((i + 1) * 48271) % 2147483647 * 16807) % 2147483647 % n AS rid
        FROM (SELECT unnest(range(20 * n)) AS i FROM nn) CROSS JOIN nn
      ),
      s AS (SELECT b, vv FROM draws JOIN v USING (rid)),
      q AS (SELECT b, quantile_cont(vv, 0.05) AS qq FROM s GROUP BY 1)
      SELECT CAST(s.b AS BIGINT) AS b, ROUND(MIN(qq), 6) AS var_a,
             ROUND(AVG(CASE WHEN vv <= qq THEN vv END), 6) AS es_a,
             ROUND(stddev_pop(vv), 6) AS vol, COUNT(*) AS n_obs
      FROM s JOIN q ON s.b = q.b GROUP BY 1""")),

    // A13: distinct counts (sql.py:313).
    Q("a13_distinct", (s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(bi(countDistinct(col("o_custkey"))).as("n_cust"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n
      FROM orders GROUP BY 1""")),

    // A14: vocabulary build — token counts, top-k with deterministic
    // tie-break (vocab.py:126-130).
    Q("a14_vocab", (s, dir) => {
      import graft.text.TextOps
      Tables.documents(s, dir)
        .where(col("lang") === "en")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(bi(count(lit(1))).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)
    }, Some("""
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z_]+')) AS token
            FROM documents WHERE lang = 'en')
      WHERE length(token) >= 3
      GROUP BY token
      ORDER BY n DESC, token LIMIT 50"""))
  )
}
