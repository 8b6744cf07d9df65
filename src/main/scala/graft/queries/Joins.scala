package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{AsOf, IntervalJoin}
import QHelp._

/** Join-family queries (SURVEY.md §2.3): as-of (J2/J3), interval/range
  * (J6/J7), outer-merge (J10), interval lookup (J13).
  */
object Joins {

  val qs: Seq[Q] = Seq(

    // J2 backward as-of join (Stocks.get_many exact=False, stocks.py:336-351):
    // each purchase event gets the latest prior click's value per user.
    // Tie at equal ts resolves to max value (deterministic on both engines).
    Q("j2_asof", (s, dir) => {
      val e = Tables.events(s, dir)
      val left = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinBackward(left, right, Seq("user_id"), "ts", Seq("value"),
          allowExact = true, tieBreak = Some("value"))
        .select(bi(col("event_id")).as("event_id"),
          bi(col("user_id")).as("user_id"),
          bi(unix_micros(col("ts"))).as("ts_us"),
          col("value").as("click_value"))
    }, Some("""
      SELECT CAST(e.event_id AS BIGINT) AS event_id,
             CAST(e.user_id AS BIGINT) AS user_id,
             epoch_us(e.ts) AS ts_us,
             (SELECT r.value FROM events r
               WHERE r.user_id = e.user_id AND r.event_type = 'click' AND r.ts <= e.ts
               ORDER BY r.ts DESC, r.value DESC LIMIT 1) AS click_value
      FROM events e WHERE e.event_type = 'purchase'""")),

    // J6 interval join (Stocks.get_window avg=True, stocks.py:227-259):
    // clicks within [purchase_ts, purchase_ts + 48h] per user, aggregated
    // per event. Binned equi-join so Catalyst plans a hash join, not BNLJ.
    Q("j6_range", (s, dir) => {
      val e = Tables.events(s, dir)
      val binW = 172800000000L // 48h in micros
      val purch = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + binW).as("hi"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("t"), col("value"))
      IntervalJoin.joinRange(purch, clicks, Seq("user_id"), "t", "lo", "hi", binW)
        .groupBy("event_id")
        .agg(bi(count(lit(1))).as("n_clicks"), r6(sum(col("value"))).as("sum_value"))
        .select(bi(col("event_id")).as("event_id"), col("n_clicks"), col("sum_value"))
    }, Some("""
      SELECT CAST(p.event_id AS BIGINT) AS event_id,
             COUNT(*) AS n_clicks,
             ROUND(SUM(c.value), 6) AS sum_value
      FROM events p JOIN events c
        ON p.user_id = c.user_id AND c.event_type = 'click'
       AND c.ts >= p.ts AND epoch_us(c.ts) <= epoch_us(p.ts) + 172800000000
      WHERE p.event_type = 'purchase'
      GROUP BY 1""")),

    // J10 full-outer merge with coalesce arithmetic (CRSP.get_ret delist
    // composition, crsp.py:350-357).
    Q("j10_outer", (s, dir) => {
      val cAgg = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
        .agg(bi(count(lit(1))).as("n_cust"), dsum(col("c_acctbal")).as("cust_bal"))
      val sAgg = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
        .agg(bi(count(lit(1))).as("n_supp"), dsum(col("s_acctbal")).as("supp_bal"))
      cAgg.join(sAgg, Seq("nationkey"), "full_outer")
        .select(bi(col("nationkey")).as("nationkey"),
          bi(coalesce(col("n_cust"), lit(0L))).as("n_cust"),
          bi(coalesce(col("n_supp"), lit(0L))).as("n_supp"),
          r6(coalesce(col("cust_bal"), lit(0.0)) + coalesce(col("supp_bal"), lit(0.0))).as("tot_bal"))
    }, Some("""
      WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust,
                        CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS cust_bal
                 FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp,
                        CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS supp_bal
                 FROM supplier GROUP BY 1)
      SELECT CAST(COALESCE(c.nationkey, s.nationkey) AS BIGINT) AS nationkey,
             CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
             CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp,
             ROUND(COALESCE(cust_bal, 0.0) + COALESCE(supp_bal, 0.0), 6) AS tot_bal
      FROM c FULL JOIN s USING (nationkey)""")),

    // J13 interval lookup against a small broadcast dimension
    // (Sectoring.__getitem__ sectoring.py:128-133).
    Q("j13_bucket", (s, dir) => {
      import s.implicits._
      val dim = Seq((1, 10, "small"), (10, 25, "medium"), (25, 51, "large"))
        .toDF("lo", "hi", "cls")
      IntervalJoin.lookup(Tables.part(s, dir), dim, "p_size", "lo", "hi")
        .groupBy("cls")
        .agg(bi(count(lit(1))).as("n"), r6(avg(col("p_retailprice"))).as("avg_price"))
    }, Some("""
      SELECT cls, COUNT(*) AS n, ROUND(AVG(p_retailprice), 6) AS avg_price
      FROM part LEFT JOIN (VALUES (1, 10, 'small'), (10, 25, 'medium'), (25, 51, 'large')) d(lo, hi, cls)
        ON p_size >= lo AND p_size < hi
      GROUP BY cls""")),

    // Skew-salted equi-join (the brief's "salting for skew"): lineitem ⋈
    // orders through Skew.saltedJoin must be row-identical to the plain
    // join — the oracle is the UNSALTED SQL join, proving the salt never
    // changes what matches.
    Q("j15_salted", (s, dir) => {
      graft.ops.Skew.saltedJoin(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice")),
          Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority")),
          Seq("l_orderkey"), buckets = 8)
        .groupBy("o_orderpriority")
        .agg(bi(count(lit(1))).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1"""))
  )
}
