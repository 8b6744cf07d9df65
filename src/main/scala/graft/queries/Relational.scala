package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{DateInt, Tables}
import QHelp._

/** Scan / filter / projection / group-agg queries (SURVEY.md §2.1 S4,
  * §2.2 P1-P4, §2.4 A2/A13, §2.6 O2-O5). TPC-H-shaped so Catalyst's
  * pushdown/pruning does the reference's manual WHERE-composition
  * (`finds/structured/stocks.py:55-69`) for free.
  */
object Relational {

  val qs: Seq[Q] = Seq(

    // P1: field+range selection with key-set filter (stocks.py:55-69).
    Q("p1_scan", (s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate").between(ts("1995-01-01"), ts("1995-03-31 23:59:59"))
          && col("l_suppkey").isin(1, 2, 3, 5, 8))
        .select(bi(col("l_orderkey")).as("l_orderkey"),
          bi(col("l_linenumber")).as("l_linenumber"),
          bi(col("l_suppkey")).as("l_suppkey"),
          col("l_quantity"),
          bi(DateInt.fromTimestamp(col("l_shipdate"))).as("ship_d"))
    }, Some("""
      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(l_suppkey AS BIGINT) AS l_suppkey,
             l_quantity,
             CAST(year(l_shipdate)*10000 + month(l_shipdate)*100 + day(l_shipdate) AS BIGINT) AS ship_d
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31 23:59:59'
        AND l_suppkey IN (1,2,3,5,8)""")),

    // P4: universe-style boolean screen (CRSP.get_universe crsp.py:244-248).
    Q("p4_screen", (s, dir) => {
      Tables.customer(s, dir)
        .where(col("c_acctbal") > 0 && col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(bi(col("c_custkey")).as("c_custkey"),
          col("c_acctbal"),
          col("c_mktsegment"),
          bi(col("c_nationkey").isin(1, 2, 3).cast("long")).as("is_dom"))
    }, Some("""
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal, c_mktsegment,
             CAST(c_nationkey IN (1,2,3) AS BIGINT) AS is_dom
      FROM customer
      WHERE c_acctbal > 0 AND c_mktsegment IN ('BUILDING','AUTOMOBILE')""")),

    // A2-style full-scan aggregation (TPC-H Q1 shape; SQL.summary sql.py:176-201).
    Q("q1_agg", (s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          r6(avg("l_quantity")).as("avg_qty"),
          r6(avg("l_discount")).as("avg_disc"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        ROUND(AVG(l_quantity), 6) AS avg_qty,
        ROUND(AVG(l_discount), 6) AS avg_disc,
        COUNT(*) AS n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""")),

    // Selective filter + single-row agg (TPC-H Q6 shape) — the plan must
    // show PushedFilters on the parquet scan.
    Q("q6_filter", (s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // O3 top-k with deterministic tie-break (TPC-H Q3 shape).
    Q("q3_topk", (s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).where(col("o_orderdate") < ts("1997-03-15"))
      val l = Tables.lineitem(s, dir).where(col("l_shipdate") > ts("1997-03-15"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), DateInt.fromTimestamp(col("o_orderdate")).as("odate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(bi(col("l_orderkey")).as("l_orderkey"), bi(col("odate")).as("odate"), col("revenue"))
    }, Some("""
      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS BIGINT) AS odate,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-03-15' AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY 1, 2
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // J1 equi-join chain with broadcast dims (TPC-H Q5 shape).
    Q("q5_join", (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      val l = Tables.lineitem(s, dir)
      val sup = broadcast(Tables.supplier(s, dir))
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name""")),

    // O5: key-set difference (busday.py:113-119 holidays pattern).
    Q("o5_setops", (s, dir) => {
      val o = Tables.orders(s, dir)
      val jan = o.where(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-02-01"))
        .select(bi(col("o_custkey")).as("o_custkey")).distinct()
      val rest = o.where(col("o_orderdate") >= ts("1996-02-01") && col("o_orderdate") < ts("1997-01-01"))
        .select(bi(col("o_custkey")).as("o_custkey")).distinct()
      jan.except(rest)
    }, Some("""
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
      EXCEPT
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1997-01-01'"""))
  )
}
