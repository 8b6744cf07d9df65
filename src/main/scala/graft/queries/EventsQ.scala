package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import QHelp._

/** Event-stream batch twins of the streaming semantics (SURVEY.md §2.8):
  * tumbling windows (bin_trades taq.py:494-602), sessionization, and JSON
  * prop extraction (the reference's Mongo doc access re-expressed).
  */
object EventsQ {

  val qs: Seq[Q] = Seq(

    // A6: tumbling 5-minute bins — count/sum/min/max per (type, window)
    // (bin_trades taq.py:549-566). Spark's window() aligns to the epoch,
    // as does DuckDB's time_bucket for sub-day intervals.
    Q("e_tumbling", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"), window(col("ts"), "5 minutes").as("w"))
        .agg(bi(count(lit(1))).as("n"),
          dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(col("event_type"), bi(unix_micros(col("w.start"))).as("bucket_us"),
          col("n"), col("sum_value"), col("min_value"), col("max_value"))
    }, Some("""
      SELECT event_type,
             epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS bucket_us,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
             MIN(value) AS min_value,
             MAX(value) AS max_value
      FROM events GROUP BY 1, 2""")),

    // Sessionization — new session when the gap to the previous event of
    // the same user exceeds 6h (gaps-and-islands by time; streaming twin:
    // session_window / flatMapGroupsWithState).
    Q("e_session", (s, dir) => {
      val gapUs = 6L * 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .withColumn("new_s", when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
        .withColumn("session", sum(col("new_s")).over(cum))
      e.groupBy("user_id", "session")
        .agg(bi(count(lit(1))).as("n"),
          bi(min(col("us"))).as("beg_us"),
          bi(max(col("us"))).as("end_us"))
        .select(bi(col("user_id")).as("user_id"), bi(col("session")).as("session"),
          col("n"), col("beg_us"), col("end_us"),
          bi(col("end_us") - col("beg_us")).as("dur_us"))
    }, Some("""
      WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
      ), y AS (
        SELECT user_id, event_id, us,
               CASE WHEN gap IS NULL OR gap > 21600000000 THEN 1 ELSE 0 END AS new_s
        FROM x
      ), z AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        FROM y
      )
      SELECT CAST(user_id AS BIGINT) AS user_id, CAST(session AS BIGINT) AS session,
             COUNT(*) AS n, MIN(us) AS beg_us, MAX(us) AS end_us,
             MAX(us) - MIN(us) AS dur_us
      FROM z GROUP BY 1, 2""")),

    // STREAMING MinHash+LSH near-dup candidates (NearDupStream.
    // lshCandidates) run on the batch frame — the stateful per-bucket
    // pair generation degenerates to all-pairs per bucket, so DuckDB
    // replays it from the t_minhash signature CTEs. est_jaccard is the
    // signature-agreement estimate (matching positions / 64).
    Q("e_lshdup", (s, dir) => {
      graft.streaming.NearDupStream
        .lshCandidates(Tables.documents(s, dir), "doc_id", "text",
          maxBucketSize = 100000)
        .toDF().distinct()
        .select(bi(col("id_a")).as("id_a"), bi(col("id_b")).as("id_b"),
          r6(col("est_jaccard")).as("est_jaccard"))
    }, Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z_]+'), x -> len(x) >= 3) AS tk
        FROM documents
      ), sh AS (
        SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)]) AS s
        FROM toks WHERE len(tk) >= 3
      ), ex AS (
        SELECT doc_id, unnest(s) AS sg FROM sh
      ), hx AS (
        SELECT doc_id, sg,
               (list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [CAST(ascii(c) AS BIGINT) FOR c IN string_split(sg, '')]),
                  (a, c) -> (a * 31 + c) % 1000000007) * 2147483648
                + list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [CAST(ascii(c) AS BIGINT) FOR c IN string_split(sg, '')]),
                  (a, c) -> (a * 131 + c) % 998244353)) % 2147483647 AS x
        FROM ex
      ), mh AS (
        SELECT doc_id, sd.s,
               min(((sd.s * 2654435761 + x + 1) * 48271 % 2147483647 * 16807) % 2147483647) AS v
        FROM hx CROSS JOIN range(64) sd(s) GROUP BY 1, 2
      ), sig AS (
        SELECT doc_id, list(v ORDER BY s) AS sig FROM mh GROUP BY 1
      ), banded AS (
        SELECT doc_id, b AS band, sig[b * 4 + 1 : b * 4 + 4] AS bv
        FROM sig CROSS JOIN range(16) t2(b)
      ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
      )
      SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b,
             ROUND(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0, 6) AS est_jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b""")),

    // STREAMING embedding-ANN near-dup candidates (AnnStream.
    // cosineCandidates) on the batch frame — stateful hyperplane-LSH
    // buckets; DuckDB replays the s_lsh arithmetic-hyperplane signatures
    // and the exact cosine.
    Q("e_annstream", (s, dir) => {
      graft.streaming.AnnStream
        .cosineCandidates(Tables.embeddings(s, dir), "vec_id", "embedding",
          planes = 12, tables = 4, maxBucketSize = 100000)
        .toDF().distinct()
        .select(bi(col("id_a")).as("id_a"), bi(col("id_b")).as("id_b"),
          r6(col("cos")).as("cos"))
    }, Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      ), comp AS (
        SELECT p,
               [ (CAST((((p * 2654435761 + d * 40503 + 1) * 48271 % 2147483647 * 16807) % 2147483647) % 2000001 AS DOUBLE) / 1000000.0) - 1.0
                 FOR d IN range(0, 64) ] AS cl
        FROM range(48) t(p)
      ), proj AS (
        SELECT vec_id, p,
               list_reduce(list_prepend(0.0, [x[1] * x[2] FOR x IN list_zip(e, cl)]), (a, b) -> a + b) AS pr
        FROM v CROSS JOIN comp
      ), sig AS (
        SELECT vec_id, p // 12 AS tbl,
               sum(CASE WHEN pr >= 0 THEN 1 << (p % 12) ELSE 0 END) AS sg
        FROM proj GROUP BY 1, 2
      ), cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sg = b.sg AND a.vec_id < b.vec_id
      )
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             ROUND(
               list_reduce(list_prepend(0.0, [x[1] * x[2] FOR x IN list_zip(va.e, vb.e)]), (p, c) -> p + c)
               / (sqrt(list_reduce(list_prepend(0.0, [x[1] * x[2] FOR x IN list_zip(va.e, va.e)]), (p, c) -> p + c))
                * sqrt(list_reduce(list_prepend(0.0, [x[1] * x[2] FOR x IN list_zip(vb.e, vb.e)]), (p, c) -> p + c))), 6) AS cos
      FROM cand JOIN v va ON va.vec_id = id_a JOIN v vb ON vb.vec_id = id_b""")),

    // JSON prop extraction + agg (the driver's events.props column;
    // reference analog: Mongo doc field access unstructured.py:59-154).
    Q("e_json", (s, dir) => {
      // ONE JSON parse per row (r17): the former inline form referenced
      // get_json_object in the grouping key of the distinct-rewrite AND
      // all four aggregate inputs — the partial-aggregate plan carried
      // five textual copies of the parse, and codegen subexpression
      // elimination does not unify the grouping-key copy with the
      // update-expression copies. Pre-projecting k evaluates the parse
      // exactly once per row below the aggregation (guide §2.3 "project
      // before the exchange"/§4.4 duplicated-evaluation shape); the
      // aggregate arithmetic is unchanged Column code on the same int,
      // so results are bit-identical (oracle hash-checked).
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("__k"))
        .groupBy("event_type")
        .agg(r6(avg(col("__k"))).as("avg_k"),
          bi(min(col("__k"))).as("min_k"),
          bi(max(col("__k"))).as("max_k"),
          bi(countDistinct(col("__k"))).as("n_k"),
          bi(count(lit(1))).as("n"))
    }, Some("""
      SELECT event_type,
             ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
             CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k,
             CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k,
             COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
             COUNT(*) AS n
      FROM events GROUP BY 1"""))
  )
}
