package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — the
  * LLM-pipeline ANN surface (builder brief; reference analog: vocab
  * embedding matrices `finds/unstructured/vocab.py:98-114`).
  *
  * Brute-force cosine is the exactness baseline (O(n²) pairs — only for
  * verification / small probes). The scale path is LSH bucketing with
  * deterministic random hyperplanes: per-row signature (no shuffle), one
  * equi-join on bucket, pair scoring inside buckets only.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors per query vector (brute force).
    * Deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val a = vecs.select(col(idCol).as("query_id"), col(vecCol).as("va"))
    val b = vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("vb"))
    val scored = a.join(b, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a fixed hash mapped to [-1, 1]. Reproducible across runs/engines.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(2000001L)).cast("double") / 1000000.0) - 1.0

  /** Random-hyperplane LSH signature: `planes` sign bits packed to a long;
    * `seed` selects an independent plane set (one per LSH table).
    * Per-row map over the vector — embarrassingly parallel.
    */
  def lshSignature(vec: Column, planes: Int, seed: Int = 0): Column = {
    val sigs = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(seed * planes + p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    sigs.reduce(_.bitwiseOR(_))
  }

  /** ANN via LSH buckets: candidates share the exact signature (or use
    * multiple independent tables via `tables` for higher recall); exact
    * cosine re-scoring inside buckets.
    */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    val sigs = vecs.select(
      col(idCol), col(vecCol),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          lshSignature(col(vecCol), planes, t).as("sig"))): _*)).as("s"))
      .select(col(idCol), col(vecCol), col("s.tbl"), col("s.sig"))
    val a = sigs.select(col(idCol).as("query_id"), col(vecCol).as("va"),
      col("tbl"), col("sig"))
    val b = sigs.select(col(idCol).as("neighbor_id"), col(vecCol).as("vb"),
      col("tbl"), col("sig"))
    val cands = a.join(b, Seq("tbl", "sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "va", "vb").distinct()
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(cosine(col("va"), col("vb")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
