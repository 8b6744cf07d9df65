package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One hyperplane-LSH-banded vector row: `bucket` renders (table,
  * signature), `vec` is the double-cast embedding. Top-level for
  * encoders.
  */
case class VecBanded(bucket: String, id: Long, vec: Array[Double], ts: Long)

case class VecEntry(id: Long, vec: Array[Double], norm: Double, ts: Long)

case class VecBucketState(docs: List[VecEntry], inert: Boolean)

case class AnnCandidate(id_a: Long, id_b: Long, cos: Double)

/** STREAMING embedding-cosine near-duplicate candidates — the §2.8 twin
  * of [[graft.sim.Similarity.cosineDups]]' candidate stage: "is this
  * incoming embedding a near-dup of anything recent?" over an unbounded
  * vector stream.
  *
  * Per arriving vector: the one-pass hyperplane projection kernel →
  * per-table sign signatures (per-row maps, no shuffle) → ONE shuffle on
  * the (table, signature) bucket into `flatMapGroupsWithState`. Each
  * arrival emits a candidate pair against every retained vector in its
  * bucket with the EXACT cosine (left-to-right dot-product accumulation,
  * the same order as `VectorF.dotp` and the DuckDB oracle — bit-stable
  * cross-engine).
  *
  * State is bounded exactly like [[NearDupStream.lshCandidates]]: a
  * bucket crossing `maxBucketSize` goes inert (a degenerate
  * all-near-identical shard), and with a `tsCol` each arrival lazily
  * evicts entries older than `ttlMs` relative to its own event time —
  * no engine timers, so batch replay is identical. Pairs colliding in
  * several tables are emitted once per table — deduplicate downstream.
  *
  * On a BATCH frame this degenerates to per-bucket all-pairs generation
  * (parity spec'd against cosineDups' candidate set; oracle-checked as
  * `e_annstream` with the s_lsh arithmetic-hyperplane SQL).
  */
object AnnStream {

  def cosineCandidates(vecs: DataFrame, idCol: String, vecCol: String,
                       tsCol: Option[String] = None,
                       planes: Int = 8, tables: Int = 8,
                       maxBucketSize: Int = 256,
                       ttlMs: Long = Long.MaxValue): Dataset[AnnCandidate] =
    cosineCandidatesReleasable(vecs, idCol, vecCol, tsCol, planes, tables,
      maxBucketSize, ttlMs)._1

  /** [[cosineCandidates]] plus a release handle that unpersists the op's
    * internal projection cache (no-op on streams) — targeted release for
    * long-lived drivers, instead of the global clearCache that would also
    * evict the caller's cached frames (round-5 ADVICE).
    */
  def cosineCandidatesReleasable(vecs: DataFrame, idCol: String, vecCol: String,
                       tsCol: Option[String] = None,
                       planes: Int = 8, tables: Int = 8,
                       maxBucketSize: Int = 256,
                       ttlMs: Long = Long.MaxValue): (Dataset[AnnCandidate], () => Unit) = {
    import vecs.sparkSession.implicits._
    val tsExpr: Column = tsCol match {
      // unix_millis, NOT cast-to-long×1000: the long cast floors to whole
      // seconds, so a sub-second ttlMs would never evict within a second
      // and event-time ordering would degrade to id order inside one
      case Some(c) => unix_millis(col(c).cast("timestamp"))
      case None => lit(0L)
    }
    val p0 = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"),
      graft.sim.Similarity.lshProjections(col(vecCol), planes, tables).as("__p"),
      tsExpr.as("ts"))
    // BATCH path: persist before the `tables`-way explode — without the
    // barrier CollapseProject inlines the full hyperplane projection into
    // every packSignature slice, recomputing it per table (the same
    // pathology fixed for the minhash fold in NearDupStream). The
    // returned Dataset is lazy, so the persist outlives this call — the
    // paired release handle unpersists exactly this frame after the
    // caller's action.
    val p = if (vecs.isStreaming) p0
      else p0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = p.select(col("id"), col("vec"), col("ts"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            graft.sim.Similarity.packSignature(col("__p"), t, planes).as("sig"))): _*)).as("s"))
      .select(concat_ws(":", col("s.tbl"), col("s.sig")).as("bucket"),
        col("id"), col("vec"), col("ts"))
      .as[VecBanded]

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }

    val result = banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[VecBucketState, AnnCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[VecBanded], state: GroupState[VecBucketState]) =>
          var st = state.getOption.getOrElse(VecBucketState(Nil, inert = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[AnnCandidate]
          it.toArray.sortBy(r => (r.ts, r.id)).foreach { r =>
            if (!st.inert) {
              if (ttlMs != Long.MaxValue)
                st = st.copy(docs = st.docs.filter(_.ts >= r.ts - ttlMs))
              val rNorm = math.sqrt(dot(r.vec, r.vec))
              // zero-norm vectors are EXCLUDED, matching the batch twin
              // (Similarity.topK/cosineDups drop null/NaN cosines): a
              // 0/0 = NaN candidate would otherwise leak downstream and
              // the degenerate entry would NaN every later pairing too
              if (rNorm > 0) {
                st.docs.foreach { e =>
                  if (e.id != r.id) {
                    val (a, b) = if (e.id < r.id) (e.id, r.id) else (r.id, e.id)
                    out += AnnCandidate(a, b, dot(e.vec, r.vec) / (e.norm * rNorm))
                  }
                }
                st =
                  if (st.docs.length >= maxBucketSize) VecBucketState(Nil, inert = true)
                  else st.copy(docs = VecEntry(r.id, r.vec, rNorm, r.ts) :: st.docs)
              }
            }
          }
          state.update(st)
          out.iterator
      }
    val release: () => Unit =
      if (vecs.isStreaming) () => ()
      else () => { p.unpersist(blocking = false); () }
    (result, release)
  }
}
