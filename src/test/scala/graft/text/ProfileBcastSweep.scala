package graft.text

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.core.Tables

/** Round-15 sweep of the AQE compressed-size broadcast hazard (round-14
  * verdict #3) across the explode-derived join families the r14 fix did
  * NOT guard. The lie: Generate (explode) stats pass the child's
  * sizeInBytes through, and AQE's runtime re-plan reads COMPRESSED
  * shuffle bytes against the 64 MB threshold — repetitive long streams
  * lz4-compress far below their in-memory size, so a corpus-
  * proportional frame can price under threshold and materialize a
  * BroadcastQueryStage whose hash relation builds single-threaded on
  * the driver (t_minhash's jstack-caught ~40 s at ×243, round 14 —
  * reproducibly NON-MONOTONIC: ×243 slower than ×729 because the
  * ×729 stream happened to price above threshold).
  *
  * Families under test, each at two decades (monotonicity is the cheap
  * tell — decades must be monotone):
  *   - simhash: [[NearDup.simHashPairs128]]'s banded self-join
  *     (9 corpus-proportional rows/doc; high-entropy sigs compress
  *     worse than minhash bands, but band/id columns are repetitive);
  *   - linededup: [[LineDedup.dedupLines]]'s hit-set joins (hits ∝
  *     boilerplate — corpus-proportional on any corpus with repeated
  *     lines — feeding a semi, an anti, and two patch joins);
  *   - decontam: [[Decontaminate.report]] with a corpus-PROPORTIONAL
  *     eval set (2% sample of the corpus itself) — here the broadcast
  *     is EXPLICIT, not an AQE decision: the hazard is the forced
  *     driver build of a corpus-proportional shingle relation.
  *
  * Prints wall, a physical-join census, and the slowest stages per run.
  *
  * Usage: Test/runMain graft.text.ProfileBcastSweep [family ...]
  * (dirs fixed: /tmp/graft_x243d6, /tmp/graft_x729d6 — ScaleStress
  * docs-only v6 dirs)
  */
object ProfileBcastSweep {
  def main(args: Array[String]): Unit = {
    val families = if (args.nonEmpty) args.toSeq
      else Seq("simhash", "linededup", "decontam")
    val dirs = Seq(("/tmp/graft_x243d6", 243), ("/tmp/graft_x729d6", 729))
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("bcastsweep")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stages = List.empty[(Int, Long, Long, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val wall = (for (a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime)
          yield a - b).getOrElse(-1L)
        if (m != null) stages ::= ((sc.stageInfo.stageId, wall, m.executorRunTime,
          m.shuffleWriteMetrics.recordsWritten, m.diskBytesSpilled,
          sc.stageInfo.name.take(40)))
      }
    })

    def planOf(fam: String, dir: String): org.apache.spark.sql.DataFrame = fam match {
      case "simhash" =>
        NearDup.simHashPairs128(Tables.documents(spark, dir), "doc_id", "text",
          maxHamming = 8)
      case "linededup" =>
        LineDedup.dedupLines(Tables.documents(spark, dir), "doc_id", "text")
      case "decontam" =>
        val docs = Tables.documents(spark, dir)
        // corpus-proportional eval set: a deterministic 2% slice
        val bench = docs.where(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.lit(50)) === 0)
          .select(org.apache.spark.sql.functions.col("text"))
        Decontaminate.report(docs, "doc_id", "text", bench, "text")
      case other => sys.error(s"unknown family $other")
    }

    // SWEEP_FINAL=1: execute the census df's OWN QueryExecution (an RDD
    // count through AdaptiveSparkPlanExec) so the printed plan is the
    // FINAL AQE plan — a noop write runs a separate QueryExecution and
    // leaves this one's plan at its initial (static-stats) state, which
    // is exactly the state the broadcast lie makes misleading
    val finalPlan = sys.env.get("SWEEP_FINAL").contains("1")
    for (fam <- families; (dir, copies) <- dirs) {
      stages = Nil
      val t0 = System.nanoTime()
      val df = planOf(fam, dir)
      if (finalPlan) df.queryExecution.executedPlan.execute().count()
      else df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val plan = df.queryExecution.executedPlan.toString
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "BroadcastExchange").map(j =>
        s"$j=${plan.sliding(j.length).count(_ == j)}")
      println(f"[sweep] $fam%-10s x$copies wall=$dt%7.1f s  joins: ${joins.mkString(" ")}")
      stages.sortBy(-_._2).take(5).foreach { case (id, w, rt, rec, sp, name) =>
        println(f"[sweep]   stage $id%4d wall=${w / 1000.0}%7.1f s exec=${rt / 1000.0}%8.1f s " +
          f"rowsOut=$rec%12d spill=${sp / 1e9}%6.2f GB  $name")
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
