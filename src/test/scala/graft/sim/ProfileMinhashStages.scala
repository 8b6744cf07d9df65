package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.core.Tables

/** Round-14 probe: t_minhash's wall is reproducibly NON-MONOTONIC in
  * corpus size (×243 ≈ 70 s vs ×729 ≈ 36 s scaled, on both the v4 and
  * v6 corpora, consistent reps) — a plan/execution flip at the smaller
  * scale, not data growth. Per-stage executor time + I/O for the
  * catalog t_minhash at each dir names the stage that differs.
  *
  * Usage: Test/runMain graft.sim.ProfileMinhashStages <dir> [<dir>...]
  */
object ProfileMinhashStages {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_x243d6", "/tmp/graft_x729d6")
    val spark = Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("minhashStages")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    @volatile var rows = List.empty[(Int, Long, Long, Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val wall = (for (a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime)
          yield a - b).getOrElse(-1L)
        if (m != null) rows ::= ((sc.stageInfo.stageId, wall, m.executorRunTime,
          sc.stageInfo.numTasks, m.shuffleWriteMetrics.recordsWritten,
          m.diskBytesSpilled, sc.stageInfo.name.take(40)))
      }
    })

    dirs.foreach { dir =>
      rows = Nil
      val t0 = System.nanoTime()
      val df = graft.queries.Catalog.byName("t_minhash").fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "BroadcastExchange").map(j =>
        s"$j=${plan.sliding(j.length).count(_ == j)}")
      println(s"[mh] $dir joins: ${joins.mkString(" ")}")
      plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window")).foreach(l => println(s"[mh]   plan: ${l.take(110)}"))
      spark.sharedState.cacheManager.clearCache()
      println(f"[mh] $dir wall=$dt%.1f s  stages=${rows.size} " +
        f"sumStageWall=${rows.map(_._2).sum / 1000.0}%.1f s " +
        f"sumExec=${rows.map(_._3).sum / 1000.0}%.1f s")
      rows.sortBy(-_._2).take(6).foreach { case (id, w, rt, nt, rec, sp, name) =>
        println(f"[mh]   stage $id%4d wall=${w / 1000.0}%7.1f s exec=${rt / 1000.0}%8.1f s " +
          f"tasks=$nt%4d rowsOut=$rec%12d spill=${sp / 1e9}%6.2f GB  $name")
      }
    }
    spark.stop()
  }
}
