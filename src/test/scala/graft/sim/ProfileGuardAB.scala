package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Round-15 A/B: isolate the COST of the memory-bounded join guard
  * ([[Similarity.boundedHashJoin]] + the bar-partial pricing) on the
  * decades where it engages. The guarded s_ivf2l ×2187 re-read came
  * back 280.5 s against the 151.7 s row committed earlier the same
  * round on pre-guard plans — 1.85×, beyond any session spread — and
  * t_embdup's 178.9 vs 136.3 has the same smell. Whether that delta is
  * the REPARTITION_BY_NUM exchanges (wider joins, AQE local-reader /
  * coalescing disabled) or session drift decides whether the guard's
  * engagement threshold is right — the OOM it fixes is real, so if the
  * width itself is expensive the answer is tuning the budget, not
  * removing the guard.
  *
  * Arms (interleaved rep-wise, same JVM, same dir):
  *   guard  — production code, default 96 MB budget;
  *   off    — `graft.shj.budgetBytes` set huge so `need ≤ parts`
  *            everywhere and every join keeps its pre-guard plan
  *            (plain SHUFFLE_HASH hint at the session partition count —
  *            byte-identical to the committed-row code).
  *
  * The budget knob is read per join construction, so flipping the
  * sysprop between arms re-plans honestly; caches are cleared between
  * reps (the ScaleStress protocol).
  *
  * Usage: Test/runMain graft.sim.ProfileGuardAB <query> <dir> <copies> [reps]
  * (query ∈ the ScaleStress embedding overrides: s_ivf2l, t_embdup,
  * s_lsh, s_ivf2, t_semdedup2)
  */
object ProfileGuardAB {

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("s_ivf2l")
    val dir = args.lift(1).getOrElse("/tmp/stress_x2187e")
    val copies = args.lift(2).getOrElse("2187").toInt
    val reps = args.lift(3).getOrElse("2").toInt
    val spark = graft.core.Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("guardAB")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    @volatile var spillB = 0L
    @volatile var shufB = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) { spillB += m.diskBytesSpilled; shufB += m.shuffleWriteMetrics.bytesWritten }
      }
    })

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.ScaleStress.stressPlan(query, spark, dir, copies)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      dt
    }

    val key = "graft.shj.budgetBytes"
    var rows = List.empty[(String, Double, Double, Double)]
    def arm(label: String)(f: => Double): Unit = {
      spillB = 0L; shufB = 0L
      val dt = f
      Thread.sleep(500)
      rows ::= ((label, dt, spillB / 1e9, shufB / 1e9))
      println(f"[ab] $label%-6s wall=$dt%8.2f s  spill=${spillB / 1e9}%6.2f GB  shuffle=${shufB / 1e9}%6.2f GB")
    }

    // warm both plans once at tiny scale so neither timed arm pays
    // first-compile (the ScaleStress warm rationale)
    val warmDir = "/root/testdata/sf0.001"
    try {
      graft.ScaleStress.stressPlan(query, spark, warmDir, 1)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    } catch { case e: Throwable => System.err.println(s"[ab] warm: ${e.getMessage}") }

    (1 to reps).foreach { r =>
      println(s"[ab] rep $r/$reps")
      System.clearProperty(key)
      arm("guard")(run())
      System.setProperty(key, Long.MaxValue.toString)
      try arm("off")(run()) finally System.clearProperty(key)
    }
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (label, as) =>
      println(f"[ab] MIN $label%-6s wall=${as.map(_._2).min}%8.2f s  " +
        f"spill=${as.map(_._3).max}%6.2f GB  shuffle=${as.map(_._4).max}%6.2f GB")
    }
    spark.stop()
  }
}
