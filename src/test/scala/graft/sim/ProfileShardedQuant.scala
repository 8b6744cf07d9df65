package graft.sim

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 measured row for the one OPEN boundary-ledger entry
  * (quantizer broadcast size ∝ nLists·dim — round-14 verdict optional
  * #6 asked for "a measured row, or a written adjudication"): A/B the
  * broadcast two-level probe frame against the sharded topology
  * ([[Similarity.probeFrameSharded]] — coarse level broadcast, fines
  * co-partitioned by cell) on a real stress corpus, under a
  * DELIBERATELY UNDERSIZED broadcast ceiling for the sharded arm so
  * AQE cannot quietly rebuild the structure broadcast the topology
  * exists to avoid.
  *
  * Three interleaved arms per rep, shared fit (the fit is topology-
  * independent and out of every timed window):
  *
  *   bcast    — the production probe frame: one [[graft.functions
  *              .VectorF.twoLevelProbes]] kernel pass over
  *              broadcast(structure); the form the ledger row says
  *              stops working past ~10⁸ rows/shard (structure bytes ∝
  *              nLists·dim outgrow a literal broadcast).
  *   shard    — [[Similarity.probeFrameSharded]] at session defaults:
  *              only the G = √nLists coarse cells broadcast; each row
  *              exchanges to its cProbe cell shards (cProbe·dim·8 B
  *              per row), fines join pinned SHUFFLE_HASH.
  *   shard1m  — the same sharded plan with
  *              spark.sql.autoBroadcastJoinThreshold = 1 MB: the
  *              undersized-ceiling regime. The arm exists to prove the
  *              topology's byte claim — with every frame priced past
  *              the ceiling, the plan census must show ZERO broadcast
  *              joins besides the coarse crossJoin, and the wall must
  *              hold, or the sharded form was secretly riding a
  *              broadcast.
  *
  * Value identity is asserted PER RUN at full corpus scale by
  * fingerprint (count + sum(hash(id, lists)) + sum(size(lists))) —
  * TwoLevelShardedSpec pins element-wise equality incl. ties and
  * degenerates at spec scale; the fingerprint extends it to the
  * measured decade.
  *
  * Usage: Test/runMain graft.sim.ProfileShardedQuant <dir> <copies> [reps] [parts]
  * (embeddings-only sign-flip stress dirs fine — the harness reads
  * only the embeddings table.)
  */
object ProfileShardedQuant {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress_x2187e")
    val copies = args.lift(1).getOrElse("2187").toInt
    val reps = args.lift(2).getOrElse("2").toInt
    val parts = args.lift(3).getOrElse("32").toInt
    val spark = graft.core.Tables.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("shardedQuant")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val nProbe = 4
    val cProbe = nProbe + 2
    val nLists = Capacity.ivfNLists(copies * Capacity.RefEmbeddingRows)

    val v = Similarity.prepped(
        graft.core.Tables.embeddings(spark, dir), "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = v.count()
    val dim = v.select(size(col("__v"))).head.getInt(0)
    // structure bytes: nLists fine centroids + G coarse centroids, dim
    // doubles each (+ per-centroid norm); the broadcast form ships ALL
    // of it to every task, the sharded form only the G-cell coarse level
    val g = math.max(1, math.round(math.sqrt(nLists.toDouble)).toInt)
    println(f"[shq] dir=$dir rows=$n dim=$dim nLists=$nLists (G≈$g) " +
      f"structure≈${nLists.toLong * (dim + 1) * 8 / 1e6}%.1f MB " +
      f"coarse-only≈${g.toLong * (dim + 1) * 8 / 1e3}%.1f KB " +
      f"row-exchange≈${n * cProbe.toLong * dim * 8 / 1e9}%.2f GB")

    val tl = Similarity.fitTwoLevelQuantizer(v, nLists, seed = 42L)
    tl.structure.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()

    @volatile var spillB = 0L
    @volatile var shufB = 0L
    @volatile var execMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          spillB += m.diskBytesSpilled
          shufB += m.shuffleWriteMetrics.bytesWritten
          execMs += m.executorRunTime
        }
      }
    })

    def bcastFrame: DataFrame =
      v.select(col("vec_id"), col("__v"))
        .crossJoin(broadcast(tl.structure))
        .select(col("vec_id"),
          graft.functions.VectorF.twoLevelProbes(col("__v"), col("__cells"),
            cProbe, nProbe).as("lists"))

    def shardFrame: DataFrame =
      Similarity.probeFrameSharded(v, "vec_id", tl, cProbe, nProbe)

    // full-corpus fingerprint: count + order-insensitive hash sum +
    // total list mass. Identical plans ⇒ identical triples.
    def fingerprint(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(col("vec_id"), col("lists")).cast("long")),
        sum(size(col("lists")).cast("long"))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    case class Arm(label: String, wall: Double, exec: Double,
                   spill: Double, shuffle: Double)
    def time(label: String)(f: => Unit): Arm = {
      spillB = 0L; shufB = 0L; execMs = 0L
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      val a = Arm(label, dt, execMs / 1000.0, spillB / 1e9, shufB / 1e9)
      println(f"[shq]   ${a.label}%-8s wall=${a.wall}%7.2f s exec=${a.exec}%9.1f s " +
        f"spill=${a.spill}%6.2f GB shuffle=${a.shuffle}%6.2f GB")
      a
    }

    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val savedThreshold = spark.conf.get(thresholdKey)
    var armRows = List.empty[Arm]
    (1 to reps).foreach { rep =>
      println(s"[shq] rep $rep/$reps")
      armRows ::= time("bcast") { bcastFrame.write.format("noop").mode("overwrite").save() }
      armRows ::= time("shard") { shardFrame.write.format("noop").mode("overwrite").save() }
      armRows ::= time("shard1m") {
        spark.conf.set(thresholdKey, (1024 * 1024).toString)
        try shardFrame.write.format("noop").mode("overwrite").save()
        finally spark.conf.set(thresholdKey, savedThreshold)
      }
    }

    // undersized-ceiling plan census: under a 1 MB ceiling the sharded
    // plan must carry NO broadcast join beyond the explicit coarse
    // crossJoin (BroadcastNestedLoopJoin on the 1-row coarse array).
    // The plan is captured from the EXECUTED QueryExecution via a
    // QueryExecutionListener: the noop write runs its own
    // QueryExecution, so `df.queryExecution.executedPlan` after the
    // write is a SEPARATE, unexecuted AQE plan (isFinalPlan=false)
    // whose string is the INITIAL plan — it cannot observe the runtime
    // broadcast conversions this census exists to rule out (round-16
    // ADVICE). The captured string is cut at AQE's "== Initial Plan =="
    // section so the census counts only the final operators.
    spark.conf.set(thresholdKey, (1024 * 1024).toString)
    @volatile var planCaptured = ""
    val planListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        planCaptured = qe.executedPlan.toString
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(planListener)
    val plan1m = try {
      shardFrame.write.format("noop").mode("overwrite").save()
      // ExecutionListenerManager delivers on the async listener bus
      var waited = 0
      while (planCaptured.isEmpty && waited < 200) { Thread.sleep(100); waited += 1 }
      require(planCaptured.nonEmpty, "census: executed plan never arrived on the listener bus")
      require(!planCaptured.contains("isFinalPlan=false"),
        "census: captured plan is not AQE-final — census would read the initial plan")
      planCaptured.split("== Initial Plan ==")(0)
    } finally {
      spark.conf.set(thresholdKey, savedThreshold)
      spark.listenerManager.unregister(planListener)
    }
    val census = Seq("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin",
      "BroadcastNestedLoopJoin").map(j =>
      s"$j=${plan1m.sliding(j.length).count(_ == j)}")
    println(s"[shq] shard plan census @1MB ceiling: ${census.mkString(" ")}")

    val fpB = fingerprint(bcastFrame)
    val fpS = fingerprint(shardFrame)
    println(s"[shq] fingerprint bcast=$fpB shard=$fpS equal=${fpB == fpS}")

    armRows.groupBy(_.label).toSeq.sortBy(_._1).foreach { case (label, as) =>
      println(f"[shq] MIN $label%-8s wall=${as.map(_.wall).min}%7.2f s " +
        f"exec=${as.map(_.exec).min}%9.1f s spill=${as.map(_.spill).max}%6.2f GB " +
        f"shuffle=${as.map(_.shuffle).max}%6.2f GB")
    }
    spark.stop()
    if (fpB != fpS) sys.exit(1)
  }
}
