package graft.sim

import org.apache.spark.sql.functions._

/** Sharded two-level assignment ([[Similarity.probeFrameSharded]] — the
  * partitioned-quantizer topology for the OPEN boundary-ledger row:
  * past ~10⁸ rows/shard the nLists·dim structure outgrows a literal
  * broadcast). The contract is VALUE IDENTITY with the broadcast probe
  * frame: same probe-list arrays, same order, same ties, same
  * degenerates — the sharded form only changes WHERE the quantizer
  * lives (fines co-partitioned by cell vs one structure broadcast).
  */
class TwoLevelShardedSpec extends graft.SparkSpec {
  import spark.implicits._

  private def isotropic(n: Int, dim: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nn = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / nn))
    }.toDF("vec_id", "embedding")
  }

  private def broadcastLists(v: org.apache.spark.sql.DataFrame,
                             tl: Similarity.TwoLevelQuantizer,
                             cProbe: Int, nProbe: Int): Map[Long, Seq[Int]] =
    v.select(col("vec_id"), col("__v"))
      .crossJoin(broadcast(tl.structure))
      .select(col("vec_id"),
        graft.functions.VectorF.twoLevelProbes(col("__v"), col("__cells"),
          cProbe, nProbe).as("lists"))
      .as[(Long, Seq[Int])].collect().toMap

  test("sharded probe frame == broadcast probe frame (lists, order, ties)") {
    val df = isotropic(1700, 16, seed = 11)
    val v = Similarity.prepped(df, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tl = Similarity.fitTwoLevelQuantizer(v, nLists = 16, seed = 42L)
    for ((cProbe, nProbe) <- Seq((6, 4), (3, 1), (1, 5))) {
      val bc = broadcastLists(v, tl, cProbe, nProbe)
      val sh = Similarity.probeFrameSharded(v, "vec_id", tl, cProbe, nProbe)
        .as[(Long, Seq[Int])].collect().toMap
      assert(sh.keySet == bc.keySet)
      val diffs = bc.keys.filter(k => sh(k) != bc(k))
      assert(diffs.isEmpty,
        s"cProbe=$cProbe nProbe=$nProbe mismatched ids: ${diffs.take(5).map(k => (k, bc(k), sh(k)))}")
    }
    v.unpersist()
  }

  test("exact ties merge identically (duplicated centget geometry)") {
    // duplicate every vector so fine centroids coincide and (d, list)
    // ties are guaranteed somewhere in the merge
    val base = isotropic(300, 8, seed = 23)
    val df = base.unionAll(base.withColumn("vec_id", col("vec_id") + 1000))
    val v = Similarity.prepped(df, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tl = Similarity.fitTwoLevelQuantizer(v, nLists = 9, seed = 7L)
    val bc = broadcastLists(v, tl, cProbe = 4, nProbe = 3)
    val sh = Similarity.probeFrameSharded(v, "vec_id", tl, cProbe = 4, nProbe = 3)
      .as[(Long, Seq[Int])].collect().toMap
    assert(sh == bc)
    v.unpersist()
  }

  test("degenerate rows: NaN vector gets the union kernel's fill-order lists; extra columns ride") {
    val rnd = new java.util.Random(3)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()), s"tag$i")
    } :+ ((50L, Array(Double.NaN) ++ Array.fill(7)(1.0), "tagNaN"))
    val df = rows.toDF("vec_id", "embedding", "tag")
    val v = Similarity.prepped(df.select("vec_id", "embedding"), "vec_id", "embedding")
      .join(df.select("vec_id", "tag"), "vec_id")
    val tl = Similarity.fitTwoLevelQuantizer(
      Similarity.prepped(df.select("vec_id", "embedding"), "vec_id", "embedding"),
      nLists = 4, seed = 5L)
    val bc = broadcastLists(v, tl, cProbe = 2, nProbe = 2)
    val sh = Similarity.probeFrameSharded(v, "vec_id", tl, cProbe = 2, nProbe = 2,
        extra = Seq("tag"))
      .select("vec_id", "tag", "lists")
      .as[(Long, String, Seq[Int])].collect()
    assert(sh.length == 51)
    sh.foreach { case (id, tag, lists) =>
      assert(tag == (if (id == 50L) "tagNaN" else s"tag$id"))
      assert(lists == bc(id), s"id=$id")
    }
    // the union kernel's documented NaN semantics: fill-order lists,
    // not empty — the merge's (cellRank, fineIdx) path must reproduce
    // whatever the broadcast kernel returned for the NaN row
    assert(sh.find(_._1 == 50L).get._3 == bc(50L))
  }
}
