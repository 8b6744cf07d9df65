package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.multimodal.{Media, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    Media(1L, "image", Array.tabulate(64)(_.toByte), 8, 8, 0),
    Media(2L, "audio", Array.tabulate(100)(i => (i * 3).toByte), 0, 0, 16000),
    Media(3L, "image", Array.tabulate(64)(_.toByte), 0, 0, 0) // invalid meta
  ).toDS()

  test("feature extraction is deterministic with the right shape") {
    val f1 = Multimodal.featureExtract(media, 16).collect()
      .map(m => m.media_id -> m).toMap
    val f2 = Multimodal.featureExtract(media, 16).collect()
      .map(m => m.media_id -> m).toMap
    assert(f1(1L).features.length == 16)
    assert(f1(1L).n_bytes == 64)
    assert(f1(1L).features.sameElements(f2(1L).features)) // deterministic
    assert(f1(1L).features.sameElements(f1(3L).features)) // same bytes
    assert(!f1(1L).features.sameElements(f1(2L).features))
    assert(f1(1L).features.forall(v => v >= 0f && v < 1f))
  }

  test("frame sampling windows the payload") {
    val out = Multimodal.sampleFrames(media.toDF(), "bytes", 16, 3)
      .where(col("media_id") === 2)
      .select(col("frame_no"), length(col("frame_bytes")).as("len"))
      .as[(Int, Int)].collect().sortBy(_._1)
    assert(out.map(_._1).sameElements(Array(0, 1, 2))) // capped at maxFrames
    assert(out.forall(_._2 == 16))
  }

  test("metadata validation gates inconsistent rows") {
    val ids = Multimodal.validMedia(media.toDF())
      .select("media_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }
}

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank on a 3-node cycle is uniform; star center ranks highest") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(cycle, iters = 20).as[(Long, Double)].collect().toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))

    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)).toDF("src", "dst")
    val pr2 = GraphOps.pageRank(star, iters = 20).as[(Long, Double)].collect().toMap
    assert(pr2(9L) > pr2(1L) && pr2(1L) > pr2(2L))
    assert(math.abs(pr2.values.sum - 1.0) < 1e-6) // mass conserved
  }
}
