package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.ResultCache

class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  test("read-first round trip: second call reads parquet, not the builder") {
    val root = Files.createTempDirectory("rcache").toString
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    val first = ResultCache.cached(spark, root, "op", Seq("x", 5))(build)
    assert(first.count() == 2 && builds == 1)
    val second = ResultCache.cached(spark, root, "op", Seq("x", 5))(build)
    assert(builds == 1) // cache hit — builder not invoked again
    assert(second.orderBy("k").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    // different args -> different key -> rebuild
    ResultCache.cached(spark, root, "op", Seq("x", 6))(build)
    assert(builds == 2)
    // dump overwrites ('w' mode)
    ResultCache.dump(Seq((9, "z")).toDF("k", "v"), root, ResultCache.key("op", Seq("x", 5)))
    val re = ResultCache.load(spark, root, ResultCache.key("op", Seq("x", 5)))
    assert(re.get.as[(Int, String)].collect().toSeq == Seq((9, "z")))
  }
}
