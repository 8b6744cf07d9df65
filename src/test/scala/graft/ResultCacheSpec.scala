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

  test("cross-session: session A materializes, session B serves reads (cache_ret)") {
    // the reference pregenerates `cache_ret` in a scheduled job and serves
    // lookups from the cache in later sessions (`crsp.py:450-461`); here
    // the cache root is a filesystem prefix, so a SECOND SparkSession —
    // sharing nothing with the writer but the root path — must hit the
    // materialization without invoking the builder (round-9 verdict #6).
    val root = Files.createTempDirectory("rcache-x").toString
    var builds = 0
    def build = { builds += 1; Seq((1, 0.05), (2, -0.02), (3, 0.11)).toDF("permno", "ret") }
    // session A: the scheduled materialization round
    ResultCache.cached(spark, root, "cache_ret", Seq(19950101, 20011231))(build)
    assert(builds == 1)
    // session B: a fresh session (own state, own catalog) over the same root
    val b = spark.newSession()
    assert(b ne spark)
    val served = ResultCache.cached(b, root, "cache_ret", Seq(19950101, 20011231)) {
      fail("session B must serve from the cache, not rebuild"); ???
    }
    assert(served.sparkSession eq b)
    assert(served.orderBy("permno").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 0.05), (2, -0.02), (3, 0.11)))
    assert(builds == 1) // the builder never ran in session B
    // and the served frame is a parquet SCAN (pushdown-capable), not lineage
    val scanned = served.where(col("permno") === 2)
    assert(scanned.queryExecution.executedPlan.toString.contains("Parquet"))
  }
}
