package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Store

/** S7 keyed object store (`utils/store.py:19-128`): named dump/load of
  * small JSON values (plain + gzip) and DataFrames-as-parquet, contains,
  * name iteration, remove — and cross-format parity with what Python's
  * `json.dump` would have written.
  */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  test("named small values round-trip (json and gzip), contains + names + remove") {
    for (gz <- Seq(false, true)) {
      val store = new Store(Files.createTempDirectory("store").toString, gz = gz)
      val stats = Map(
        "car" -> -0.0123, "n" -> 42L, "window" -> Seq(-1L, 1L),
        "model" -> "ffm", "robust" -> true, "note" -> null)
      store.dump(stats, "eventstudy_params")
      assert(store.contains("eventstudy_params") && !store.contains("absent"))
      val back = store.load("eventstudy_params").asInstanceOf[Map[String, Any]]
      assert(back("car") == -0.0123 && back("n") == 42L)
      assert(back("window") == Seq(-1L, 1L))
      assert(back("model") == "ffm" && back("robust") == true && back("note") == null)
      // store['x'] = value; names iteration; delete
      store.dump(Seq(1L, 2L, 3L), "xs")
      assert(store.names == Seq("eventstudy_params", "xs"))
      store.remove("xs")
      assert(store.names == Seq("eventstudy_params"))
      // ints dump as JSON numbers and come back as Long (documented)
      store.dump(Map("k" -> 7), "i")
      assert(store.load("i") == Map("k" -> 7L))
    }
  }

  test("wire format matches python json.dump (cross-engine readable)") {
    val dir = Files.createTempDirectory("store").toString
    val store = new Store(dir)
    store.dump(Map("a" -> 1L, "b" -> Seq("x", "y"), "c" -> 2.5), "obj")
    val txt = new String(Files.readAllBytes(java.nio.file.Paths.get(store.pathname("obj"))))
    // canonical compact JSON — exactly what json.load on the other side parses
    assert(txt.contains("\"a\":1") && txt.contains("[\"x\",\"y\"]") && txt.contains("2.5"))
    // and a hand-written (python-style) file reads back fine
    Files.write(java.nio.file.Paths.get(store.pathname("frompy")),
      """{"mean": 0.01, "ids": [1, 2, 3], "ok": true}""".getBytes)
    val back = store.load("frompy").asInstanceOf[Map[String, Any]]
    assert(back("mean") == 0.01 && back("ids") == Seq(1L, 2L, 3L) && back("ok") == true)
  }

  test("DataFrames store as parquet and re-read as scans with pushdown") {
    val store = new Store(Files.createTempDirectory("store").toString)
    val df = Seq((1L, "a", 0.1), (2L, "b", 0.2), (3L, "c", 0.3))
      .toDF("id", "tag", "v")
    store.dumpFrame(df, "signals")
    assert(store.contains("signals"))
    val back = store.loadFrame(spark, "signals")
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 0.1), (2L, "b", 0.2), (3L, "c", 0.3)))
    // the re-read is a parquet relation: filters reach the scan
    val plan = back.where(col("id") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("Parquet") && plan.contains("PushedFilters"))
    store.remove("signals")
    assert(!store.contains("signals"))
  }

  test("unsupported value types are rejected with a clear error") {
    val store = new Store(Files.createTempDirectory("store").toString)
    val e = intercept[IllegalArgumentException](store.dump(new Object, "bad"))
    assert(e.getMessage.contains("JSON-representable"))
  }
}
