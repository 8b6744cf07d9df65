package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorF

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotp: value, null element, null array, and length mismatch") {
    val out = spark.range(1).select(
      VectorF.dotp(expr("array(1.0D, 2.0D, 3.0D)"), expr("array(4.0D, 5.0D, 6.0D)")).as("ok"),
      VectorF.dotp(expr("array(1.0D, cast(null as double), 3.0D)"),
        expr("array(4.0D, 5.0D, 6.0D)")).as("null_elem"),
      VectorF.dotp(expr("cast(null as array<double>)"), expr("array(1.0D)")).as("null_arr"),
      VectorF.dotp(expr("array(1.0D, 2.0D)"), expr("array(1.0D)")).as("len_mismatch")
    ).head()
    assert(out.getDouble(0) == 32.0)
    assert(out.isNullAt(1) && out.isNullAt(2) && out.isNullAt(3))
  }

  test("dotp matches the HOF aggregate fold bit-for-bit (codegen path)") {
    val vecs = (0 until 50)
      .map(i => (i.toLong, Array.tabulate(64)(d => math.sin(i * 7.0 + d))))
      .toDF("id", "v")
    val hof = vecs.select(col("id"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x).as("d"))
      .as[(Long, Double)].collect().toMap
    val nat = vecs.select(col("id"), VectorF.dotp(col("v"), col("v")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(hof.keySet == nat.keySet)
    hof.foreach { case (k, h) => assert(h == nat(k), s"id $k: $h != ${nat(k)}") }
  }

  test("dotp casts float arrays via Similarity.dot") {
    val vecs = Seq((1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("id", "a", "b")
    val out = vecs.select(graft.sim.Similarity.dot(col("a"), col("b"))).as[Double].head()
    assert(out == 11.0)
  }

  private val sampleDocs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs and more jugs",
    "sphinx of black quartz judge my vow sphinx of black quartz",
    "one two three", "")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("simhash64 kernel matches the HOF formulation exactly") {
    import graft.text.NearDup
    val docs = sampleDocs.toDF("id", "text")
    val out = docs.select(NearDup.simHashXx(col("text")).as("a"),
      NearDup.simHashHof(col("text")).as("b")).as[(Long, Long)].collect()
    out.foreach { case (a, b) => assert(a == b) }
  }

  test("poly hash kernels match an independent Scala re-computation") {
    import graft.text.NearDup
    // pin the poly family against a from-scratch reimplementation of the
    // published recurrence (the DuckDB oracle replays the same arithmetic
    // as the third implementation)
    def poly61(s: String): Long = {
      var h1 = 0L; var h2 = 0L
      s.getBytes("UTF-8").foreach { b =>
        h1 = (h1 * 31 + (b & 0xffL)) % 1000000007L
        h2 = (h2 * 131 + (b & 0xffL)) % 998244353L
      }
      h1 * 2147483648L + h2
    }
    def mix62(s: String): Long = {
      var h1 = 0L; var h2 = 0L
      s.getBytes("UTF-8").foreach { b =>
        h1 = (h1 * 31 + (b & 0xffL)) % 1000000007L
        h2 = (h2 * 131 + (b & 0xffL)) % 998244353L
      }
      val m1 = ((h1 + 1) * 48271L % 2147483647L * 16807L) % 2147483647L
      val m2 = ((h2 + 40503L) * 48271L % 2147483647L * 16807L) % 2147483647L
      m1 * 2147483648L + m2
    }
    val toks = Seq("the", "quick", "brown_fox", "a")
    val expectedSim = {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h = mix62(t)
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
      }
      (0 until 64).map(b => if (counts(b) > 0) 1L << b else 0L).reduce(_ | _)
    }
    val gotSim = Seq(Tuple1(toks)).toDF("t")
      .select(graft.functions.HashF.simhashPoly(col("t"))).as[Long].head()
    assert(gotSim == expectedSim)

    val expectedMins = (0 until 8).map { s =>
      toks.map { t =>
        val x = poly61(t) % 2147483647L
        ((s * 2654435761L + x + 1) * 48271L % 2147483647L * 16807L) % 2147483647L
      }.min
    }
    val gotMins = Seq(Tuple1(toks)).toDF("t")
      .select(NearDup.minHashSig(col("t"), 8)).as[Seq[Long]].head()
    assert(gotMins == expectedMins)
  }

  test("shingle kernel matches the HOF fold formulation exactly") {
    import graft.text.TextOps
    val docs = (sampleDocs :+ (9L, "Ab cd EF ghi jkl mno ab cd ef ghi"))
      .toDF("id", "text")
    val out = docs.select(
        TextOps.wordShingles(col("text"), 3).as("a"),
        TextOps.shinglesOf(TextOps.tokens(col("text")), 3).as("b"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("langId kernel matches the HOF formulation exactly") {
    import graft.text.TextOps
    val docs = (sampleDocs ++ Seq(
      (10L, "the the the and and of to is a is a"), // overlapping-separator quirk
      (11L, "el la de que y los el la de"),
      (12L, "der die und das ist ein der die"),
      (13L, "le la les de et est le la"),
      (14L, "中文文本 the and"),
      (15L, "a b c")))
      .toDF("id", "text")
    val out = docs.select(TextOps.langId(col("text")).as("a"),
      TextOps.langIdHof(col("text")).as("b")).as[(String, String)].collect()
    out.foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("packed pairs equal struct pairs unpacked (int ids)") {
    import graft.functions.HashF
    val lists = Seq(
      (1L, Seq(3, 7, 11, 42)),
      (2L, Seq(5, 9)),
      (3L, Seq(8)),            // single element: no pairs
      (4L, Seq(0, 1, Int.MaxValue))
    ).toDF("id", "ns")
    val packed = lists.select(col("id"), explode(HashF.packedPairs(col("ns"))).as("pk"))
      .select(col("id"), shiftrightunsigned(col("pk"), 32).cast("int").as("a"),
        col("pk").bitwiseAND(lit(0xffffffffL)).cast("int").as("b"))
      .as[(Long, Int, Int)].collect().toSet
    val structs = lists.select(col("id"), explode(HashF.sortedPairs(col("ns"))).as("p"))
      .select(col("id"), col("p.a"), col("p.b"))
      .as[(Long, Int, Int)].collect().toSet
    assert(packed == structs)
    assert(packed.count(_._1 == 1L) == 6) // 4 choose 2
  }

  test("minhash kernel matches the HOF formulation exactly") {
    import graft.text.{NearDup, TextOps}
    val docs = sampleDocs.toDF("id", "text")
    val sh = docs.select(TextOps.wordShingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val out = sh.select(NearDup.minHashSigXx(col("sh"), 16).as("a"),
        NearDup.minHashSigHof(col("sh"), 16).as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b) => assert(a == b) }
  }
}
