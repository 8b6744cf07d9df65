package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Dev harness: pure-JVM microbenchmark of the minhash signature kernel
  * — the measured hot spot of the worst ScaleStress ratios (t_minhash,
  * e_lshdup). Compares the shipped [[graft.functions.HashKernels
  * .minhashPolySig]] (Mersenne-fold mod, hoisted seed constants) against
  * a local copy of the pre-round-7 literal-% loop on identical data, and
  * asserts value equality while timing both. Single-threaded and
  * Spark-free so the numbers isolate the kernel from scheduler/shuffle
  * noise; min-of-reps rejects VM steal.
  *
  * MEASURED (round 7, 500 docs x 200 shingles x 64 seeds, min of 7):
  * literal-% loop 36 ms/rep (5.6 ns per seed-shingle op), fold kernel
  * 27 ms/rep (4.2 ns) — 1.33x. Smaller than the naive div-vs-shift
  * arithmetic suggests because C2 already strength-reduces the constant
  * mods to multiply-high sequences; the fold still shaves ~25% off the
  * kernel, and the kernel is the map-stage floor of the signature
  * family, so it's kept. End-to-end t_minhash gain is bounded by the
  * candidate/verify shuffles (ProfileWiden's finding).
  */
object ProfileMinhash {
  private val M31 = 2147483647L

  // pre-round-7 kernel, verbatim arithmetic (the DuckDB-replayable form)
  private def minhashPolySigOld(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val x = graft.functions.HashKernels.polyHash61(shingles.getUTF8String(i)) % M31
        var s = 0
        while (s < numHashes) {
          val v = ((s * 2654435761L + x + 1) * 48271L % M31 * 16807L) % M31
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = 500
    val nShingles = 200
    val numHashes = 64
    val rnd = new scala.util.Random(11)
    val docs: Array[ArrayData] = Array.fill(nDocs) {
      new GenericArrayData(Array.fill[Any](nShingles)(
        UTF8String.fromString(rnd.alphanumeric.take(3 + rnd.nextInt(20)).mkString)))
    }
    // warm both paths through the JIT, and assert equality once
    for (_ <- 1 to 3; d <- docs) {
      val a = graft.functions.HashKernels.minhashPolySig(d, numHashes)
      val b = minhashPolySigOld(d, numHashes)
      var s = 0
      while (s < numHashes) {
        require(a.getLong(s) == b.getLong(s), s"mismatch at seed $s")
        s += 1
      }
    }
    var tNew = Double.MaxValue
    var tOld = Double.MaxValue
    var sink = 0L
    for (_ <- 1 to 7) {
      val t0 = System.nanoTime()
      for (d <- docs) sink ^= minhashPolySigOld(d, numHashes).getLong(0)
      tOld = tOld.min((System.nanoTime() - t0) / 1e9)
      val t1 = System.nanoTime()
      for (d <- docs) sink ^= graft.functions.HashKernels.minhashPolySig(d, numHashes).getLong(0)
      tNew = tNew.min((System.nanoTime() - t1) / 1e9)
    }
    println(f"PROFILE minhash kernel: literal-%% $tOld%.3f s/rep, fold $tNew%.3f s/rep, speedup ${tOld / tNew}%.2fx (sink=$sink)")
  }
}
