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

  // --- real codecs: build actual WAV / PPM bytes in-test ---

  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16); b.putShort(1); b.putShort(1)
    b.putInt(rate); b.putInt(rate * 2); b.putShort(2); b.putShort(16)
    b.put("data".getBytes); b.putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  private def ppmBytes(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes
    val body = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, bl) = px(x, y)
      val i = (y * w + x) * 3
      body(i) = r.toByte; body(i + 1) = g.toByte; body(i + 2) = bl.toByte
    }
    header ++ body
  }

  test("real WAV decode: duration, rms, peak, zero crossings") {
    // 16 kHz mono square wave at amplitude 16384, 8000 samples (0.5 s)
    val sq = Array.tabulate(8000)(i => if ((i / 4) % 2 == 0) 16384 else -16384)
      .map(_.toShort)
    val m = Seq(Media(1L, "audio", wavBytes(16000, sq), 0, 0, 16000)).toDS()
    val f = Multimodal.featureExtractReal(m).collect().head
    assert(f.kind == "audio") // decoded, not stubbed
    assert(math.abs(f.features(0) - 0.5f) < 1e-6)   // duration
    assert(math.abs(f.features(1) - 0.5f) < 1e-6)   // rms of +/-0.5 square
    assert(math.abs(f.features(2) - 0.5f) < 1e-6)   // peak
    assert(math.abs(f.features(3) - 0.25f) < 0.01)  // zcr: flip every 4
  }

  test("real PPM decode: dimensions and channel means; resize") {
    val img = ppmBytes(4, 2, (x, _) => (x * 60, 100, 200))
    val m = Seq(Media(2L, "image", img, 4, 2, 0)).toDS()
    val f = Multimodal.featureExtractReal(m).collect().head
    assert(f.kind == "image")
    assert(f.features(0) == 4f && f.features(1) == 2f)
    assert(math.abs(f.features(2) - 90f) < 1e-4) // mean of 0,60,120,180
    assert(f.features(3) == 100f && f.features(4) == 200f)

    val decoded = graft.multimodal.Codecs.decodePpm(img).get
    val small = graft.multimodal.Codecs.resize(decoded, 2, 1)
    assert(small.width == 2 && small.height == 1)
    assert((small.rgb(0) & 0xff) == 0 && (small.rgb(3) & 0xff) == 120) // nn pick
  }

  test("real PNG and JPEG decode via the JDK ImageIO readers") {
    // render a 6x4 with exact per-pixel colors, encode with ImageIO
    def encoded(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6)
        img.setRGB(x, y, (x * 40 << 16) | (130 << 8) | 220)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    val m = Seq(
      Media(10L, "image", encoded("png"), 6, 4, 0),
      Media(11L, "image", encoded("jpg"), 6, 4, 0)
    ).toDS()
    val f = Multimodal.featureExtractReal(m).collect()
      .map(x => x.media_id -> x).toMap
    // PNG is lossless: exact dims + channel means (R mean of 0..200 step 40)
    assert(f(10L).kind == "image")
    assert(f(10L).features(0) == 6f && f(10L).features(1) == 4f)
    assert(math.abs(f(10L).features(2) - 100f) < 1e-4)
    assert(f(10L).features(3) == 130f && f(10L).features(4) == 220f)
    // JPEG is lossy: decoded (not stubbed), dims exact, means approximate
    assert(f(11L).kind == "image")
    assert(f(11L).features(0) == 6f && f(11L).features(1) == 4f)
    assert(math.abs(f(11L).features(2) - 100f) < 12f)
    assert(math.abs(f(11L).features(3) - 130f) < 12f)
    assert(math.abs(f(11L).features(4) - 220f) < 12f)
  }

  test("real G.711 mu-law/A-law WAV decode (compressed audio, format tags 7/6)") {
    import graft.multimodal.Codecs
    // encode PCM -> G.711 with the reference compressors, decode back
    def muLawEncode(pcm: Short): Byte = {
      val BIAS = 0x84
      var x = pcm.toInt
      val sign = if (x < 0) { x = -x; 0x80 } else 0
      if (x > 32635) x = 32635
      x += BIAS
      var seg = 0
      while (seg < 8 && x > (0xFF << seg)) seg += 1
      val mant = (x >> (seg + 3)) & 0x0F
      (~(sign | (seg << 4) | mant)).toByte
    }
    def wavG711(tag: Int, data: Array[Byte], rate: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(36 + data.length); b.put("WAVE".getBytes)
      b.put("fmt ".getBytes); b.putInt(16); b.putShort(tag.toShort); b.putShort(1)
      b.putInt(rate); b.putInt(rate); b.putShort(1); b.putShort(8)
      b.put("data".getBytes); b.putInt(data.length)
      b.put(data)
      b.array()
    }
    // mu-law round trip: decode(encode(x)) within segment quantization
    val pcm = Array[Short](0, 1000, -1000, 8000, -8000, 30000, -30000)
    pcm.foreach { x =>
      val rt = Codecs.muLawToPcm(muLawEncode(x))
      assert(math.abs(rt - x) <= math.max(64, math.abs(x / 16)), s"mu-law $x -> $rt")
    }
    // A-law golden points from the ITU tables: 0x55 decodes to 8 (smallest
    // positive gets sign bit SET -> 0xD5), 0x2A is the negative mirror
    assert(Codecs.aLawToPcm(0xD5.toByte) == 8)
    assert(Codecs.aLawToPcm(0x55.toByte) == -8)
    assert(Codecs.aLawToPcm(0xFF.toByte) == 848) // classic g711.c golden
    // end-to-end: a mu-law WAV decodes through featureExtractReal as "audio"
    val tone = Array.tabulate(4000)(i =>
      (16384 * math.sin(i * 2 * math.Pi / 50)).toShort)
    val mu = wavG711(7, tone.map(muLawEncode), 8000)
    val f = Multimodal.featureExtractReal(Seq(Media(20L, "audio", mu, 0, 0, 8000)).toDS())
      .collect().head
    assert(f.kind == "audio", "G.711 mu-law must decode, not stub")
    assert(math.abs(f.features(0) - 0.5f) < 1e-6) // 4000 samples @ 8 kHz
    assert(math.abs(f.features(1) - 0.3535f) < 0.01) // sine rms = A/sqrt(2) = 0.354
  }

  test("real MJPEG-AVI video decode: frames through ImageIO") {
    import graft.multimodal.Codecs
    def jpegFrame(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out))
      out.toByteArray
    }
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes); b.putInt(payload.length); b.put(payload)
      b.array()
    }
    val movi = "movi".getBytes ++
      chunk("00dc", jpegFrame(50)) ++ chunk("00dc", jpegFrame(200))
    val list = chunk("LIST", movi)
    val avi = {
      val body = "AVI ".getBytes ++ list
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(body.length); b.put(body)
      b.array()
    }
    val frames = Codecs.decodeAviMjpeg(avi)
    assert(frames.isDefined && frames.get.length == 2, s"frames: ${frames.map(_.length)}")
    assert(frames.get.head.width == 8 && frames.get.head.height == 6)
    // featureExtractReal: kind stays "video" (decoded), n_frames/dims/means
    val f = Multimodal.featureExtractReal(Seq(Media(30L, "video", avi, 8, 6, 0)).toDS())
      .collect().head
    assert(f.kind == "video", "MJPEG-AVI must decode, not stub")
    assert(f.features(0) == 2f && f.features(1) == 8f && f.features(2) == 6f)
    // mean gray across the two frames ~ (50 + 200) / 2 (JPEG is lossy)
    assert(math.abs(f.features(3) - 125f) < 8f, s"meanR ${f.features(3)}")
    // a non-AVI payload still gates to None
    assert(Codecs.decodeAviMjpeg("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("malformed payloads fall back to the stub and are flagged") {
    val m = Seq(
      Media(3L, "audio", Array[Byte](1, 2, 3), 0, 0, 8000),
      Media(4L, "video", Array.tabulate(32)(_.toByte), 16, 16, 0)
    ).toDS()
    val out = Multimodal.featureExtractReal(m).collect().map(f => f.media_id -> f.kind).toMap
    assert(out(3L) == "audio:stub")
    assert(out(4L) == "video:stub") // compressed/video: stub seam
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
