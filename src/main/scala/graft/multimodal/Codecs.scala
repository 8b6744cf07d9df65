package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM decoders for the uncompressed media containers — no
  * external codec libraries:
  *   - WAV (RIFF / PCM 16-bit) → sample array + sample rate/channels;
  *   - PPM (P6, binary, maxval 255) → RGB pixel buffer + dimensions.
  * Compressed formats (JPEG/MP3/H.264) still need native codecs absent
  * from this environment — [[Multimodal.decodeStub]] remains the marked
  * seam for those — but the decode → feature-extract → resize /
  * frame-sample pipeline below runs END TO END on real bytes.
  */
object Codecs {

  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])
  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])

  /** Parse a RIFF/WAVE container: PCM-16 (format 1) plus the REAL
    * compressed telephony codecs — G.711 A-law (format 6) and μ-law
    * (format 7), 8-bit log-companded samples expanded to 16-bit PCM by
    * the standard G.711 segment tables. Returns None when the container
    * is malformed or the codec is unknown — a media lake gates on this
    * rather than throwing.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (b.getInt(0) != 0x46464952 /* "RIFF" */ ||
        b.getInt(8) != 0x45564157 /* "WAVE" */) return None
    var pos = 12
    var fmtTag = -1
    var fmtRate = -1
    var fmtChannels = -1
    var fmtBits = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (fmtRate < 0 || dataOff < 0)) {
      val id = b.getInt(pos)
      val size = b.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (id == 0x20746d66 /* "fmt " */ && size >= 16) {
        fmtTag = b.getShort(pos + 8)
        fmtChannels = b.getShort(pos + 10)
        fmtRate = b.getInt(pos + 12)
        fmtBits = b.getShort(pos + 22)
      } else if (id == 0x61746164 /* "data" */) {
        dataOff = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtRate <= 0 || fmtChannels <= 0 || dataOff < 0) return None
    fmtTag match {
      case 1 if fmtBits == 16 =>
        val n = dataLen / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = b.getShort(dataOff + 2 * i); i += 1 }
        Some(WavAudio(fmtRate, fmtChannels, samples))
      case 6 | 7 if fmtBits == 8 => // G.711 A-law / μ-law
        val samples = new Array[Short](dataLen)
        var i = 0
        while (i < dataLen) {
          val raw = bytes(dataOff + i)
          samples(i) = if (fmtTag == 7) muLawToPcm(raw) else aLawToPcm(raw)
          i += 1
        }
        Some(WavAudio(fmtRate, fmtChannels, samples))
      case _ => None
    }
  }

  /** G.711 μ-law byte → 16-bit linear PCM (ITU-T standard expansion:
    * BIAS 0x84, 3-bit segment, 4-bit mantissa).
    */
  def muLawToPcm(u: Byte): Short = {
    val x = ~u & 0xFF
    var t = ((x & 0x0F) << 3) + 0x84
    t <<= (x & 0x70) >> 4
    (if ((x & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 A-law byte → 16-bit linear PCM (ITU-T standard expansion:
    * XOR 0x55, segment-scaled mantissa; sign bit SET means positive).
    */
  def aLawToPcm(a: Byte): Short = {
    val x = (a ^ 0x55) & 0xFF
    var t = (x & 0x0F) << 4
    val seg = (x & 0x70) >> 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case s => t += 0x108; t <<= s - 1
    }
    (if ((x & 0x80) != 0) t else -t).toShort
  }

  /** Extract MJPEG frames from a RIFF/AVI container — REAL compressed
    * VIDEO decode in pure JVM: the AVI chunk tree is walked by hand and
    * each `..dc`/`..db` video chunk whose payload opens with a JPEG SOI
    * marker decodes through the same ImageIO path as still images.
    * Returns None for a non-AVI payload or when no frame decodes
    * (non-JPEG video codecs — H.264 etc. — still have no JVM decoder;
    * the stub seam remains for those only).
    */
  def decodeAviMjpeg(bytes: Array[Byte], maxFrames: Int = 64): Option[Seq[PpmImage]] = {
    if (bytes.length < 12) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (b.getInt(0) != 0x46464952 /* "RIFF" */ ||
        b.getInt(8) != 0x20495641 /* "AVI " */) return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[PpmImage]
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end && frames.length < maxFrames) {
        val id = b.getInt(pos)
        val size = b.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > end) return
        if (id == 0x5453494C /* "LIST" */ && size >= 4) {
          walk(pos + 12, pos + 8 + size) // skip the list-type fourcc
        } else {
          // video frame chunk: '##dc' (compressed) or '##db' (uncompressed)
          val cc3 = (id >>> 16) & 0xFF
          val cc4 = (id >>> 24) & 0xFF
          if (cc3 == 'd' && (cc4 == 'c' || cc4 == 'b') && size >= 2 &&
              bytes(pos + 8) == 0xFF.toByte && bytes(pos + 9) == 0xD8.toByte) {
            val payload = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
            decodeImageIO(payload).foreach(frames += _)
          }
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  /** Per-video features from decoded MJPEG frames:
    * [n_frames, width, height, meanR, meanG, meanB] averaged over frames.
    */
  def videoFeatures(frames: Seq[PpmImage]): Array[Float] = {
    val per = frames.map(imageFeatures)
    val mr = per.map(_(2)).sum / frames.length
    val mg = per.map(_(3)).sum / frames.length
    val mb = per.map(_(4)).sum / frames.length
    Array(frames.length.toFloat, frames.head.width.toFloat,
      frames.head.height.toFloat, mr, mg, mb)
  }

  /** Parse a binary P6 PPM (maxval ≤ 255). */
  def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWs(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else in = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val maxv = int()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    pos += 1 // single whitespace after maxval
    val need = w * h * 3
    if (pos + need > bytes.length) return None
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + need)
    Some(PpmImage(w, h, rgb))
  }

  /** Decode a COMPRESSED raster image (PNG/JPEG/GIF/BMP) with the JDK's
    * built-in `javax.imageio` readers — still pure JVM, no native codec
    * libraries — into the same RGB buffer the PPM path produces. Magic
    * bytes are sniffed first so arbitrary binary payloads skip the
    * ImageIO machinery; any decode failure returns None (gate, don't
    * throw — same contract as [[decodeWav]]/[[decodePpm]]).
    */
  def decodeImageIO(bytes: Array[Byte]): Option[PpmImage] = {
    val known = bytes.length >= 8 && (
      (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) ||          // JPEG
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') ||                                            // PNG
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8') ||                                            // GIF
      (bytes(0) == 'B' && bytes(1) == 'M'))                            // BMP
    if (!known) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        rgb(3 * i) = ((p >> 16) & 0xff).toByte
        rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
        rgb(3 * i + 2) = (p & 0xff).toByte
        i += 1
      }
      Some(PpmImage(w, h, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Any-container image decode: binary P6 PPM, else an ImageIO raster
    * (PNG/JPEG/GIF/BMP).
    */
  def decodeImage(bytes: Array[Byte]): Option[PpmImage] =
    decodePpm(bytes).orElse(decodeImageIO(bytes))

  /** Audio features: [duration_sec, rms, peak, zero-crossing rate]. */
  def audioFeatures(a: WavAudio): Array[Float] = {
    val n = a.samples.length
    if (n == 0) return Array(0f, 0f, 0f, 0f)
    var sq = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val s = a.samples(i) / 32768.0
      sq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) zc += 1
      i += 1
    }
    Array((n.toDouble / (a.sampleRate * a.channels)).toFloat,
      math.sqrt(sq / n).toFloat, peak.toFloat, (zc.toDouble / n).toFloat)
  }

  /** Image features: [width, height, mean R, mean G, mean B]. */
  def imageFeatures(img: PpmImage): Array[Float] = {
    val n = img.width * img.height
    var r = 0L; var g = 0L; var bsum = 0L
    var i = 0
    while (i < n) {
      r += img.rgb(3 * i) & 0xff
      g += img.rgb(3 * i + 1) & 0xff
      bsum += img.rgb(3 * i + 2) & 0xff
      i += 1
    }
    Array(img.width.toFloat, img.height.toFloat,
      (r.toDouble / n).toFloat, (g.toDouble / n).toFloat, (bsum.toDouble / n).toFloat)
  }

  /** Nearest-neighbor resize of a decoded PPM. */
  def resize(img: PpmImage, ow: Int, oh: Int): PpmImage = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * img.height / oh
      var x = 0
      while (x < ow) {
        val sx = x * img.width / ow
        val si = (sy * img.width + sx) * 3
        val di = (y * ow + x) * 3
        out(di) = img.rgb(si); out(di + 1) = img.rgb(si + 1); out(di + 2) = img.rgb(si + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(ow, oh, out)
  }
}
