package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media row: opaque bytes + typed metadata (builder brief:
  * "multimodal columns" — image/audio/video as binary + metadata).
  */
case class Media(media_id: Long, kind: String, bytes: Array[Byte],
                 width: Int, height: Int, sample_rate: Int)

/** Extracted features per media row. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         features: Array[Float])

/** Multimodal-column plumbing for the LLM-data pipeline: schema,
  * partitioning and per-partition batch iteration are real Spark.
  * Decoded for REAL in pure JVM ([[Codecs]]): images (P6 PPM by hand,
  * PNG/JPEG/GIF/BMP via the JDK's built-in `javax.imageio` readers),
  * audio (RIFF WAV — PCM-16 plus the compressed G.711 A-law/μ-law
  * telephony codecs), and video (MJPEG-in-AVI — the chunk tree walked
  * by hand, frames through ImageIO). Only non-JPEG video and perceptual
  * audio codecs (H.264, MP3) have no JVM decoder, so [[decodeStub]]
  * remains the marked seam for those alone.
  *
  * Scale shape: decode/feature-extract is a per-partition map over the
  * binary column (the Scala analog of mapInPandas batches) — no shuffle;
  * partition sizing is the only tuning knob, set upstream via
  * `spark.sql.files.maxPartitionBytes` when reading media parquet.
  */
object Multimodal {

  /** Real decode + feature extraction: WAV audio (PCM/G.711) →
    * [duration, rms, peak, zcr]; image → [w, h, meanR, meanG, meanB];
    * MJPEG-AVI video → [n_frames, w, h, meanR, meanG, meanB]; anything
    * else (or a malformed payload) falls back to the stub features,
    * flagged by kind = "<kind>:stub" so the caller can gate on decode
    * success.
    */
  def featureExtractReal(media: Dataset[Media], stubDim: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded: Option[Array[Float]] = m.kind match {
          case "audio" => Codecs.decodeWav(m.bytes).map(Codecs.audioFeatures)
          case "image" => Codecs.decodeImage(m.bytes).map(Codecs.imageFeatures)
          case "video" => Codecs.decodeAviMjpeg(m.bytes).map(Codecs.videoFeatures)
          case _ => None
        }
        decoded match {
          case Some(f) => MediaFeatures(m.media_id, m.kind, m.bytes.length, f)
          case None => MediaFeatures(m.media_id, m.kind + ":stub", m.bytes.length,
            decodeStub(m.bytes, stubDim))
        }
      }
    }
  }

  /** STUB decode: where a real pipeline calls the image/audio codec
    * (e.g. libjpeg / ffmpeg bindings). Deterministic fake: hashes byte
    * windows into `dim` floats in [0,1). Replace the body, keep the
    * signature.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // real implementation: ??? (codec not available in this container)
    val out = new Array[Float](dim)
    var acc = 1125899906842597L
    var i = 0
    while (i < bytes.length) { acc = acc * 31 + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      acc = acc * 6364136223846793005L + 1442695040888963407L
      out(d) = math.abs((acc >>> 16).toInt % 1000000) / 1000000.0f
      d += 1
    }
    out
  }

  /** Feature extraction over a typed media Dataset: per-partition
    * iteration (batch-at-a-time like mapInPandas), stubbed kernel.
    */
  def featureExtract(media: Dataset[Media], dim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length, decodeStub(m.bytes, dim))
      }
    }
  }

  /** Frame/chunk sampling of a binary payload into fixed-size windows —
    * the video-frame / audio-chunk sampler shape: explode to
    * (media_id, frame_no, frame_bytes) rows. Pure Column ops.
    */
  def sampleFrames(df: DataFrame, bytesCol: String, frameSize: Int,
                   maxFrames: Int): DataFrame = {
    val nFrames = least(ceil(length(col(bytesCol)) / frameSize), lit(maxFrames))
    df.withColumn("frame_no", explode(sequence(lit(0), (nFrames - 1).cast("int"))))
      .withColumn("frame_bytes",
        col(bytesCol).substr(col("frame_no") * frameSize + 1, lit(frameSize)))
  }

  /** Typed metadata validation screen: keeps rows whose metadata is
    * consistent with the declared kind (the schema-on-read gate a media
    * lake needs before decode).
    */
  def validMedia(df: DataFrame): DataFrame =
    df.where(
      (col("kind") === "image" && col("width") > 0 && col("height") > 0) ||
      (col("kind") === "audio" && col("sample_rate") > 0) ||
      (col("kind") === "video" && col("width") > 0 && col("height") > 0))
}
