package graft.operators

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * Decode kernels are REAL, JDK-builtin codecs (no external jars):
  *   - images: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF) → decoded
  *     width/height + an 8×4 downsampled luminance grid as the feature;
  *   - audio: RIFF/WAVE PCM header parse + 16-bit sample decode → decoded
  *     sample rate + per-bucket RMS energy as the feature;
  *   - video: container demux needs FFmpeg-class codecs that do not exist
  *     in the JDK, so frame *sampling* is real (fixed-stride chunking with
  *     bounded memory) while per-frame pixel decode falls back to
  *     content-hash features — the one remaining declared stub, marked at
  *     [[hashFeatures]].
  *
  * The distributed shape mirrors the reference's content-reading compare
  * stage (`ViewModels/FileEntryViewModel.cs:95-206` reads real bytes with
  * bounded buffers): partition-preserving `mapPartitions` over typed
  * Datasets, one payload in flight per core, no driver collect — the
  * per-device IO discipline of `ViewModels/MainViewModel.cs:1166-1213`
  * applied per task.
  */
object Multimodal {

  final case class MediaMeta(
      kind: String, // image | audio | video
      width: Int,
      height: Int,
      sampleRate: Int,
      nFrames: Int)

  final case class MediaRow(
      media_id: Long,
      url: String,
      payload: Array[Byte],
      meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      feature: Array[Float], // fixed-dim embedding in [-1, 1]
      width: Int, // DECODED image width (-1 when not an image / undecodable)
      height: Int, // decoded image height
      sampleRate: Int, // DECODED wav sample rate (-1 when not audio)
      decodedFrames: Int,
      payloadBytes: Long)

  val FeatureDim = 32

  // ---------------------------------------------------------------- images

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF built in).
    * Returns (width, height, feature) or None when the payload is not a
    * decodable image. Feature = mean luminance over an 8×4 grid (row-major),
    * mapped to [-1, 1] — a genuine pixel-derived perceptual sketch, the
    * cheap cousin of a pHash. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val gw = 8
      val gh = FeatureDim / gw
      val sums = new Array[Double](FeatureDim)
      val counts = new Array[Long](FeatureDim)
      var y = 0
      while (y < h) {
        val gy = math.min(gh - 1, y * gh / h)
        var x = 0
        while (x < w) {
          val gx = math.min(gw - 1, x * gw / w)
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val lum = 0.299 * r + 0.587 * g + 0.114 * b
          val cell = gy * gw + gx
          sums(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val feat = Array.tabulate(FeatureDim) { i =>
        if (counts(i) == 0) 0f
        else (2.0 * (sums(i) / counts(i)) / 255.0 - 1.0).toFloat
      }
      Some((w, h, feat))
    }
  }

  // ----------------------------------------------------------------- audio

  /** Real WAV-PCM decode: RIFF/WAVE chunk walk (fmt + data), 16-bit LE
    * sample decode. Returns (sampleRate, nSamples, feature) or None for
    * non-WAV / non-PCM-16 payloads. Feature = RMS amplitude per one of
    * FeatureDim equal time buckets, in [0, 1] ⊂ [-1, 1]. */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (payload.length < 44) return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var sampleRate = -1
    var bits = -1
    var fmt = -1
    var channels = 1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= payload.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(off)
      val len = bb.getInt(off + 4)
      if (len < 0 || off + 8 + len > payload.length) return None
      if (id == "fmt " && len >= 16) {
        fmt = bb.getShort(off + 8).toInt
        channels = bb.getShort(off + 10).toInt
        sampleRate = bb.getInt(off + 12)
        bits = bb.getShort(off + 22).toInt
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = len
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmt != 1 || bits != 16 || sampleRate <= 0 || dataOff < 0 || channels < 1)
      return None
    val nSamples = dataLen / 2 / channels
    if (nSamples == 0) return None
    val sumSq = new Array[Double](FeatureDim)
    val cnt = new Array[Long](FeatureDim)
    var s = 0
    while (s < nSamples) {
      val bucket = math.min(FeatureDim - 1, s * FeatureDim / nSamples)
      // mix channels down by averaging
      var c = 0
      var acc = 0.0
      while (c < channels) {
        acc += bb.getShort(dataOff + 2 * (s * channels + c)) / 32768.0
        c += 1
      }
      val v = acc / channels
      sumSq(bucket) += v * v
      cnt(bucket) += 1
      s += 1
    }
    val feat = Array.tabulate(FeatureDim) { i =>
      if (cnt(i) == 0) 0f else math.sqrt(sumSq(i) / cnt(i)).toFloat
    }
    Some((sampleRate, nSamples, feat))
  }

  // ----------------------------------------------------------------- video

  /** ??? STUB ??? (video pixel decode only): container demux needs codecs
    * absent from the JDK, so per-frame features are a content hash folded
    * into FeatureDim floats in [-1, 1]. Frame *sampling* above it is real.
    * Also the fallback for undecodable image/audio payloads, so a corrupt
    * file yields a deterministic row instead of a task failure (the
    * reference's IgnoreInaccessible tolerance, `MainViewModel.cs:840`). */
  def hashFeatures(payload: Array[Byte], kind: String): Array[Float] = {
    val base = Hash64.hashBytes(payload, kind.hashCode.toLong)
    Array.tabulate(FeatureDim) { i =>
      val h = Hash64.mix(base ^ (i.toLong * 0x9E3779B97F4A7C15L))
      (h.toDouble / Long.MaxValue.toDouble).toFloat
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk.
    * Real demuxers replace the chunking; the operator shape (one payload →
    * few frames, bounded memory) is the contract. */
  def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] = {
    val n = payload.length / math.max(1, frameBytes)
    (0 until n by math.max(1, stride)).map { f =>
      java.util.Arrays.copyOfRange(payload, f * frameBytes,
        math.min(payload.length, (f + 1) * frameBytes))
    }
  }

  // ------------------------------------------------------------- operators

  /** Distributed feature extraction: partition-preserving, no shuffle, no
    * driver collect; each task holds one payload batch at a time. Image and
    * audio rows run the REAL decoders; rows whose payload fails to decode
    * fall back to hash features with sentinel dimensions. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (feat, w, h, sr, frames) = r.meta.kind match {
          case "image" =>
            decodeImage(r.payload) match {
              case Some((iw, ih, f)) => (f, iw, ih, -1, 1)
              case None => (hashFeatures(r.payload, "image"), -1, -1, -1, 1)
            }
          case "audio" =>
            decodeWav(r.payload) match {
              case Some((rate, _, f)) => (f, -1, -1, rate, 1)
              case None => (hashFeatures(r.payload, "audio"), -1, -1, -1, 1)
            }
          case _ =>
            val fs = sampleFrames(r.payload, frameBytes = 256, stride = 4)
            (hashFeatures(r.payload, "video"), -1, -1, -1, fs.length)
        }
        MediaFeatures(
          media_id = r.media_id,
          kind = r.meta.kind,
          feature = feat,
          width = w,
          height = h,
          sampleRate = sr,
          decodedFrames = frames,
          payloadBytes = r.payload.length.toLong)
      }
    }
  }

  // ------------------------------------------------------------- synthesis

  /** Deterministic REAL PNG: a w×h gradient-plus-hash pattern rendered into
    * a BufferedImage and encoded by the JDK PNG writer. */
  def syntheticPng(id: Long, w: Int = 48, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = Hash64.mix(id ^ (x.toLong << 32) ^ y.toLong)
        val r = (x * 255 / math.max(1, w - 1)) & 0xff
        val g = (y * 255 / math.max(1, h - 1)) & 0xff
        val b = (m & 0xff).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL WAV: 16-bit mono PCM sine whose frequency derives
    * from the id; 44-byte canonical header + data chunk. */
  def syntheticWav(id: Long, sampleRate: Int = 8000, nSamples: Int = 512): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen).put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes(ascii)).putInt(dataLen)
    val freq = 200.0 + (Hash64.mix(id) & 0x3ff).toDouble // 200..1223 Hz
    var s = 0
    while (s < nSamples) {
      val v = math.sin(2.0 * math.Pi * freq * s / sampleRate)
      bb.putShort((v * 0.5 * 32767).toShort)
      s += 1
    }
    bb.array()
  }

  /** Deterministic synthetic media table derived from any (id, text) frame:
    * REAL PNG payloads for image rows, REAL WAV-PCM for audio rows, raw
    * text bytes for video rows (chunk-sampled). Gives the decode kernels a
    * genuine corpus with zero external data. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" => syntheticPng(id, w = 48 + (id % 5).toInt * 4, h = 32)
          case "audio" => syntheticWav(id)
          case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        MediaRow(
          media_id = id,
          url = s"synthetic://media/$id",
          payload = payload,
          meta = MediaMeta(kind, width = 64, height = 64, sampleRate = 16000,
            nFrames = payload.length / 256))
    }
  }
}
