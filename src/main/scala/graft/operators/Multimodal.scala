package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema, batch shape, partition-preserving
  * `mapPartitions` over typed Datasets — is real and tested. The decode
  * kernels themselves are **deterministic stubs** (clearly marked below):
  * this container ships no image/audio codecs, so `decodeStub` derives
  * features from payload bytes reproducibly. In production the stub body is
  * replaced by a real codec call; nothing else changes — the operator
  * boundary, schema and partitioning are exactly what a JNI/FFmpeg-backed
  * kernel needs (bounded batch memory, no driver collect, one payload in
  * flight per core — the reference's per-device IO discipline,
  * `ViewModels/MainViewModel.cs:1166-1213`, applied per task).
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
      feature: Array[Float], // fixed-dim embedding
      decodedFrames: Int,
      payloadBytes: Long)

  val FeatureDim = 32

  /** ??? STUB ??? — deterministic fake decoder. Replace with a real codec
    * (e.g. javacv / libvips via JNI) in production; signature and batch
    * shape are the contract. Features are a content hash folded into
    * FeatureDim floats in [-1, 1]. */
  def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val base = Hash64.hashBytes(payload, meta.kind.hashCode.toLong)
    Array.tabulate(FeatureDim) { i =>
      val h = Hash64.mix(base ^ (i.toLong * 0x9E3779B97F4A7C15L))
      (h.toDouble / Long.MaxValue.toDouble).toFloat
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk.
    * Real decoders replace the chunking with container demux; the operator
    * shape (one payload → few frames, bounded memory) is the point. */
  def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] = {
    val n = payload.length / math.max(1, frameBytes)
    (0 until n by math.max(1, stride)).map { f =>
      java.util.Arrays.copyOfRange(payload, f * frameBytes,
        math.min(payload.length, (f + 1) * frameBytes))
    }
  }

  /** Distributed feature extraction: partition-preserving, no shuffle, no
    * driver collect; each task holds one payload batch at a time. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = r.meta.kind match {
          case "video" => sampleFrames(r.payload, frameBytes = 256, stride = 4).length
          case _ => 1
        }
        MediaFeatures(
          media_id = r.media_id,
          kind = r.meta.kind,
          feature = decodeStub(r.payload, r.meta),
          decodedFrames = frames,
          payloadBytes = r.payload.length.toLong)
      }
    }
  }

  /** Deterministic synthetic media table derived from any (id, text) frame
    * — gives the multimodal operators a corpus in this codec-free sandbox. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
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
