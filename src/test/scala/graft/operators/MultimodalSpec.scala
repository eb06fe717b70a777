package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("media plumbing: schema, determinism, no shuffle in feature extraction") {
    import spark.implicits._
    val docs = Seq((0L, "an image doc"), (1L, "an audio doc"), (2L, "a video doc with more bytes " * 200))
      .toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(spark, docs)
    val feats = Multimodal.extractFeatures(spark, media)

    // partition-preserving: the physical plan must contain no exchange
    val plan = feats.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"feature extraction must not shuffle:\n$plan")

    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length == 3)
    assert(rows.map(_.kind).sameElements(Array("image", "audio", "video")))
    rows.foreach { f =>
      assert(f.feature.length == Multimodal.FeatureDim)
      assert(f.feature.forall(x => x >= -1.0f && x <= 1.0f))
    }
    // the image row decoded through the REAL ImageIO path: true dimensions
    assert(rows(0).width == 48 && rows(0).height == 32)
    // the audio row decoded through the REAL WAV-PCM path: true sample rate
    assert(rows(1).sampleRate == 8000)
    // the video row decoded through the REAL animated-GIF path: true
    // logical-screen dimensions and >1 pixel-decoded frame at stride 2
    assert(rows(2).width == 32 && rows(2).height == 24)
    assert(rows(2).decodedFrames > 1)
    // determinism
    val again = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(rows.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("decodeImage reads a planted real PNG: exact dimensions, pixel-derived features") {
    val png = Multimodal.syntheticPng(7L, w = 20, h = 10)
    // sanity: payload really is a PNG container
    assert((png(1) & 0xff) == 'P'.toInt && (png(2) & 0xff) == 'N'.toInt)
    val Some((w, h, feat)) = Multimodal.decodeImage(png)
    assert(w == 20 && h == 10)
    assert(feat.length == Multimodal.FeatureDim)
    // the gradient pattern is brighter on the right/bottom: the luminance
    // grid must not be constant (i.e. features came from pixels, not a hash)
    assert(feat.distinct.length > 4)
    // left-edge cell darker than right-edge cell (red ramps with x)
    assert(feat(0) < feat(7))
    // deterministic decode
    val again = Multimodal.decodeImage(png).get._3
    assert(feat.sameElements(again))
  }

  test("decodeWav parses a planted real WAV: header fields and RMS energy") {
    val wav = Multimodal.syntheticWav(3L, sampleRate = 8000, nSamples = 512)
    val Some((rate, n, feat)) = Multimodal.decodeWav(wav)
    assert(rate == 8000)
    assert(n == 512)
    // a half-amplitude sine has RMS ≈ 0.5/√2 ≈ 0.354 in every bucket
    assert(feat.forall(v => v > 0.2f && v < 0.5f))
  }

  test("decodeGifFrames demuxes a planted animated GIF: frame count, dims, temporal signal") {
    val gif = Multimodal.syntheticGif(5L, w = 32, h = 24, nFrames = 6)
    // sanity: payload really is a GIF container
    assert(new String(gif, 0, 3, "US-ASCII") == "GIF")
    val Some((w, h, nf, feat)) = Multimodal.decodeGifFrames(gif, stride = 2)
    assert(w == 32 && h == 24)
    assert(nf == 3) // frames 0, 2, 4 of 6
    assert(feat.length == Multimodal.FeatureDim)
    // spatial half came from pixels: the gradient varies across cells
    assert(feat.slice(0, 16).distinct.length > 4)
    // temporal half has signal in the buckets the 3 sampled frames hit
    val temporal = feat.slice(16, 32)
    assert(temporal.count(_ != 0f) >= 3)
    // deterministic decode
    val again = Multimodal.decodeGifFrames(gif, stride = 2).get._4
    assert(feat.sameElements(again))
    // a decode at stride 1 sees all 6 frames
    assert(Multimodal.decodeGifFrames(gif, stride = 1).get._3 == 6)
    // non-GIF bytes are rejected, not mis-decoded
    assert(Multimodal.decodeGifFrames("not a gif at all".getBytes("UTF-8")).isEmpty)
  }

  test("moving bar shows up in the temporal profile across different clips") {
    // two clips differing only in frame count produce different temporal
    // halves but similar spatial gradients — evidence the time axis is real
    val a = Multimodal.decodeGifFrames(Multimodal.syntheticGif(1L, nFrames = 4), stride = 1).get._4
    val b = Multimodal.decodeGifFrames(Multimodal.syntheticGif(1L, nFrames = 8), stride = 1).get._4
    assert(!a.slice(16, 32).sameElements(b.slice(16, 32)))
  }

  test("undecodable payloads fall back to hash features with sentinel dims") {
    import spark.implicits._
    val junk = "definitely not an image".getBytes("UTF-8")
    val media = Seq(Multimodal.MediaRow(9L, "u", junk,
      Multimodal.MediaMeta("image", 0, 0, 0, 0))).toDS()
    val f = Multimodal.extractFeatures(spark, media).collect().head
    assert(f.width == -1 && f.height == -1)
    assert(f.feature.length == Multimodal.FeatureDim)
  }

  test("frame sampling respects stride and bounds") {
    val payload = Array.tabulate[Byte](1024)(i => (i % 127).toByte)
    val frames = Multimodal.sampleFrames(payload, frameBytes = 256, stride = 2)
    assert(frames.length == 2) // frames 0 and 2 of 4
    assert(frames.forall(_.length == 256))
    assert(Multimodal.sampleFrames(Array.empty[Byte], 256, 2).isEmpty)
  }
}
