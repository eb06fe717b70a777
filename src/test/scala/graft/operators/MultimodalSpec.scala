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
    // video frame sampling produced > 1 frame for the long payload
    assert(rows(2).decodedFrames > 1)
    // determinism
    val again = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(rows.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("frame sampling respects stride and bounds") {
    val payload = Array.tabulate[Byte](1024)(i => (i % 127).toByte)
    val frames = Multimodal.sampleFrames(payload, frameBytes = 256, stride = 2)
    assert(frames.length == 2) // frames 0 and 2 of 4
    assert(frames.forall(_.length == 256))
    assert(Multimodal.sampleFrames(Array.empty[Byte], 256, 2).isEmpty)
  }
}
