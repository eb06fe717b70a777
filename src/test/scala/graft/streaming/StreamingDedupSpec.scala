package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def page(url: String, text: String): (String, Array[Byte]) =
    (url, s"<p>${graft.functions.TextExtract.escape(text)}</p>".getBytes(UTF_8))

  test("streaming exact dedup: first/dup/ignored across micro-batches with state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString

    // micro-batch 1
    Seq(
      page("u/b1-first.html", "the same content body here repeated"),
      page("u/b1-other.html", "completely different content body one"),
      page("u/b1-short.html", "tiny")
    ).toDF("url", "html").write.parquet(s"$dir/batch1")

    val q = StreamingDedup.runFileStream(spark, s"$dir/batch*", "sd_out")
    try {
      q.processAllAvailable()
      // micro-batch 2: a dup of batch-1 content arrives later — state
      // must remember the first-seen url across batches
      Seq(
        page("u/b2-dup.html", "the same content body here repeated"),
        page("u/b2-new.html", "yet another brand new content body")
      ).toDF("url", "html").write.mode("append").parquet(s"$dir/batch2")
      q.processAllAvailable()

      val out = spark.sql("select url, state, dupOf from sd_out")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val byUrl = out.groupBy(_._1).view.mapValues(_.last).toMap
      assert(byUrl("u/b1-first.html")._2 == "first")
      assert(byUrl("u/b1-other.html")._2 == "first")
      assert(byUrl("u/b1-short.html")._2 == "ignored")
      assert(byUrl("u/b2-new.html")._2 == "first")
      assert(byUrl("u/b2-dup.html")._2 == "dup")
      assert(byUrl("u/b2-dup.html")._3 == "u/b1-first.html", "dupOf = first-seen url")
    } finally q.stop()
  }

  test("same content within one micro-batch: exactly one first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2_").toString
    Seq(
      page("u/x1.html", "identical intra batch content body"),
      page("u/x2.html", "identical intra batch content body"),
      page("u/x3.html", "identical intra batch content body")
    ).toDF("url", "html").write.parquet(s"$dir/b1")
    val q = StreamingDedup.runFileStream(spark, s"$dir/b*", "sd_out2")
    try {
      q.processAllAvailable()
      val states = spark.sql("select state from sd_out2 where state != 'ignored'")
        .collect().map(_.getString(0))
      assert(states.count(_ == "first") == 1)
      assert(states.count(_ == "dup") == 2)
    } finally q.stop()
  }
}
