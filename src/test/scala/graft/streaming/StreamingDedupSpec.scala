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

  private def words(r: scala.util.Random, n: Int): String =
    Seq.fill(n)(s"w${r.nextInt(500)}").mkString(" ")

  test("streaming near-dup: edited copy matches across micro-batches; unrelated doesn't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_nd_").toString
    val r = new scala.util.Random(7)
    val base = words(r, 200)
    val toks = base.split(' '); toks(3) = "edited"; toks(90) = "here"
    val near = toks.mkString(" ")

    Seq(
      page("u/base.html", base),
      page("u/other.html", words(r, 200))
    ).toDF("url", "html").write.parquet(s"$dir/b1")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("html", org.apache.spark.sql.types.BinaryType)))
    val pages = spark.readStream.schema(schema).parquet(s"$dir/b*")
    val q = StreamingDedup.nearDupMatches(spark, pages)
      .writeStream.outputMode("append").format("memory").queryName("nd_out").start()
    try {
      q.processAllAvailable()
      // the edited copy arrives a batch later: bucket state must remember
      // batch-1 signatures
      Seq(page("u/edit.html", near)).toDF("url", "html")
        .write.mode("append").parquet(s"$dir/b2")
      q.processAllAvailable()

      val out = spark.sql("select url, dupOf, estJaccard from nd_out")
        .dropDuplicates("url", "dupOf") // one row per pair (emitted once per shared bucket)
        .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2)))
      assert(out.map(x => (x._1, x._2)).toSet == Set(("u/edit.html", "u/base.html")))
      assert(out.head._3 >= 0.8, s"estJaccard=${out.head._3}")
    } finally q.stop()
  }

  test("near-dup bucket cap bounds state and match fan-out (batch mode)") {
    import spark.implicits._
    val r = new scala.util.Random(8)
    val base = words(r, 300)
    val variants = (0 until 30).map { i =>
      val toks = base.split(' '); toks(i) = s"v$i"
      page(f"u/v$i%03d.html", toks.mkString(" "))
    }
    val df = variants.toDF("url", "html")
    val matches = StreamingDedup
      .nearDupMatches(spark, df, bucketCap = 4)
      .dropDuplicates("url", "dupOf")
      .collect()
    // only the (sorted-order) first 4 members per bucket are retained, so
    // distinct matched pairs stay far below the uncapped 30*29/2 = 435
    assert(matches.nonEmpty)
    assert(matches.length < 435, s"pairs=${matches.length}")
    // every match is a genuine near-dup of the common base (high estimate)
    assert(matches.forall(_.getAs[Double]("estJaccard") >= 0.7))
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
