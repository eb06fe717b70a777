package graft.sources

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WetSinkSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def fixture = {
    import spark.implicits._
    Seq(
      ("https://a.example/1", Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:01Z")),
        "plain text body one"),
      // adversarial: text that LOOKS like an HTTP response — the
      // conversion branch must not strip it
      ("https://a.example/2", Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:02.250Z")),
        "HTTP/1.1 200 OK\r\n\r\nnot actually http"),
      // unicode + embedded newlines survive Content-Length framing
      ("https://b.example/3", Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:03Z")),
        "café line one\nline two — dash"))
      .toDF("url", "warc_ts", "text")
  }

  test("writeWet round-trips through WarcSource.pages byte-for-byte") {
    val dir = Files.createTempDirectory("wet_sink").toString
    WarcSource.writeWet(fixture.repartition(2), dir)
    val back = WarcSource.pages(spark, dir + "/*.warc.gz")
      .select(col("url"), col("warc_ts"), col("text"), col("lang"))
      .collect()
    val got = back.map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    val want = fixture.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == want)
    assert(back.forall(_.isNullAt(3)), "lang is an ingest null")
  }

  test("one gzip member per record (CC WET framing); null rows skip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wet_members").toString
    val withNull = fixture.unionByName(
      Seq(("https://bad.example/x",
        null.asInstanceOf[Timestamp], "dropped")).toDF("url", "warc_ts", "text"))
    WarcSource.writeWet(withNull.coalesce(1), dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz"))
    assert(files.length == 1)
    val bytes = Files.readAllBytes(Paths.get(files.head))
    // gzip member starts: magic 1f 8b, deflate method 08, flags 0 — the
    // writer emits exactly this prefix per record, and the 4-byte pattern
    // is vanishingly unlikely inside deflate output (fixed fixture:
    // deterministic either way)
    val members = bytes.sliding(4).count(w =>
      (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b && w(2) == 8 && w(3) == 0)
    assert(members == 3, s"want 3 members for 3 non-null rows, got $members")
    // and the null-ts row is genuinely absent
    val urls = WarcSource.pages(spark, dir + "/*.warc.gz")
      .select(col("url")).collect().map(_.getString(0)).toSet
    assert(!urls.contains("https://bad.example/x") && urls.size == 3)
  }

  test("records carry the ISO 28500 mandatory headers; all-skip partitions write NO file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wet_hdrs").toString
    WarcSource.writeWet(fixture.coalesce(1), dir)
    val f = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz")).head
    val raw = new String(
      new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(f))))
        .readAllBytes(), "UTF-8")
    assert(raw.contains("WARC-Record-ID: <urn:uuid:"))
    assert(raw.contains("Content-Type: text/plain"))
    // record ids are deterministic (resume/retry idempotence) + distinct
    val ids = "urn:uuid:[0-9a-f-]+".r.findAllIn(raw).toSeq
    assert(ids.size == 3 && ids.distinct.size == 3)
    val dir2 = Files.createTempDirectory("wet_hdrs2").toString
    WarcSource.writeWet(fixture.coalesce(1), dir2)
    val f2 = Files.list(Paths.get(dir2)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz")).head
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(f)), Files.readAllBytes(Paths.get(f2))))
    // a partition whose rows ALL skip must not leave a zero-byte file
    val dir3 = Files.createTempDirectory("wet_empty").toString
    val allNull = Seq(("u1", null.asInstanceOf[java.sql.Timestamp], "t"))
      .toDF("url", "warc_ts", "text")
    WarcSource.writeWet(allNull.coalesce(1), dir3)
    assert(Files.list(Paths.get(dir3)).toArray.isEmpty)
  }

  test("conversion records flow through the dedup-canonical pages schema") {
    val dir = Files.createTempDirectory("wet_pages").toString
    WarcSource.writeWet(fixture, dir)
    val p = WarcSource.pages(spark, dir + "/*.warc.gz")
    // html column carries the text bytes verbatim for conversion records
    val r = p.where(col("url") === "https://b.example/3").collect().head
    assert(new String(r.getAs[Array[Byte]]("html"), "UTF-8") ==
      r.getAs[String]("text"))
  }
}
