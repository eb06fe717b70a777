package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC ingest: a synthetic ISO-28500 fixture must land byte-identically to
  * its parquet twin (same corpus, same `input_hint` pages schema). */
class WarcSourceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  // ---- fixture writer (test-side twin of the parser; strict CRLF framing) ---

  private def headerBlock(lines: Seq[String]): Array[Byte] =
    (lines.mkString("\r\n") + "\r\n\r\n").getBytes(UTF_8)

  /** One response record carrying an HTTP message whose payload is `html`. */
  private def responseRecord(p: Page): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${p.html.length}\r\n\r\n").getBytes(UTF_8)
    val body = http ++ p.html
    val hdr = headerBlock(Seq(
      "WARC/1.0",
      "WARC-Type: response",
      s"WARC-Target-URI: ${p.url}",
      s"WARC-Date: ${p.warc_ts.toInstant}",
      s"WARC-Record-ID: <urn:uuid:${p.url.hashCode.toHexString}>",
      s"Content-Length: ${body.length}"))
    hdr ++ body ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** Non-response record (warcinfo / request / metadata) the reader skips. */
  private def otherRecord(warcType: String, body: String): Array[Byte] = {
    val b = body.getBytes(UTF_8)
    headerBlock(Seq(
      "WARC/1.0",
      s"WARC-Type: $warcType",
      "WARC-Target-URI: https://example.org/skip",
      "WARC-Date: 2026-01-01T00:00:00Z",
      s"Content-Length: ${b.length}")) ++ b ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def writeWarc(dir: Path, name: String, records: Seq[Array[Byte]]): Path = {
    val out = new ByteArrayOutputStream()
    records.foreach(out.write)
    Files.write(dir.resolve(name), out.toByteArray)
  }

  private val S = 120
  private lazy val corpus = SyntheticCorpus.local(S)

  private lazy val warcDir: Path = {
    val dir = Files.createTempDirectory("graft-warc")
    // shard the corpus over 3 files (Common-Crawl ships many files per
    // crawl; parallelism is file-level) and interleave skippable records
    corpus.pages.zipWithIndex.groupBy(_._2 % 3).foreach { case (shard, ps) =>
      val recs = Seq(otherRecord("warcinfo", "software: graft-fixture\r\n")) ++
        ps.flatMap { case (p, _) =>
          Seq(otherRecord("request", s"GET ${p.url} HTTP/1.1\r\n"), responseRecord(p))
        }
      writeWarc(dir, f"crawl-$shard%05d.warc", recs)
    }
    dir
  }

  test("warc pages are byte-identical to the parquet twin") {
    import spark.implicits._
    val fromWarc = WarcSource.pages(spark, warcDir.toString + "/*.warc")
      .select($"url", $"warc_ts", $"html", $"text", $"lang")
    val twin = spark.createDataFrame(corpus.pages)
      .withColumn("lang", lit(null).cast("string")) // lang unknown at ingest

    assert(fromWarc.count() == S.toLong)
    // anti-join both ways on every column including the raw html bytes
    val diffA = fromWarc.exceptAll(twin).count()
    val diffB = twin.exceptAll(fromWarc).count()
    assert(diffA == 0 && diffB == 0, s"warc≠parquet: +$diffA -$diffB")
  }

  test("non-response records are skipped, not mis-framed") {
    val recs = parseAll(
      otherRecord("warcinfo", "x\r\n") ++
        responseRecord(corpus.pages.head) ++
        otherRecord("metadata", "y: z\r\n") ++
        responseRecord(corpus.pages(1)))
    assert(recs.map(_.url) == Seq(corpus.pages.head.url, corpus.pages(1).url))
  }

  test("body without an HTTP header block is taken verbatim") {
    val raw = "no http preamble here".getBytes(UTF_8)
    val hdr = headerBlock(Seq(
      "WARC/1.0", "WARC-Type: response",
      "WARC-Target-URI: https://example.org/raw",
      "WARC-Date: 2026-02-02T00:00:00Z",
      s"Content-Length: ${raw.length}"))
    val recs = parseAll(hdr ++ raw ++ "\r\n\r\n".getBytes(UTF_8))
    assert(recs.size == 1 && recs.head.html.sameElements(raw))
  }

  test("a record whose Content-Length overruns the file ends the scan; prior records survive") {
    val good = responseRecord(corpus.pages.head)
    val bad = headerBlock(Seq(
      "WARC/1.0", "WARC-Type: response",
      "WARC-Target-URI: https://example.org/trunc",
      "WARC-Date: 2026-02-02T00:00:00Z",
      "Content-Length: 999999")) ++ "short".getBytes(UTF_8)
    val recs = parseAll(good ++ bad)
    assert(recs.map(_.url) == Seq(corpus.pages.head.url))
  }

  test("zero-length body and missing uri/date records do not crash or emit") {
    val zero = headerBlock(Seq(
      "WARC/1.0", "WARC-Type: response",
      "WARC-Target-URI: https://example.org/empty",
      "WARC-Date: 2026-02-02T00:00:00Z",
      "Content-Length: 0")) ++ "\r\n\r\n".getBytes(UTF_8)
    val noUri = headerBlock(Seq(
      "WARC/1.0", "WARC-Type: response",
      "WARC-Date: 2026-02-02T00:00:00Z",
      "Content-Length: 2")) ++ "ab\r\n\r\n".getBytes(UTF_8)
    val recs = parseAll(zero ++ noUri ++ responseRecord(corpus.pages.head))
    assert(recs.count(_.url == "https://example.org/empty") == 1)
    assert(recs.last.url == corpus.pages.head.url)
    assert(recs.size == 2)
  }

  test("dedup pipeline over WARC ingest matches the parquet-twin run") {
    def decisionsOf(pages: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      graft.DedupPipeline.run(spark, pages, graft.DedupConfig(), fromHtml = true)
        .decisions.select("url", "cluster", "state").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val fromWarc = decisionsOf(WarcSource.pages(spark, warcDir.toString + "/*.warc"))
    val fromParquet = decisionsOf(
      spark.createDataFrame(corpus.pages).withColumn("lang", lit(null).cast("string")))
    assert(fromWarc == fromParquet && fromWarc.size == S)
  }

  private def parseAll(bytes: Array[Byte]): Seq[WarcSource.WarcPage] =
    WarcSource.parseRecords(bytes).toSeq

  // ---- gzip twin (production Common Crawl framing) -------------------------

  /** One gzip MEMBER per record — Common Crawl's convention (the member
    * boundary is what lets CC index byte offsets into `.warc.gz`). */
  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(record)
    gz.close()
    out.toByteArray
  }

  private lazy val warcGzDir: Path = {
    val dir = Files.createTempDirectory("graft-warc-gz")
    corpus.pages.zipWithIndex.groupBy(_._2 % 3).foreach { case (shard, ps) =>
      val recs = Seq(otherRecord("warcinfo", "software: graft-fixture\r\n")) ++
        ps.flatMap { case (p, _) =>
          Seq(otherRecord("request", s"GET ${p.url} HTTP/1.1\r\n"), responseRecord(p))
        }
      writeWarc(dir, f"crawl-$shard%05d.warc.gz", recs.map(gzipMember))
    }
    dir
  }

  test("per-record-member .warc.gz parses byte-identically to its plain twin " +
    "and to the parquet twin") {
    import spark.implicits._
    val fromGz = WarcSource.pages(spark, warcGzDir.toString + "/*.warc.gz")
      .select($"url", $"warc_ts", $"html", $"text", $"lang")
    val fromPlain = WarcSource.pages(spark, warcDir.toString + "/*.warc")
      .select($"url", $"warc_ts", $"html", $"text", $"lang")
    assert(fromGz.count() == S.toLong)
    assert(fromGz.exceptAll(fromPlain).count() == 0 &&
      fromPlain.exceptAll(fromGz).count() == 0,
      "gz pages must equal the plain-warc pages byte-for-byte")
    val twin = spark.createDataFrame(corpus.pages)
      .withColumn("lang", lit(null).cast("string"))
    assert(fromGz.exceptAll(twin).count() == 0 &&
      twin.exceptAll(fromGz).count() == 0,
      "gz pages must equal the parquet twin byte-for-byte")
  }

  test("whole-file single-member gzip decodes too (mislabeled extension included)") {
    val dir = Files.createTempDirectory("graft-warc-gz1")
    val recs = corpus.pages.take(5).map(responseRecord)
    // one member for the WHOLE file, and a deliberately plain `.warc` name:
    // detection is by magic bytes, not extension
    Files.write(dir.resolve("whole.warc"),
      gzipMember(recs.reduce(_ ++ _)))
    val got = WarcSource.pages(spark, dir.toString + "/*.warc")
    assert(got.count() == 5)
    assert(got.select("url").collect().map(_.getString(0)).toSet ==
      corpus.pages.take(5).map(_.url).toSet)
  }

  test("a corrupt gzip member ends that file's scan; prior records survive") {
    val dir = Files.createTempDirectory("graft-warc-gzbad")
    val good = gzipMember(responseRecord(corpus.pages.head))
    val bad = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    val out = new ByteArrayOutputStream()
    out.write(good); out.write(bad)
    Files.write(dir.resolve("trunc.warc.gz"), out.toByteArray)
    val got = WarcSource.pages(spark, dir.toString + "/*.warc.gz")
      .select("url").collect().map(_.getString(0)).toSeq
    assert(got == Seq(corpus.pages.head.url))
  }

  test("streamed records never buffer whole files: listing is pruned to path") {
    // the plan must read ONLY `path` from the binaryFile relation — the
    // content column (whole-file bytes) stays out of the scan schema
    val plan = WarcSource.records(spark, warcDir.toString + "/*.warc")
      .queryExecution.executedPlan.toString
    assert(plan.contains("path") && !plan.contains("content"),
      s"binaryFile scan must prune content:\n$plan")
  }
}
