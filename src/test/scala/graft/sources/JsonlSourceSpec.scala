package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.gf

/** JSONL ingest: a fixture must land identically to its parquet twin (same
  * corpus, same `input_hint` pages schema), with html-carrying lines
  * re-deriving text through the canonical extractor. */
class JsonlSourceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)

  test("jsonl fixture equals its parquet twin; html text re-derived; optional keys null") {
    import spark.implicits._
    // titles stay empty — the extractor keeps title TEXT, only
    // script/style bodies drop (fixture contract, see verify recipe)
    val html1 =
      "<html><head><title></title></head><body>alpha beta gamma</body></html>"
        .getBytes(UTF_8)
    val html2 =
      "<html><body><script>var x=1;</script>delta epsilon</body></html>"
        .getBytes(UTF_8)
    val lines = Seq(
      s"""{"url":"https://a.example/1","warc_ts":"2026-01-02T03:04:05Z","html":"${b64(html1)}"}""",
      s"""{"url":"https://b.example/2","warc_ts":"2026-01-02T03:04:06Z","html":"${b64(html2)}","lang":"en"}""",
      s"""{"url":"https://c.example/3","warc_ts":"2026-01-02T03:04:07Z","text":"plain derived text","lang":"de"}""",
      "this is not json")
    val dir = Files.createTempDirectory("jsonl_fixture")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(UTF_8))

    val got = JsonlSource.pages(spark, dir.toString + "/*.jsonl")
    // the malformed line is DROPPED from pages and surfaced for accounting
    assert(got.count() == 3)
    val corrupt = JsonlSource.corruptLines(spark, dir.toString + "/*.jsonl")
      .collect().map(_.getString(0))
    assert(corrupt.toSeq == Seq("this is not json"))

    // parquet twin: same three pages through the same extractor path
    val twin = Seq(
      ("https://a.example/1", "2026-01-02T03:04:05Z", html1, null: String),
      ("https://b.example/2", "2026-01-02T03:04:06Z", html2, "en"))
      .toDF("url", "ts", "html", "lang")
      .select(col("url"), col("ts").cast("timestamp").as("warc_ts"),
        col("html"), gf.extract_text(col("html")).as("text"), col("lang"))
      .unionByName(Seq(("https://c.example/3", "2026-01-02T03:04:07Z",
        "plain derived text", "de"))
        .toDF("url", "ts", "text", "lang")
        .select(col("url"), col("ts").cast("timestamp").as("warc_ts"),
          lit(null).cast("binary").as("html"), col("text"), col("lang")))
    // twin lives OUTSIDE the jsonl dir: a re-resolved json relation must
    // never see parquet files as corrupt JSON
    val twinPath = Files.createTempDirectory("jsonl_twin")
      .resolve("twin.parquet").toString
    twin.write.parquet(twinPath)
    val twinBack = spark.read.parquet(twinPath)

    val goodRows = got
    assert(goodRows.exceptAll(twinBack).isEmpty &&
      twinBack.exceptAll(goodRows).isEmpty,
      "jsonl pages must equal the parquet twin row-for-row")
    // the html-carrying rows really went through the extractor
    val texts = goodRows.where(col("html").isNotNull)
      .select(col("url"), col("text")).as[(String, String)].collect().toMap
    assert(texts("https://a.example/1").contains("alpha beta gamma"))
    assert(!texts("https://b.example/2").contains("var x=1"),
      "script bodies must drop")
  }

  test("pages/corruptLines exactly partition the non-blank lines; " +
    "contentless, array and bad-base64 lines route to accounting") {
    import spark.implicits._
    val lines = Seq(
      // a real page
      s"""{"url":"https://a.example/1","warc_ts":"2026-01-02T03:04:05Z","text":"alpha"}""",
      // metadata-only object: NO url/text/html — must NOT become a page
      """{"lang":"en"}""",
      // top-level array: under the shared from_json parse it carries no
      // contract object — one corrupt line, never two pages
      """[{"url":"https://x.example/a","text":"in-array"},{"url":"https://x.example/b"}]""",
      // html present but NOT valid base64, with a valid text fallback:
      // stays a page, text survives, html lands null
      s"""{"url":"https://b.example/2","html":"@@not-base64@@","text":"fallback text"}""",
      // html-ONLY line whose base64 is garbage: no decodable content at
      // all — corrupt, not a null-text page
      """{"html":"%%%"}""",
      // plain malformed JSON
      "this is not json",
      // blank line: neither view
      "   ")
    val dir = Files.createTempDirectory("jsonl_partition")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(UTF_8))
    val glob = dir.toString + "/*.jsonl"

    val pages = JsonlSource.pages(spark, glob)
    val got = pages.select("url", "text").as[(String, String)]
      .collect().toSet
    assert(got == Set(
      ("https://a.example/1", "alpha"),
      ("https://b.example/2", "fallback text")))
    // bad base64 never reaches the extractor and never fakes a decode
    assert(pages.where(col("html").isNotNull).count() == 0)

    val corrupt = JsonlSource.corruptLines(spark, glob)
      .collect().map(_.getString(0)).toSet
    assert(corrupt == Set(
      """{"lang":"en"}""",
      """[{"url":"https://x.example/a","text":"in-array"},{"url":"https://x.example/b"}]""",
      """{"html":"%%%"}""",
      "this is not json"))
    // exact partition: pages + corrupt == non-blank input lines
    assert(pages.count() + corrupt.size ==
      lines.count(_.trim.nonEmpty))
  }

  test("dedup pipeline over JSONL ingest matches the parquet-twin run") {
    val S = 120
    val corpus = SyntheticCorpus.local(S)
    // shard the corpus over 3 .jsonl files (byte-range splittable, but the
    // multi-file layout is how derived corpora ship)
    val dir = Files.createTempDirectory("graft-jsonl")
    corpus.pages.zipWithIndex.groupBy(_._2 % 3).foreach { case (shard, ps) =>
      val lines = ps.map { case (p, _) =>
        s"""{"url":"${p.url}","warc_ts":"${p.warc_ts.toInstant}",""" +
          s""""html":"${b64(p.html)}","lang":"${p.lang}"}"""
      }
      Files.write(dir.resolve(f"part-$shard%05d.jsonl"),
        lines.mkString("\n").getBytes(UTF_8))
    }

    def decisionsOf(pages: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      graft.DedupPipeline.run(spark, pages, graft.DedupConfig(), fromHtml = true)
        .decisions.select("url", "cluster", "state").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val fromJsonl = decisionsOf(
      JsonlSource.pages(spark, dir.toString + "/*.jsonl"))
    val fromParquet = decisionsOf(spark.createDataFrame(corpus.pages))
    assert(fromJsonl == fromParquet && fromJsonl.size == S)
  }
}
