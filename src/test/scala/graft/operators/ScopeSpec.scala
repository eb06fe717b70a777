package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{DedupConfig, DedupPipeline}
import graft.sources.SyntheticCorpus

class ScopeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("host/dir extraction (GetUserFolder / GetFolder analogs)") {
    import spark.implicits._
    val df = Seq("https://host1.example/d2/doc7.html").toDF("url")
    val row = Scope.withScopeCols(df).select("host", "dir").head()
    assert(row.getString(0) == "host1.example")
    assert(row.getString(1) == "https://host1.example/d2")
  }

  test("singletonUnique marks per-mode uniques (MainViewModel.cs:616-688)") {
    import spark.implicits._
    // blocks: b1 spans two hosts; b2 twice on one host; b3 singleton
    val docs = Seq(
      ("https://h1.x/a/1.html", "b1"), ("https://h2.x/a/2.html", "b1"),
      ("https://h1.x/a/3.html", "b2"), ("https://h1.x/b/4.html", "b2"),
      ("https://h3.x/a/5.html", "b3")).toDF("url", "block")

    def uniques(mode: Scope.Mode): Set[String] =
      Scope.singletonUnique(docs, col("block"), mode)
        .where(col("scope_unique")).select("url").as[String].collect().toSet

    // All: only the size-1 block
    assert(uniques(Scope.All) == Set("https://h3.x/a/5.html"))
    // SameHost: b1 members are alone on their hosts → unique; b2 shares h1.x
    assert(uniques(Scope.SameHost) ==
      Set("https://h1.x/a/1.html", "https://h2.x/a/2.html", "https://h3.x/a/5.html"))
    // DifferentHost: b2 and b3 span one host each → all their members unique
    assert(uniques(Scope.DifferentHost) ==
      Set("https://h1.x/a/3.html", "https://h1.x/b/4.html", "https://h3.x/a/5.html"))
    // SameDir: b2 members are in different dirs → each alone per (block,dir)
    assert(uniques(Scope.SameDir).contains("https://h1.x/a/3.html"))
    // DifferentDir: b3 single-dir → unique; b1 spans dirs? both in /a on
    // different hosts → dirs differ (host is part of dir) → not unique
    assert(uniques(Scope.DifferentDir).contains("https://h3.x/a/5.html"))
    assert(!uniques(Scope.DifferentDir).contains("https://h1.x/a/1.html"))
  }

  private def pagesOf(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "text")
      .withColumn("warc_ts", lit("2026-01-01 00:00:00").cast("timestamp"))
      .withColumn("lang", lit("en"))
  }

  private def states(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("url", "state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("same_host completeness: within-host dups cluster even when the " +
    "globally-first copy of their text lives on another host (ADVICE r1)") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // a.example sorts before b.example, so the GLOBAL natural rep of this
    // text is a1 — the round-1 post-filter dropped both star edges (a1,b2)
    // and (a1,b3) and marked the two identical b-host docs unique
    val pages = pagesOf(
      "https://a.example/1.html" -> t,
      "https://b.example/2.html" -> t,
      "https://b.example/3.html" -> t)
    val r = DedupPipeline.run(
      spark, pages,
      DedupConfig(scope = "same_host", minLen = 5,
        enableNear = false, enableSubstr = false),
      fromHtml = false)
    val st = states(r.decisions)
    assert(st("https://a.example/1.html") == "unique")
    assert(st("https://b.example/2.html") == "keep")
    assert(st("https://b.example/3.html") == "delete")
  }

  test("different_host: single-host clusters dissolve to unique; " +
    "cross-host clusters stand whole") {
    val t1 = "one two three four five six seven eight nine ten"
    val t2 = "red orange yellow green blue indigo violet black white grey"
    val t3 = "north south east west up down left right front back"
    val pages = pagesOf(
      "https://h1.example/1.html" -> t1, // same-host exact pair → both unique
      "https://h1.example/2.html" -> t1,
      "https://h2.example/3.html" -> t2, // cross-host pair → keep/delete
      "https://h3.example/4.html" -> t2,
      "https://h4.example/5.html" -> t3, // mixed 2-hosts-3-docs → whole cluster
      "https://h4.example/6.html" -> t3,
      "https://h5.example/7.html" -> t3)
    val r = DedupPipeline.run(
      spark, pages,
      DedupConfig(scope = "different_host", minLen = 5,
        enableNear = false, enableSubstr = false),
      fromHtml = false)
    val st = states(r.decisions)
    assert(st("https://h1.example/1.html") == "unique")
    assert(st("https://h1.example/2.html") == "unique")
    assert(st("https://h2.example/3.html") == "keep")
    assert(st("https://h3.example/4.html") == "delete")
    // mixed cluster: every member has a cross-host partner → stands whole
    // (documented over-delete of the same-host minority pair)
    assert(st("https://h4.example/5.html") == "keep")
    assert(st("https://h4.example/6.html") == "delete")
    assert(st("https://h5.example/7.html") == "delete")
  }

  test("source priority overrides natural order in representative election") {
    val t = "prio one two three four five six seven eight nine"
    val pages = pagesOf(
      "https://a.example/1.html" -> t,
      "https://b.example/2.html" -> t)
    val r = DedupPipeline.run(
      spark, pages,
      DedupConfig(minLen = 5, enableNear = false, enableSubstr = false,
        sourcePriority = Seq("b.example")),
      fromHtml = false)
    val st = states(r.decisions)
    // b.example is listed (priority 0); a.example unlisted ranks after
    assert(st("https://b.example/2.html") == "keep")
    assert(st("https://a.example/1.html") == "delete")
  }

  test("scoped pipeline: same_host clusters only within-host dups") {
    val corpus = SyntheticCorpus.local(300)
    val pages = spark.createDataFrame(corpus.pages)
    val all = DedupPipeline.run(spark, pages, DedupConfig(), fromHtml = true)
    val scoped = DedupPipeline.run(
      spark, pages, DedupConfig(scope = "same_host"), fromHtml = true)
    val allEdges = all.edges.count()
    val sameHost = scoped.edges.count()
    assert(sameHost < allEdges, s"same_host $sameHost !< all $allEdges")
    // every surviving edge is within one host
    import spark.implicits._
    val bad = scoped.edges
      .where(Scope.host(col("src")) =!= Scope.host(col("dst"))).count()
    assert(bad == 0)
  }
}
