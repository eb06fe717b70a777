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
