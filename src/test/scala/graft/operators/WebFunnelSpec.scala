package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class WebFunnelSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def page(url: String, text: String, title: String = "",
      meta: String = ""): (String, String, String) =
    (url, text,
      s"<html><head><title>$title</title>$meta<body>$text</body></html>")

  test("verdicts: the ordered chain, one verdict per page") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val pages = Seq(
      // noindex wins even when other gates would also fire
      page("http://h1/private/a", "Error 404 - page not found",
        meta = "<meta name=\"robots\" content=\"noindex\">"),
      page("http://h1/private/b", long, title = "T b"),  // robots-blocked
      page("http://h1/ok/c", "Access Denied"),           // soft404
      page("http://h1/ok/d", "x \uFFFD\u0001\u0002 y"),  // mojibake: 3 of 8 chars
      page("http://h1/ok/e", long, title = "Same Title"),// kept (min url)
      page("http://h1/ok/f", long + " tail", title = "Same  Title"), // title_dup
      page("http://h2/ok/g", long, title = "Same Title"),// other host: kept
      page("http://h1/ok/h", long),                      // untitled: kept
      page("http://h1/ok/i", long + " x"))               // untitled too: kept
      .toDF("url", "text", "html")
    val robots = Seq(("h1", "User-agent: *\nDisallow: /private"))
      .toDF("host", "robots_txt")
    val got = WebFunnel.verdicts(pages, RobotsTxt.rules(robots)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "http://h1/private/a" -> "noindex",
      "http://h1/private/b" -> "robots_blocked",
      "http://h1/ok/c" -> "soft404",
      "http://h1/ok/d" -> "mojibake",
      "http://h1/ok/e" -> "kept",
      "http://h1/ok/f" -> "title_dup",
      "http://h2/ok/g" -> "kept",
      "http://h1/ok/h" -> "kept",
      "http://h1/ok/i" -> "kept"), s"got $got")
  }

  test("title election ranks survivors first: a failing page never holds the block") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    // the url-smallest member of the title block is soft404; the survivor
    // must still be 'kept', not 'title_dup'
    val pages = Seq(
      page("http://h/a", "File Not Found", title = "News"),
      page("http://h/b", long, title = "News"))
      .toDF("url", "text", "html")
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val got = WebFunnel.verdicts(pages, RobotsTxt.rules(robots)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "http://h/a" -> "soft404",
      "http://h/b" -> "kept"), s"got $got")
  }

  test("funnel plans ONE page-side exchange (title window); flags fuse into the scan") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("wf_plan").toString
    (1 to 50).map(i => (s"http://h${i % 4}/p$i", long + s" v$i",
      s"<html><head><title>T${i % 6}</title></head><body>x</body></html>"))
      .toDF("url", "text", "html")
      .write.mode("overwrite").parquet(dir)
    val robots = Seq(("h1", "User-agent: *\nDisallow: /private"))
      .toDF("host", "robots_txt")
    val out = WebFunnel.verdicts(spark.read.parquet(dir),
      RobotsTxt.rules(robots))
    out.collect()
    // AQE's string carries the initial plan below the final one — assert
    // on the FINAL section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // page-side: ONE shuffle exchange (the (host, tkey) window) — the
    // robots side contributes only its BroadcastExchange (rule arrays)
    // plus its own KB-scale parse exchanges, which ride the tiny robots
    // frame, not the pages
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    val pageShuffles = "Exchange hashpartitioning\\(__host".r.findAllIn(plan).length
    assert(pageShuffles == 1, s"want 1 page-side exchange, plan:\n$plan")
    assert(shuffles <= 3, s"robots parse must stay KB-scale: $shuffles shuffles")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }

  test("stats roll the same verdicts up") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val pages = Seq(
      page("http://h/a", long, title = "T"),
      page("http://h/b", long, title = "T"),
      page("http://h/c", "Forbidden"))
      .toDF("url", "text", "html")
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val got = WebFunnel.stats(pages, RobotsTxt.rules(robots)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("kept" -> 1L, "title_dup" -> 1L, "soft404" -> 1L))
  }
}
