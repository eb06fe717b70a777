package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class RobotsTxtSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def robots = {
    import spark.implicits._
    Seq(
      // star group with two rules; a bot-only group whose rule must NOT leak
      ("h1", "User-agent: *\nDisallow: /private\nDisallow: /tmp\n\n" +
        "User-agent: evilbot\nDisallow: /"),
      // multi-UA group naming * among others (RFC 9309 §2.2.1)
      ("h2", "User-agent: googlebot\nUser-agent: *\nDisallow: /secret"),
      // bot-only: nothing applies to *
      ("h3", "User-agent: crawler\nDisallow: /"),
      // empty Disallow value = allow everything; case-insensitive field names
      ("h4", "USER-AGENT: *\nDISALLOW:\ndisallow: /x"),
      // Allow carve-out inside a disallowed subtree (longest match wins)
      ("h5", "User-agent: *\nDisallow: /private\nAllow: /private/pub"),
      // exact-length tie: Allow wins (least restrictive, RFC 9309 §2.2.2)
      ("h6", "User-agent: *\nDisallow: /dir\nALLOW: /dir\nAllow:"))
      .toDF("host", "robots_txt")
  }

  test("rules: star-group extraction honors groups, multi-UA, case, empty values") {
    val got = RobotsTxt.rules(robots).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set(
      ("h1", "/private", false), ("h1", "/tmp", false),
      ("h2", "/secret", false),
      ("h4", "/x", false),
      ("h5", "/private", false), ("h5", "/private/pub", true),
      ("h6", "/dir", false), ("h6", "/dir", true)))
  }

  test("gate: path-prefix blocking per host, non-matching hosts untouched") {
    import spark.implicits._
    val pages = Seq(
      "http://h1/private/a",    // blocked (prefix /private)
      "http://h1/privateer",    // blocked — literal prefix semantics
      "http://h1/public/a",     // kept
      "http://h2/secret",       // blocked (exact prefix)
      "http://h3/anything",     // kept: h3 has no * rules
      "http://h4/x/y",          // blocked
      "http://h7/private/a")    // kept: no robots for h7
      .toDF("url")
    val got = RobotsTxt.gate(pages, RobotsTxt.rules(robots)).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map(
      "http://h1/private/a" -> true, "http://h1/privateer" -> true,
      "http://h1/public/a" -> false, "http://h2/secret" -> true,
      "http://h3/anything" -> false, "http://h4/x/y" -> true,
      "http://h7/private/a" -> false))
  }

  test("gate: Allow precedence — longest match wins, Allow wins length ties") {
    import spark.implicits._
    val pages = Seq(
      "http://h5/private/a",     // Disallow /private is the only match
      "http://h5/private/pub/x", // Allow /private/pub is longer → kept
      "http://h5/private/pubz",  // literal prefix: Allow still longest
      "http://h5/public",        // no match → kept
      "http://h6/dir/a",         // tie /dir vs /dir → Allow wins
      "http://h6/other")         // no match
      .toDF("url")
    val got = RobotsTxt.gate(pages, RobotsTxt.rules(robots)).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map(
      "http://h5/private/a" -> true,
      "http://h5/private/pub/x" -> false,
      "http://h5/private/pubz" -> false,
      "http://h5/public" -> false,
      "http://h6/dir/a" -> false,
      "http://h6/other" -> false))
  }

  test("crawlDelays: star-group numeric delays only, max wins, junk drops") {
    import spark.implicits._
    val r = Seq(
      ("h1", "User-agent: *\nCrawl-delay: 4\n\nUser-agent: bot\nCrawl-delay: 99"),
      ("h2", "User-agent: *\nCRAWL-DELAY: 2\n\nUser-agent: x\nUser-agent: *\nCrawl-delay: 7"),
      ("h3", "User-agent: bot\nCrawl-delay: 5"),      // bot-only: absent
      ("h4", "User-agent: *\nCrawl-delay: fast"),     // non-numeric: absent
      ("h5", "User-agent: *\nDisallow: /x"))          // no delay: absent
      .toDF("host", "robots_txt")
    val got = RobotsTxt.crawlDelays(r).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == Map("h1" -> 4L, "h2" -> 7L), s"got $got")
  }

  test("parsing is partitioning-invariant") {
    for (parts <- Seq(1, 4)) {
      val got = RobotsTxt.rules(robots.repartition(parts)).count()
      assert(got == 8L, s"parts=$parts")
    }
  }

  test("sitemaps: standalone records — group-independent, absolute-only, dedup, case kept") {
    import spark.implicits._
    val r = Seq(
      // one at top + one INSIDE a bot-only group: both count
      ("s1", "Sitemap: https://s1.example/a.xml\nUser-agent: bot\n" +
        "Disallow: /\nSitemap: https://cdn.example/shared.xml"),
      // duplicates collapse; lowercase key + uppercase scheme kept verbatim
      ("s2", "sitemap: https://m.example/a.xml\nSitemap: https://m.example/a.xml\n" +
        "Sitemap:\tHTTPS://m.example/B.xml"),
      // relative and non-http junk drops; host vanishes entirely
      ("s3", "Sitemap: /sitemap.xml\nSitemap: ftp://no.example/x"),
      ("s4", "User-agent: *\nDisallow:")).toDF("host", "robots_txt")
    val got = RobotsTxt.sitemaps(r).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == Set(
      ("s1", "https://s1.example/a.xml"),
      ("s1", "https://cdn.example/shared.xml"),
      ("s2", "https://m.example/a.xml"),
      ("s2", "HTTPS://m.example/B.xml")))
  }
}
