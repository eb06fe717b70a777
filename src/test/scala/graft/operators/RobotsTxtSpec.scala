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
      ("h4", "USER-AGENT: *\nDISALLOW:\ndisallow: /x"))
      .toDF("host", "robots_txt")
  }

  test("rules: star-group extraction honors groups, multi-UA, case, empty values") {
    val got = RobotsTxt.rules(robots).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("h1", "/private"), ("h1", "/tmp"),
      ("h2", "/secret"),
      ("h4", "/x")))
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
      "http://h5/private/a")    // kept: no robots for h5
      .toDF("url")
    val got = RobotsTxt.gate(pages, RobotsTxt.rules(robots)).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map(
      "http://h1/private/a" -> true, "http://h1/privateer" -> true,
      "http://h1/public/a" -> false, "http://h2/secret" -> true,
      "http://h3/anything" -> false, "http://h4/x/y" -> true,
      "http://h5/private/a" -> false))
  }

  test("parsing is partitioning-invariant") {
    for (parts <- Seq(1, 4)) {
      val got = RobotsTxt.rules(robots.repartition(parts)).count()
      assert(got == 4L, s"parts=$parts")
    }
  }
}
