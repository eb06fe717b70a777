package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebNormalizeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().getString(0)
  }

  test("normalText: case, punctuation and spacing all wash out") {
    assert(one(WebNormalize.normalText(lit("Hello,   WORLD!!  (ok)"))) == "hello world ok")
    assert(one(WebNormalize.normalText(lit("a-b_c.d"))) == "a b c d")
    assert(one(WebNormalize.normalText(lit("  already clean  "))) == "already clean")
    // vertical tab collapses like any other whitespace — and does so via an
    // explicit class both Java regex and RE2 read identically (ADVICE r2)
    assert(one(WebNormalize.normalText(lit("a\u000Bb\tc"))) == "a b c")
  }

  test("normalSha: equal for case/punct variants, distinct for real edits") {
    import spark.implicits._
    val r = Seq(
      ("a", "The quick brown fox."),
      ("b", "the QUICK  brown fox"),
      ("c", "the quick brown ox")).toDF("id", "t")
      .select(col("id"), WebNormalize.normalSha(col("t")).as("h"))
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r("a") == r("b"))
    assert(r("a") != r("c"))
  }

  test("scrubPii: emails and phones become typed tokens, rest untouched") {
    val got = one(WebNormalize.scrubPii(
      lit("mail bob.smith+x@ex-ample.co.uk or call 555-123-4567 now")))
    assert(got == "mail <EMAIL> or call <PHONE> now")
    assert(one(WebNormalize.scrubPii(lit("no pii here 12345"))) == "no pii here 12345")
  }

  test("canonUrl: fragment + utm params drop, scheme/host lowercase, path case kept") {
    assert(
      one(WebNormalize.canonUrl(lit("HTTPS://Ex.COM/Path?q=1&utm_source=x#frag")))
        == "https://ex.com/Path?q=1")
    assert(
      one(WebNormalize.canonUrl(lit("http://a.b/p?utm_a=1&utm_b=2")))
        == "http://a.b/p")
    assert(
      one(WebNormalize.canonUrl(lit("http://a.b/p?utm_a=1&q=2")))
        == "http://a.b/p?q=2")
    assert(one(WebNormalize.canonUrl(lit("http://a.b/p"))) == "http://a.b/p")
    // utm match is anchored to a parameter boundary: params merely
    // CONTAINING "utm_" mid-name or mid-value survive intact (ADVICE r2)
    assert(
      one(WebNormalize.canonUrl(lit("http://a.b/p?a=1&myutm_b=2&q=3")))
        == "http://a.b/p?a=1&myutm_b=2&q=3")
    assert(
      one(WebNormalize.canonUrl(lit("http://a.b/p?a=xutm_y&b=1")))
        == "http://a.b/p?a=xutm_y&b=1")
    // runs of consecutive utm params vanish in one pass
    assert(
      one(WebNormalize.canonUrl(lit("http://a.b/p?utm_a=1&utm_b=2&q=3")))
        == "http://a.b/p?q=3")
    assert(
      one(WebNormalize.canonUrl(lit("http://a.b/p?utm_a=1&q=2&utm_z")))
        == "http://a.b/p?q=2")
  }

  test("noindexFlag: both attribute orders, case-insensitive, no false hits") {
    def flag(h: String): Boolean =
      spark.range(1).select(WebNormalize.noindexFlag(lit(h)))
        .head().getBoolean(0)
    // name-first, content-first, case variants
    assert(flag("<html><meta name=\"robots\" content=\"noindex, nofollow\"></html>"))
    assert(flag("<meta content='NOINDEX' name='robots'>"))
    assert(flag("<META NAME='Robots' CONTENT='noarchive,noindex'>"))
    // nofollow alone is not noindex; other meta names never gate; the
    // directive can't be assembled across two tags ([^>] stops at >)
    assert(!flag("<meta name=\"robots\" content=\"nofollow\">"))
    assert(!flag("<meta name=\"keywords\" content=\"noindex discussion\">"))
    assert(!flag("<meta name=\"robots\"><meta content=\"noindex\">"))
    assert(!flag("<html><body>robots noindex prose</body></html>"))
  }

  test("urlTrapKey: digit runs collapse, fragments drop, distinct templates stay apart") {
    def k(u: String): String =
      spark.range(1).select(WebNormalize.urlTrapKey(lit(u)))
        .head().getString(0)
    assert(k("https://a.b/cal/2021/03/item42#frag7")
      == "https://a.b/cal/N/N/itemN")
    assert(k("https://a.b/cal/1999/12/item7")
      == "https://a.b/cal/N/N/itemN")
    assert(k("https://a.b/about") == "https://a.b/about")
    assert(k("https://a.b/cal/2021/03/item42")
      != k("https://a.b/news/2021/03/item42"))
  }

  test("soft404Flag: phrase + word floor together, neither alone") {
    def f(t: String): Boolean =
      spark.range(1).select(WebNormalize.soft404Flag(lit(t)))
        .head().getBoolean(0)
    assert(f("Error 404 - page not found."))
    assert(f("Access Denied"))
    // the phrase inside a long article does not flag
    val long = "all about http status codes like 404 " +
      Seq.fill(30)("word").mkString(" ")
    assert(!f(long))
    // short but clean text does not flag
    assert(!f("a perfectly fine short page"))
  }

  test("titleOf: first tag wins, attributes tolerated, whitespace collapsed, absent = empty") {
    def t(h: String): String =
      spark.range(1).select(WebNormalize.titleOf(lit(h)))
        .head().getString(0)
    assert(t("<html><head><title>Hello  World</title></head></html>")
      == "Hello World")
    assert(t("<TITLE lang=\"en\">\n  Spaced\tOut \n</TITLE>") == "Spaced Out")
    // lazy body: stops at the FIRST close tag; later titles ignored
    assert(t("<title>first</title><title>second</title>") == "first")
    assert(t("<html><body>no title here</body></html>") == "")
    assert(t("<title></title>") == "")
  }
  test("surtKey: reversed host labels, www/alias + fragment fold, subdomain range containment") {
    assert(one(WebNormalize.surtKey(lit("https://www.news.bbc.co.uk/a/b?q=1#frag")))
      == "uk,co,bbc,news)/a/b?q=1")
    // apex and www captures of one page share one key
    assert(one(WebNormalize.surtKey(lit("https://example.org/p")))
      == one(WebNormalize.surtKey(lit("HTTPS://WWW.EXAMPLE.ORG/p"))))
    // every subdomain of a domain sorts inside the domain's key range:
    // the domain key is a string prefix of the subdomain key's host part
    val dom = one(WebNormalize.surtKey(lit("https://bbc.co.uk/")))
    val sub = one(WebNormalize.surtKey(lit("https://news.bbc.co.uk/x")))
    assert(sub.startsWith(dom.stripSuffix(")/") + ","))
    // bare host, no path
    assert(one(WebNormalize.surtKey(lit("https://a.example"))) == "example,a)")
    // port rides BEHIND the reversed labels (stays inside the domain's
    // key range); userinfo drops entirely
    assert(one(WebNormalize.surtKey(lit("https://example.com:8080/a")))
      == "com,example:8080)/a")
    assert(one(WebNormalize.surtKey(lit("https://user@example.com/p")))
      == "com,example)/p")
    assert(one(WebNormalize.surtKey(lit("http://u:pw@www.example.com:81/x?y")))
      == "com,example:81)/x?y")
    // ported captures sort within the unported domain prefix
    val dom0 = one(WebNormalize.surtKey(lit("https://example.com/")))
    val ported = one(WebNormalize.surtKey(lit("https://example.com:8080/")))
    assert(ported.startsWith("com,example"))
    assert(dom0.startsWith("com,example"))
  }

  test("cdxIndex: one contiguous sorted run per page across alias-messy captures") {
    import spark.implicits._
    val caps = Seq(
      ("https://site.example/p1", 1L, "v1 body"),
      ("https://www.site.example/p1", 2L, "v1 body"),     // www re-fetch
      ("https://site.example/p1#frag", 3L, "v2 body"),    // fragment noise
      ("https://other.example/p2", 1L, "other")).toDF("url", "ts_s", "text")
    val idx = WebNormalize.cdxIndex(caps).collect()
    // globally sorted by (surt, ts)
    val keys = idx.map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(keys == keys.sorted)
    // the three captures of p1 folded onto ONE surt, in ts order
    val p1 = idx.filter(_.getString(0) == "example,site)/p1")
    assert(p1.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // digest tracks content: captures 1-2 equal, 3 differs
    assert(p1(0).getString(2) == p1(1).getString(2))
    assert(p1(2).getString(2) != p1(0).getString(2))
    assert(p1.forall(_.getLong(3) == 7L))
  }
}
