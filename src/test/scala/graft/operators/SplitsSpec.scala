package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("host and registered domain: subdomains collapse, short hosts pass through") {
    import spark.implicits._
    val df = Seq(
      "https://www.news.example/a/b.html",
      "https://cdn.assets.news.example/x?q=1",
      "https://news.example/",
      "https://example/bare",
      "http://a.b.co/p#frag")
      .toDF("url")
      .select(
        Splits.host(col("url")).as("h"),
        Splits.registeredDomain(col("url")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(df(0) == (("www.news.example", "news.example")))
    assert(df(1) == (("cdn.assets.news.example", "news.example")))
    assert(df(2) == (("news.example", "news.example")))
    assert(df(3) == (("example", "example"))) // single label passes through
    assert(df(4) == (("a.b.co", "b.co")))
  }

  test("public-suffix awareness: co.uk-class sites stay distinct, bare suffixes are nobody's domain") {
    import spark.implicits._
    val df = Seq(
      "https://bbc.co.uk/news",
      "https://news.bbc.co.uk/story.html",
      "https://media.news.bbc.co.uk/clip",
      "https://argos.co.uk/catalogue",
      "https://co.uk/",                        // bare 2-label suffix
      "https://www.example.com.au/x",
      "https://school.k12.ca.us/home",
      "https://district.school.k12.ca.us/a",
      "https://k12.ca.us/",                    // bare 3-label suffix
      "https://city.ca.us/hall",               // state.us is itself a suffix
      "https://plain.example.com/y")
      .toDF("url")
      .select(Splits.registeredDomain(col("url")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(df(0) == "bbc.co.uk")
    assert(df(1) == "bbc.co.uk", "news.bbc.co.uk must split WITH bbc.co.uk")
    assert(df(2) == "bbc.co.uk")
    assert(df(3) == "argos.co.uk", "argos.co.uk must NOT fuse with bbc.co.uk")
    assert(df(4) == null, "co.uk is a public suffix, never a domain")
    assert(df(5) == "example.com.au")
    assert(df(6) == "school.k12.ca.us")
    assert(df(7) == "school.k12.ca.us")
    assert(df(8) == null, "k12.ca.us is a public suffix, never a domain")
    assert(df(9) == "city.ca.us")
    assert(df(10) == "example.com")
  }

  test("leak-freedom: every page of a domain lands on exactly one side") {
    import spark.implicits._
    // 200 domains × {bare, www, deep-sub} × 3 paths = 1800 pages
    val urls = for {
      d <- 0 until 200
      sub <- Seq("", "www.", "a.b.")
      p <- 0 until 3
    } yield s"https://${sub}site$d.example/p$p.html"
    val out = Splits.domainSplit(urls.toDF("url"))
    val domains = out.select("domain").distinct().count()
    val domainSides = out.select("domain", "split").distinct().count()
    assert(domains == 200L)
    assert(domainSides == domains, "a domain appeared in more than one split")
    // subdomain variants of one site share the bare host's assignment
    val persite = out.where(col("domain") === "site0.example")
      .select("split").distinct().count()
    assert(persite == 1L)
  }

  test("fractions are over domains, deterministic, and a giant domain moves whole") {
    import spark.implicits._
    // 2000 single-page domains + one domain with 500 pages
    val urls = (0 until 2000).map(d => s"https://solo$d.example/x.html") ++
      (0 until 500).map(p => s"https://giant.example/p$p.html")
    val df = urls.toDF("url")
    val out = Splits.domainSplit(df).cache()
    try {
      val byDomain = out.select("domain", "split").distinct()
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // Bernoulli over 2001 domains at 0.8/0.1/0.1; 5σ ≈ 90 on train
      assert(math.abs(byDomain("train") - 1601L) < 95, byDomain.toString)
      assert(out.where(col("domain") === "giant.example")
        .select("split").distinct().count() == 1L)
      // pure function of (domain, seed): reruns identical
      val a = out.orderBy("url").collect().map(_.getString(2))
      val b = Splits.domainSplit(df).orderBy("url").collect().map(_.getString(2))
      assert(a.sameElements(b))
    } finally out.unpersist()
  }

  test("bad fractions rejected") {
    import spark.implicits._
    val df = Seq("https://a.example/").toDF("url")
    intercept[IllegalArgumentException] {
      Splits.domainSplit(df, fTrain = 0.9, fValid = 0.2)
    }
  }
}
