package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class QualityFiltersSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def gopher(texts: (Long, String)*): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    QualityFilters.gopherQuality(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  private val goodDoc: String = {
    // 60 plain words incl. stop words, mean length in [3,10]
    val ws = Seq("the", "quick", "brown", "fox", "jumps", "over", "the",
      "lazy", "dog", "with", "style")
    Iterator.continually(ws).flatten.take(60).mkString(" ")
  }

  test("gopher: a clean document passes every rule") {
    val m = gopher(1L -> goodDoc)(1L)
    assert(m.getAs[Boolean]("passes"))
    assert(m.getAs[Long]("n_words") == 60)
    assert(m.getAs[Double]("alpha_frac") == 1.0)
    assert(m.getAs[Long]("stop_hits") >= 2)
  }

  test("gopher: word-count floor rejects short docs") {
    val m = gopher(1L -> "the dog and the fox have fun with that")(1L)
    assert(m.getAs[Long]("n_words") < 50)
    assert(!m.getAs[Boolean]("passes"))
  }

  test("gopher: symbol ratio catches hash spam") {
    val spam = goodDoc + " " + Seq.fill(10)("#").mkString(" ")
    val m = gopher(1L -> spam)(1L)
    assert(m.getAs[Double]("symbol_ratio") > 0.1)
    assert(!m.getAs[Boolean]("passes"))
  }

  test("gopher: bullet and ellipsis line fractions") {
    val bullets = (1 to 10).map(i => s"- $goodDoc").mkString("\n")
    val mb = gopher(1L -> bullets)(1L)
    assert(mb.getAs[Double]("bullet_frac") == 1.0)
    assert(!mb.getAs[Boolean]("passes"))

    val dots = (1 to 10).map(_ => s"$goodDoc...").mkString("\n")
    val md = gopher(2L -> dots)(2L)
    assert(md.getAs[Double]("ellipsis_frac") == 1.0)
    assert(!md.getAs[Boolean]("passes"))
  }

  test("gopher: alphabetic-word floor and stop-word floor") {
    val numeric = Iterator.continually(Seq("123", "456", "the", "word"))
      .flatten.take(60).mkString(" ")
    val mn = gopher(1L -> numeric)(1L)
    assert(mn.getAs[Double]("alpha_frac") < 0.8)
    assert(!mn.getAs[Boolean]("passes"))

    val noStops = Iterator.continually(Seq("alpha", "beta", "gamma", "delta"))
      .flatten.take(60).mkString(" ")
    val ms = gopher(2L -> noStops)(2L)
    assert(ms.getAs[Long]("stop_hits") == 0)
    assert(!ms.getAs[Boolean]("passes"))
  }

  test("gopher: mean word length bounds") {
    val tiny = Seq.fill(60)("a b").mkString(" ") // mean length 1
    assert(!gopher(1L -> tiny)(1L).getAs[Boolean]("passes"))
    val long = Seq.fill(60)("incomprehensibilities").mkString(" ") // 21 chars
    val m = gopher(2L -> long)(2L)
    assert(m.getAs[Double]("mean_word_len") > 10.0)
    assert(!m.getAs[Boolean]("passes"))
  }

  private def c4(texts: (Long, String)*): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    QualityFilters.c4Clean(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("c4: keeps terminal-punctuation lines with >=3 words, in order") {
    val doc = Seq(
      "this line ends with a period.",
      "this one has no terminal punctuation",
      "short.",
      "is this a question?",
      "javascript must be enabled to proceed.",
      "var config = { a: 1 };",
      "the final line stands here!").mkString("\n")
    val r = c4(1L -> doc)(1L)
    assert(r.getAs[String]("clean_text") == Seq(
      "this line ends with a period.",
      "is this a question?",
      "the final line stands here!").mkString("\n"))
    assert(r.getAs[Long]("n_kept") == 3)
    assert(r.getAs[Long]("n_dropped") == 4)
    assert(r.getAs[Boolean]("doc_kept"))
  }

  test("c4: lorem ipsum kills the doc even when its lines are clean") {
    val doc = Seq(
      "a perfectly ordinary first sentence.",
      "more lorem ipsum filler follows here.",
      "and a third one closes it.").mkString("\n")
    val r = c4(1L -> doc)(1L)
    assert(r.getAs[Long]("n_kept") == 3)
    assert(!r.getAs[Boolean]("doc_kept"))
  }

  test("c4: docs left with too few lines are dropped") {
    val r = c4(1L -> "only one surviving sentence here.\nno punct\nnope")(1L)
    assert(r.getAs[Long]("n_kept") == 1)
    assert(!r.getAs[Boolean]("doc_kept"))
  }

  test("gopher: empty and whitespace-only docs fail deterministically, no NaN") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   \n\t  ")).toDF("doc_id", "text")
    val rows = QualityFilters.gopherQuality(df).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") == 0L)
      Seq("mean_word_len", "symbol_ratio", "alpha_frac").foreach { c =>
        assert(r.getAs[Double](c) == 0.0, s"$c must be a clean 0.0, not NaN")
      }
      assert(!r.getAs[Boolean]("passes"))
    }
  }

  test("gopher and c4 are shuffle-free and split each text at most twice") {
    import spark.implicits._
    // a parquet-backed frame: local relations constant-fold the projection
    // away, which would vacuously pass the expression-count asserts
    val dir = java.nio.file.Files.createTempDirectory("qf_plan").toString
    Seq((1L, goodDoc)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    for (out <- Seq(QualityFilters.gopherQuality(df), QualityFilters.c4Clean(df))) {
      val plan = out.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"quality filters must not shuffle:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
      // the projection layering materializes the word/line arrays once —
      // an inline formulation re-splits the text once per metric (~12×)
      val splits = "split\\(text".r.findAllIn(plan).length
      assert(splits <= 2, s"text must split at most twice, saw $splits:\n$plan")
    }
  }

  test("blocklist: whole-word hits only, at edges and inner boundaries") {
    import spark.implicits._
    val docs = Seq(
      (1L, "casino"), // entire text
      (2L, "the casino pays"), // space boundaries
      (3L, "Visit CASINO!"), // case-folded, punctuation boundary
      (4L, "casinos pay out"), // plural: NOT a whole-word hit
      (5L, "no-viagra-here"), // hyphen boundaries hit
      (6L, "encyclopedia lotterylike"), // embedded: no hit
      (7L, "win the lottery")).toDF("doc_id", "text")
    val out = QualityFilters.blocklistFlag(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> true))
  }

  test("domain blocklist: registered-domain match catches every subdomain; no-host rows pass") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://bad.example/page"), // exact listed domain
      (2L, "https://a.b.bad.example/x"), // deep subdomain of a listed site
      (3L, "https://goodbad.example/x"), // different registered domain
      (4L, "https://ok.example/x"),
      (5L, "not a url at all"), // no host → domain '' → passes
      (6L, "https://WWW.Bad.Example/up"), // case-folded
      (7L, "https://deep.host.example/x"), // HOST-level list entry hits
      (8L, "https://other.host.example/x"), // sibling host passes
      (9L, null.asInstanceOf[String]) // null url → domain '' → kept, passes
    ).toDF("doc_id", "url")
    val blocked = Seq("bad.example", "deep.host.example").toDF("domain")
    val got = QualityFilters.flagBlockedDomains(pages, blocked)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("domain"), r.getAs[Boolean]("blocked"))).toMap
    assert(got.size == 9, "flag-don't-drop: every input row survives")
    assert(got(1L) == ("bad.example", true))
    assert(got(2L) == ("bad.example", true))
    assert(got(3L) == ("goodbad.example", false))
    assert(got(4L) == ("ok.example", false))
    assert(got(5L) == ("", false))
    assert(got(6L) == ("bad.example", true))
    assert(got(7L) == ("host.example", true), "host-level entry must hit")
    assert(got(8L) == ("host.example", false))
    assert(got(9L) == ("", false))
  }

  test("domain quality gate: content farm drops whole, good site survives its bad page") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://a.good.example/1", 100),
      (2L, "https://b.good.example/2", 10), // one bad page on a good site
      (3L, "https://farm.example/1", 10),
      (4L, "https://x.farm.example/2", 20), // subdomain pools with its site
      (5L, "https://solo.example/1", 55),
      (6L, null.asInstanceOf[String], 10) // null url: kept, pools under ''
    ).toDF("doc_id", "url", "score")
    val got = QualityFilters.domainQualityFlag(pages, minMean = 50.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("domain_mean"), r.getAs[Boolean]("low_quality_domain"))).toMap
    assert(got.size == 6, "flag-don't-drop: a null url must not vanish in the stats join")
    assert(got(1L) == (55.0, false) && got(2L) == (55.0, false))
    assert(got(3L) == (15.0, true) && got(4L) == (15.0, true))
    assert(got(5L) == (55.0, false))
    assert(got(6L) == (10.0, true))
  }

  test("blocklist: custom list validated, non-word terms rejected") {
    import spark.implicits._
    val docs = Seq((1L, "foo bar")).toDF("doc_id", "text")
    val hit = QualityFilters.blocklistFlag(docs, words = Seq("bar"))
      .collect()(0).getBoolean(1)
    assert(hit)
    intercept[IllegalArgumentException] {
      QualityFilters.blocklistFlag(docs, words = Seq("has space"))
    }
    intercept[IllegalArgumentException] {
      QualityFilters.blocklistFlag(docs, words = Seq.empty)
    }
  }

  test("paragraphLinkDensity: hand-computed lengths, flag boundary, empty par") {
    import spark.implicits._
    val pages = Seq(("u1",
      "<html><p>plain text here</p>" +                                // 15, 0
        "<p>see <a href=\"/x\">this link</a> and <a href=\"/y\">that</a> ok</p>" + // 25, 13
        "<p class=\"nav\"><a href=\"/a\">Home</a><a href=\"/b\">About</a></p>" +  // 9, 9
        "<p>  </p></html>"))                                          // 0, 0
      .toDF("url", "html")
    val got = QualityFilters.paragraphLinkDensity(pages).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got == Map(
      0 -> ((15L, 0L, false)),
      1 -> ((25L, 13L, true)),   // 1300 > 1250: just over 50%
      2 -> ((9L, 9L, true)),
      3 -> ((0L, 0L, true))))    // nothing visible → boiler
    // exactly 50% stays (strict >): 10 visible, 5 linked
    val edge = Seq(("u2", "<p>abcde<a href=\"/z\">fghij</a></p>"))
      .toDF("url", "html")
    val e = QualityFilters.paragraphLinkDensity(edge).head()
    assert((e.getLong(2), e.getLong(3), e.getBoolean(4)) == ((10L, 5L, false)))
  }

  test("mojibake: three damage classes counted, integer threshold rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean prose with nothing wrong at all"),
      // 1 repl + 2 ctrl + 2 double-encoding pairs = 5 damage chars
      (2L, "x \uFFFD y \u0001\u0002 a\u00C3\u00A9b c\u00C2\u0080d tail"),
      // tab/newline/CR are NOT control damage
      (3L, "a\tb\nc\rd"),
      // C3 followed by a non-continuation char is not a pair
      (4L, "stra\u00C3ze plain"))
      .toDF("doc_id", "text")
    val got = QualityFilters.mojibake(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))))
      .toMap
    assert(got(1L)._5 == false && got(1L)._2 == 0 && got(1L)._3 == 0)
    val (n2, repl2, ctrl2, dbl2, flag2) = got(2L)
    assert((repl2, ctrl2, dbl2) == ((1L, 2L, 2L)), s"doc2: ${got(2L)}")
    assert(flag2 == (5000L > n2 * 2), "threshold rule replays")
    assert(got(3L) == ((7L, 0L, 0L, 0L, false)))
    assert(got(4L)._4 == 0L, "C3 + ASCII is not a double-encoding pair")
  }

  test("mojibake rejects colliding id column names") {
    import spark.implicits._
    val docs = Seq(("a", "t")).toDF("n_chars", "text")
    intercept[IllegalArgumentException] {
      QualityFilters.mojibake(docs, id = "n_chars")
    }
  }
}
