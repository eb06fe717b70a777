package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Driver-side reference: the identical integer recurrence, straight
    * off the scaladoc formula. */
  private def refPageRank(
      nodes: Seq[String],
      edges: Seq[(String, String)],
      rounds: Int,
      d: Int = 85): Map[String, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val base = ((100L - d) * LinkGraph.Scale / 100L) / n
    var r = nodes.map(_ -> LinkGraph.Scale / n).toMap
    for (_ <- 1 to rounds) {
      val inflow = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      val dang = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map { h =>
        h -> (base + (d * (inflow.getOrElse(h, 0L) + dang / n)) / 100L)
      }.toMap
    }
    r
  }

  /** 12-node deterministic graph: a hub (h0) every fourth node links to,
    * two sinks (h10, h11 — dangling), a self-loop on h3, a 3-cycle. */
  private val nodes = (0 until 12).map(i => s"h$i")
  private val edges: Seq[(String, String)] =
    (0 until 12).filter(_ % 4 == 0).map(i => (s"h$i", "h0")) ++
      Seq(("h1", "h2"), ("h2", "h3"), ("h3", "h1"), ("h3", "h3"),
        ("h4", "h5"), ("h5", "h6"), ("h6", "h10"), ("h7", "h11"),
        ("h8", "h9"), ("h9", "h0"), ("h1", "h10"),
        ("h1", "h2")) // duplicate edge: must dedup

  private def run(parts: Int, rounds: Int): Map[String, Long] = {
    import spark.implicits._
    val nodesDf = nodes.toDF("host").repartition(parts)
    val edgesDf = edges.toDF("src", "dst").repartition(parts)
    LinkGraph.pageRank(nodesDf, edgesDf, rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches the integer reference recurrence across partitionings") {
    val want = refPageRank(nodes, edges, rounds = 10)
    for (parts <- Seq(1, 5, 32)) {
      assert(run(parts, 10) == want, s"parts=$parts")
    }
  }

  test("mass conservation within the documented floor-division loss") {
    val got = run(7, rounds = 10)
    val total = got.values.sum
    // floor division sheds < 1 nano-unit per div; bound: per round, one
    // div per edge + dangling split + base split ≤ (|E| + 2·N + 100)
    val slack = 10L * (edges.distinct.size + 2 * nodes.size + 100)
    assert(total <= LinkGraph.Scale)
    assert(total >= LinkGraph.Scale - slack, s"total=$total")
  }

  test("hub outranks everything; sinks beat nothing they shouldn't") {
    val got = run(7, rounds = 10)
    val hub = got("h0")
    assert(nodes.filter(_ != "h0").forall(h => got(h) < hub),
      s"h0 must dominate: $got")
    // h10 collects from two sources, h11 from one leaf: strictly more
    assert(got("h10") > got("h11"))
  }

  test("zero rounds returns the uniform init; dangling-only graph stays uniform-ish") {
    import spark.implicits._
    val n3 = Seq("a", "b", "c").toDF("host")
    val none = Seq.empty[(String, String)].toDF("src", "dst")
    val r0 = LinkGraph.pageRank(n3, none, rounds = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r0.values.toSet == Set(LinkGraph.Scale / 3))
    // with no edges all mass is dangling: every round redistributes
    // uniformly, so ranks stay equal across nodes
    val r5 = LinkGraph.pageRank(n3, none, rounds = 5)
      .collect().map(r => r.getLong(1)).toSet
    assert(r5.size == 1)
  }

  test("hostEdges: absolute quoted hrefs at host grain, relatives dropped, deduped") {
    import spark.implicits._
    val pages = Seq(
      ("http://a.example/p1",
        """<a href="http://b.example/x">l</a> <a href="http://c.example/y?q=1">m</a>
          |<a href="/relative">r</a> <a href='http://d.example/z'>single-quoted</a>
          |<a href="http://b.example/other">dup host pair</a>""".stripMargin),
      ("http://a.example/p2", "no links at all"),
      ("not-a-url", "<a href=\"http://b.example/x\">src host unparseable</a>"),
      ("http://b.example/q",
        "<a href=\"https://a.example:8443/path#frag\">port+frag stripped</a>"))
      .toDF("url", "html")
    val got = LinkGraph.hostEdges(pages)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("a.example", "b.example"), ("a.example", "c.example"),
      ("a.example", "d.example"), ("b.example", "a.example")))
  }

  test("pageWeights joins page rows to host ranks, unranked hosts get 0") {
    import spark.implicits._
    val ranks = Seq(("h0", 700L), ("h1", 300L)).toDF("host", "rank_nano")
    val pages = Seq((1L, "h0"), (2L, "h1"), (3L, "hX")).toDF("doc_id", "host")
    val got = LinkGraph.pageWeights(pages, ranks)
      .select(col("doc_id"), col("rank_nano"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 700L, 2L -> 300L, 3L -> 0L))
  }

  test("anchorEdges: href+text pairs zip positionally, normalization and drops") {
    import spark.implicits._
    val pages = Seq(
      ("http://a.example/p",
        "<a href=\"http://b.example/x\"> Click  HERE </a>" +       // normalize
          "<a href='http://c.example/y'>details</a>" +             // single quote
          "<a href=\"/rel\">rel target drops</a>" +                // relative
          "<a href=\"http://d.example/z\">   </a>" +               // empty anchor
          "<a class=\"k\" href=\"http://b.example/w\">again</a>"), // attr before
      ("notaurl", "<a href=\"http://b.example/q\">src drops</a>")) // bad src
      .toDF("url", "html")
    val got = LinkGraph.anchorEdges(pages)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set(
      ("a.example", "b.example", "click here"),
      ("a.example", "c.example", "details"),
      ("a.example", "b.example", "again")))
  }

  test("reciprocity: mutual edges counted once per direction, self-loops out") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "a"),            // mutual pair
      ("a", "c"),                        // one-way
      ("c", "c"),                        // self-loop: excluded entirely
      ("d", "a"), ("a", "d"), ("d", "b") // d: 2 out, 1 reciprocated
    ).toDF("src", "dst")
    val got = LinkGraph.reciprocity(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a" -> ((3L, 2L)),   // b,c,d out; b and d link back
      "b" -> ((1L, 1L)),
      "d" -> ((2L, 1L))))
  }

  test("anchorSummary: plurality anchor with deterministic tie-break") {
    import spark.implicits._
    val edges = Seq(
      ("s1", "t", "alpha"), ("s2", "t", "alpha"), ("s3", "t", "beta"),
      ("s1", "t", "beta"), ("s4", "t", "gamma"),        // alpha=2 beta=2 γ=1
      ("s1", "u", "only"))
      .toDF("src", "dst", "anchor")
    val got = LinkGraph.anchorSummary(edges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    // tie at cnt=2: struct max picks the lexicographically larger anchor
    assert(got == Map(
      "t" -> ((5L, 3L, "beta", 2L)),
      "u" -> ((1L, 1L, "only", 1L))))
  }

  test("frontier: canonicalized discovery minus the seen set, ref counts") {
    import spark.implicits._
    val pages = Seq(
      ("http://a.x/p1",
        "<a href=\"http://a.x/p2#frag\">s</a>" +          // seen after canon
          "<a href='http://B.x/new?utm_source=f'>n</a>" + // new (case+utm fold)
          "<a href=\"/rel\">r</a>"),                      // relative: drops
      ("http://a.x/p2",
        "<a href=\"http://b.x/new\">n</a>" +              // same new target
          "<a href=\"http://c.x/other\">o</a>"))
      .toDF("url", "html")
    val seen = Seq("http://a.x/p1", "http://a.x/p2").toDF("url")
    val got = LinkGraph.frontier(pages, seen).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "http://b.x/new" -> 2L,
      "http://c.x/other" -> 1L), s"got $got")
  }
}
