package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MirrorsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("hostOverlap: containment pairs, fan-out cap, url-multiplicity collapse") {
    import spark.implicits._
    val pages = Seq(
      // boilerplate t0 on 4 hosts — above cap 3, must not create pairs
      ("A", "t0"), ("B", "t0"), ("C", "t0"), ("D", "t0"),
      // host A content (t1 twice: multiplicity collapses)
      ("A", "t1"), ("A", "t1"), ("A", "t2"), ("A", "t3"), ("A", "t4"),
      // host B mirrors t1, t2 and has its own t5
      ("B", "t1"), ("B", "t2"), ("B", "t5"),
      // host C has its own t6 only
      ("C", "t6"))
      .toDF("host", "text")
    val got = Mirrors.hostOverlap(pages,
        maxHostsPerDigest = 3, minShared = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // sizes include the capped digest: A=5, B=4, C=2, D=1
    assert(got.toSeq == Seq(("A", "B", 2L, 5L, 4L, 500L)), s"got ${got.toSeq}")
  }

  test("hostOverlap: minShared=1 keeps single-digest pairs; cap respects pairs at the cap") {
    import spark.implicits._
    val pages = Seq(
      ("A", "x"), ("B", "x"),           // exactly 2 hosts = at cap 2
      ("A", "y"), ("B", "z"), ("C", "w"))
      .toDF("host", "text")
    val got = Mirrors.hostOverlap(pages,
        maxHostsPerDigest = 2, minShared = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq(("A", "B", 1L, 500L)), s"got ${got.toSeq}")
  }

  test("retireMirrors: smaller side loses, ties break to the larger name, rest stay") {
    import spark.implicits._
    val pages = Seq(
      // B mirrors 2 of A's 3 docs (B is smaller → retires)
      ("A", "t1"), ("A", "t2"), ("A", "t3"),
      ("B", "t1"), ("B", "t2"),
      // C and D are identical twins (tie → D retires)
      ("C", "x1"), ("C", "x2"), ("D", "x1"), ("D", "x2"),
      // E is unmirrored
      ("E", "y1"))
      .toDF("host", "text")
    val got = Mirrors.retireMirrors(pages, maxHostsPerDigest = 8,
        minShared = 2, minPermille = 800L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      "A" -> ((3L, false)), "B" -> ((2L, true)),
      "C" -> ((2L, false)), "D" -> ((2L, true)),
      "E" -> ((1L, false))), s"got $got")
  }

  test("hostOverlap validates its knobs") {
    import spark.implicits._
    val pages = Seq(("A", "t")).toDF("host", "text")
    intercept[IllegalArgumentException] {
      Mirrors.hostOverlap(pages, maxHostsPerDigest = 1)
    }
    intercept[IllegalArgumentException] {
      Mirrors.hostOverlap(pages, minShared = 0L)
    }
  }
}
