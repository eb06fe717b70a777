package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def chunksOf(text: String, max: Int, stride: Int): Seq[(Long, Long, String)] = {
    import spark.implicits._
    Chunking.chunk(Seq(("d", text)).toDF("url", "text"), max, stride)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
  }

  test("short doc = one whole chunk; empty/null docs vanish") {
    import spark.implicits._
    assert(chunksOf("a b c", 5, 3) == Seq((0L, 3L, "a b c")))
    val empty = Chunking.chunk(
      Seq(("d1", ""), ("d2", null)).toDF("url", "text"), 5, 3)
    assert(empty.count() == 0L)
  }

  test("sliding windows cover every token; tail extends overlap, no subset windows") {
    // 10 tokens, max 8, stride 4: windows [0,8) and [4,10) — NOT [8,10)
    val toks = (1 to 10).map(i => s"t$i")
    val got = chunksOf(toks.mkString(" "), 8, 4)
    assert(got == Seq(
      (0L, 8L, toks.take(8).mkString(" ")),
      (1L, 6L, toks.slice(4, 10).mkString(" "))))
    // coverage: every token appears in some chunk
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered == toks.toSet)
  }

  test("stride == max degenerates to exact non-overlapping splits") {
    val toks = (1 to 11).map(i => s"w$i")
    val got = chunksOf(toks.mkString(" "), 4, 4)
    assert(got.map(_._3) == Seq(
      "w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10 w11"))
    assert(got.map(_._2) == Seq(4L, 4L, 3L))
  }

  test("boundary: n exactly covered by a window emits no further starts") {
    // n=8, max=8, stride=4: window [0,8) covers all; start 4 must NOT fire
    val toks = (1 to 8).map(i => s"x$i")
    assert(chunksOf(toks.mkString(" "), 8, 4) ==
      Seq((0L, 8L, toks.mkString(" "))))
    // n=9: start 4 fires ([4,9) has a token the first window lacks)
    val t9 = (1 to 9).map(i => s"y$i")
    assert(chunksOf(t9.mkString(" "), 8, 4).map(_._1) == Seq(0L, 1L))
  }

  test("invalid parameters rejected") {
    import spark.implicits._
    val df = Seq(("d", "a b")).toDF("url", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, 0, 1))
    intercept[IllegalArgumentException](Chunking.chunk(df, 4, 5))
    intercept[IllegalArgumentException](Chunking.chunk(df, 4, 0))
  }
}
