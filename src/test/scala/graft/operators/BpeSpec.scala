package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Independent in-memory BPE (list-of-symbols, no marker encoding) to
    * cross-check the distributed trainer's string-replace formulation. */
  private def referenceBpe(
      texts: Seq[String],
      rounds: Int): (Seq[(String, String, Long)], Map[String, Int]) = {
    val wc = texts
      .flatMap(_.split("[ \\t\\n\\f\\r]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[String, Vector[String]] =
      wc.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + wc(w)
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, rr), c) = pairCounts.toSeq
          .sortBy { case ((l, rr), c) => (-c, l, rr) }.head
        merges += ((l, rr, c))
        vocab = vocab.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              out += (l + rr); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
        r += 1
      }
    }
    (merges.toSeq, vocab.view.mapValues(_.length).toMap)
  }

  test("learned merges match an independent symbol-list implementation") {
    import spark.implicits._
    val texts = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wide wider widest wide",
      "lower newer wider lowest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, rounds = 10)
    val (want, _) = referenceBpe(texts, rounds = 10)
    assert(got.map(m => (m.lhs, m.rhs, m.pairCount)) == want)
    assert(got.map(_.round) == (1 to got.length))
  }

  test("token counts under the merges match the reference implementation") {
    import spark.implicits._
    val texts = Seq(
      "banana bandana ban banana",
      "an analog annal banal",
      "nab nabs bans bananas")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, rounds = 8)
    val (_, tokensPerWord) = referenceBpe(texts, rounds = 8)
    val got = docs
      .select(col("doc_id"), Bpe.tokenCountUnderMerges(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split("\\s+").filter(_.nonEmpty)
        .map(w => tokensPerWord(w).toLong).sum
    }.toMap
    assert(got == want)
  }

  test("left-to-right non-overlapping merge order (aaa -> [aa, a])") {
    import spark.implicits._
    // one word 'aaaa': round 1 merges (a,a) count 3; left-to-right gives
    // [aa, aa], so round 2 merges (aa,aa) and the word is ONE token
    val docs = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, rounds = 2)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "a"), ("aa", "aa")))
    val n = docs.select(Bpe.tokenCountUnderMerges(col("text"), merges))
      .collect().head.getLong(0)
    assert(n == 1L)
  }

  test("merges never cross a word boundary or match mid-symbol") {
    import spark.implicits._
    // 'ab' is merged from "ab ab ab"; the text "xa b" must stay 3 tokens
    // (the 'a' inside no word precedes a 'b' within the same word)
    val train = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(train, rounds = 1)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
    val probe = Seq((0L, "xa b"), (1L, "ab xab")).toDF("doc_id", "text")
    val got = probe.select(col("doc_id"),
      Bpe.tokenCountUnderMerges(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 3L) // x,a | b — no cross-word merge
    assert(got(1L) == 3L) // ab | x,ab — mid-word merge applies, prefix intact
  }

  test("early stop when the vocabulary is fully merged") {
    import spark.implicits._
    val docs = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, rounds = 50)
    assert(merges.length == 1) // after (a,b) there are no pairs left
  }

  test("rounds must be positive") {
    import spark.implicits._
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Bpe.trainMerges(docs, rounds = 0))
  }
}
