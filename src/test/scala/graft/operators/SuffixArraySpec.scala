package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Distributed suffix array (prefix doubling): full-array parity with
  * brute-force sorted suffixes, exact duplicated-span detection vs the
  * exhaustive gram truth, and agreement with the winnowing path —
  * two independent algorithms, one answer. */
class SuffixArraySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def prose(docId: Int, words: Int): String =
    (0 until words).map(w => s"w${docId}x$w").mkString(" ")

  private def df(docs: Seq[(String, String)]) = {
    import spark.implicits._
    docs.toDF("url", "text")
  }

  /** Brute-force suffix array: row_number over (suffix, url, pos). */
  private def bruteSa(docs: Seq[(String, String)]): Seq[(String, Long, Long)] = {
    val suffixes = for {
      (url, text) <- docs
      p <- 1 to text.length
    } yield (text.substring(p - 1), url, p.toLong)
    suffixes.sorted.zipWithIndex.map { case ((_, url, p), i) => (url, p, i + 1L) }
  }

  /** Exhaustive gram truth: merged per-url spans of positions whose L-gram
    * occurs verbatim at another url (same-doc repeats do NOT count). */
  private def bruteSpans(
      docs: Seq[(String, String)], L: Int): Map[String, Seq[(Long, Long)]] = {
    val grams = for {
      (url, t) <- docs
      i <- 0 to t.length - L
    } yield (t.substring(i, i + L), url, i + 1L)
    val byGram = grams.groupBy(_._1)
    val dup = grams.filter { case (g, u, _) => byGram(g).exists(_._2 != u) }
    dup.groupBy(_._2).map { case (u, ps) =>
      val sorted = ps.map(p => (p._3, p._3 + L)).sorted
      val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sorted.foreach { case (s, e) =>
        merged.lastOption match {
          case Some((ls, le)) if s <= le => merged(merged.length - 1) = (ls, math.max(le, e))
          case _ => merged += ((s, e))
        }
      }
      u -> merged.toSeq
    }
  }

  private def collectedSa(docs: Seq[(String, String)]): Seq[(String, Long, Long)] =
    SuffixArray.suffixArray(spark, df(docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  private def collectedSpans(
      docs: Seq[(String, String)], L: Int): Map[String, Seq[(Long, Long)]] =
    SuffixArray.dupSpans(spark, df(docs), L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(x => (x._2, x._3)).sorted.toSeq }

  test("suffix array matches brute-force sorted suffixes, ties and prefixes included") {
    // identical docs (pure cross-doc ties), a doc that is a proper prefix of
    // another (shorter-suffix-first ordering), and ordinary distinct prose
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      "u/a" -> shared,
      "u/b" -> shared,
      "u/c" -> (shared + " with a longer tail of extra words"),
      "u/d" -> prose(4, 12),
      "u/e" -> prose(5, 9))
    assert(collectedSa(docs) == bruteSa(docs).sorted)
  }

  test("dupSpans matches the exhaustive gram truth on a planted corpus") {
    val passage = "Z" + ("abcdefghij" * 8) + "Y" // 82 chars, unique alphabet
    val L = 50
    val docs = Seq(
      "u/1" -> (prose(1, 30) + " " + passage + " " + prose(1, 30)),
      "u/2" -> (passage + " " + prose(2, 40)),
      // two occurrences in one doc AND shared cross-doc: both spans emit
      "u/3" -> (prose(3, 20) + " " + passage + " " + prose(3, 20) + " " + passage),
      // same-doc repeat only, never shared cross-doc: emits nothing
      "u/4" -> {
        val p = "Q" + ("klmnopqrst" * 8) + "R"
        p + " " + prose(4, 20) + " " + p
      },
      "u/5" -> prose(5, 60),
      // shorter than L: emits nothing, never keys
      "u/6" -> "tiny doc")
    assert(collectedSpans(docs, L) == bruteSpans(docs, L))
    assert(!collectedSpans(docs, L).contains("u/4"))
    assert(!collectedSpans(docs, L).contains("u/6"))
  }

  test("agrees with the winnowing path: two algorithms, one answer") {
    val passage = " " + ("shared boilerplate passage " * 10) // 271 chars
    val cfg = SubstringDup.Config() // minSubstr 200
    val docs = (0 until 12).map(i => s"u/$i" -> (prose(i, 60) + (if (i % 3 == 0) passage else "")))
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = docs.toDF("url", "text")
      .withColumn("nk", graft.functions.gf.natural_sort_key(col("url")))
    val viaWinnow = SubstringDup.dupSpans(spark, d, cfg)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaSa = SuffixArray.dupSpans(spark, docs.toDF("url", "text"), cfg.minSubstr)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSa == viaWinnow)
    assert(viaSa.nonEmpty)
  }

  test("keep-one: spans cut only where an (nk, url)-earlier doc shares the gram") {
    val passage = "Z" + ("abcdefghij" * 8) + "Y" // 82 chars
    val L = 50
    // url "1" is the order-minimal sharer: keeps, never cut; "2" and "3"
    // are cut; "4" shares nothing
    val docs = Seq(
      "1" -> (prose(1, 25) + " " + passage),
      "2" -> (passage + " " + prose(2, 25)),
      "3" -> (prose(3, 10) + " " + passage + " " + prose(3, 10)),
      "4" -> prose(4, 40))
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = docs.toDF("url", "text")
      .withColumn("nk", graft.functions.gf.natural_sort_key(col("url")))
    val got = SuffixArray.dupSpansKeepOne(spark, d, L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // truth: grams shared with a strictly earlier doc (url order here is
    // doc order), merged
    val grams = for { (u, t) <- docs; i <- 0 to t.length - L } yield (t.substring(i, i + L), u, i + 1L)
    val byGram = grams.groupBy(_._1)
    val expect = grams
      .filter { case (g, u, _) => byGram(g).exists(_._2 < u) }
      .groupBy(_._2).toSeq.flatMap { case (u, ps) =>
        val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        ps.map(p => (p._3, p._3 + L)).sorted.foreach { case (s, e) =>
          merged.lastOption match {
            case Some((ls, le)) if s <= le => merged(merged.length - 1) = (ls, math.max(le, e))
            case _ => merged += ((s, e))
          }
        }
        merged.map { case (s, e) => (u, s, e) }
      }.toSet
    assert(got == expect)
    assert(!got.exists(_._1 == "1") && got.exists(_._1 == "2") && got.exists(_._1 == "3"))
    // agreement with the pair-oriented winnowing variant at its native L
    val cfg = SubstringDup.Config(minSubstr = 50, anchorK = 20)
    val viaPairs = SubstringDup.dupSpansKeepOne(spark, d, cfg)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == viaPairs)
  }

  test("all-unique corpus: early-stopped ranks still yield an empty span set") {
    val docs = (0 until 6).map(i => s"u/$i" -> prose(i, 40))
    assert(collectedSpans(docs, 50).isEmpty)
  }
}
