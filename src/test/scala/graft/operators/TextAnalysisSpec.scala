package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def langOf(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextAnalysis.langId(col("text")).as("l"))
      .head().getString(0)
  }

  test("langId: stopword signals for en/de/fr/es") {
    assert(langOf("the cat and the dog of it") == "en")
    assert(langOf("der hund und die katze ist nicht da") == "de")
    assert(langOf("le chat et la chose est dans une boîte pour que") == "fr")
    assert(langOf("el perro y los gatos en un parque con una cosa") == "es")
  }

  test("langId: CJK codepoints dominate any stopword signal (zh rule)") {
    assert(langOf("这是一个测试文档") == "zh")
    // mixed content: any CJK presence wins — whitespace stopwords carry no
    // signal for an unsegmented script
    assert(langOf("the 中文 document") == "zh")
  }

  test("langId: no signal → und") {
    assert(langOf("zzz qqq xxx") == "und")
    assert(langOf("") == "und")
  }

  test("topBigramFraction: repetitive ≈ 4/7, varied low, sub-bigram text 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // 7 bigrams, "spam ham" ×4
      (2L, "a b c d e f g h"),
      (3L, "one")).toDF("doc_id", "text")
    val r = TextAnalysis.topBigramFraction(d)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 4.0 / 7) < 1e-8)
    assert(math.abs(r(2L) - 1.0 / 7) < 1e-8)
    assert(r(3L) == 0.0)
  }

  test("gopherRepetition: hand-computed line/paragraph/n-gram signals") {
    import spark.implicits._
    val d = Seq(
      // lines: [x y, x y, "", x y, z w] → dup_line_frac 2/5, dup chars
      // 2×3 over 12; paragraphs: [x y\nx y, x y\nz w] → no dup paragraph
      (1L, "x y\nx y\n\nx y\nz w"),
      // single line, 6 words: top 2-gram "spam ham" ×3 (24 of 26 chars);
      // 3-grams both ×2 — "spam ham spam" (13) wins the (cnt, len) tie,
      // dup covers 13+12; top 4-gram ×2 len 17 (34/26 — the standard
      // uncorrected form exceeds 1 on pathological text)
      (2L, "spam ham spam ham spam ham"),
      (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    def g(id: Long, c: String): Double =
      r(id).getDouble(r(id).fieldIndex(c))
    assert(math.abs(g(1L, "dup_line_frac") - 0.4) < 1e-9)
    assert(math.abs(g(1L, "dup_line_char_frac") - 0.5) < 1e-9)
    assert(g(1L, "dup_para_frac") == 0.0)
    assert(g(1L, "dup_para_char_frac") == 0.0)
    assert(math.abs(g(2L, "top_2gram_char_frac") - 24.0 / 26) < 1e-6)
    assert(math.abs(g(2L, "dup_2gram_char_frac") - 24.0 / 26) < 1e-6)
    assert(math.abs(g(2L, "top_3gram_char_frac") - 1.0) < 1e-6)
    assert(math.abs(g(2L, "dup_3gram_char_frac") - 25.0 / 26) < 1e-6)
    assert(math.abs(g(2L, "top_4gram_char_frac") - 34.0 / 26) < 1e-6)
    assert(math.abs(g(2L, "dup_4gram_char_frac") - 17.0 / 26) < 1e-6)
    // empty text: every signal a deterministic 0.0, no NaN
    assert((2 to 4).forall(n => g(3L, s"top_${n}gram_char_frac") == 0.0))
    assert(g(3L, "dup_line_frac") == 0.0 && g(3L, "dup_line_char_frac") == 0.0)
  }

  test("noveltyFrac: exact copies read 0, unique docs 1, partial overlap in between") {
    import spark.implicits._
    // 10-word docs → three 8-grams each (distinct within doc)
    val a = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10" // copied twice → all grams shared
    val u = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10" // fully unique
    // v = u's words 3..10 + two new → exactly one gram window shared with u
    val v = "u3 u4 u5 u6 u7 u8 u9 u10 v1 v2"
    val docs = Seq(
      (1L, a), (2L, a), // planted pair
      (3L, u), (4L, v),
      (5L, "short text") // < 8 words → gramless
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyFrac(docs, n = 8)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (3L, 0L, 0.0) && got(2L) == (3L, 0L, 0.0))
    // u's grams: [u1..u8],[u2..u9],[u3..u10]; v's: [u3..u10],[u4..v1],[u5..v2]
    // shared gram: [u3..u10] → u novel 2/3, v novel 2/3
    assert(got(3L) == (3L, 2L, 0.666667) && got(4L) == (3L, 2L, 0.666667))
    assert(got(5L) == (0L, 0L, 1.0))
  }

  test("vocabTopK: tf/df counts, tf-desc order, lexicographic tie-break, k cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b a"), // b tf 2 here, a 1
      (2L, "a c\tb"), // tab-split; a 1, c 1, b 1
      (3L, "c a") // a 1, c 1
    ).toDF("doc_id", "text")
    // totals: a tf 3 df 3, b tf 3 df 2, c tf 2 df 2
    val got = TextAnalysis.vocabTopK(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 3L, 3L), ("b", 3L, 2L)),
      s"tie at tf=3 breaks to 'a' first; got ${got.toSeq}")
    val all = TextAnalysis.vocabTopK(docs, k = 10).collect()
    assert(all.length == 3 && all.last.getString(0) == "c")
  }

  test("vocabCoverage: cumulative stream share in integer permille, k cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b a"),
      (2L, "a c\tb"),
      (3L, "c a"))
      .toDF("doc_id", "text")
    // stream mass 8: a tf 3, b tf 3, c tf 2; order a, b, c
    val got = TextAnalysis.vocabCoverage(docs, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1, "a", 3L, 3L, 8L, 375L),    // 3000/8 = 375
      (2, "b", 3L, 6L, 8L, 750L)),   // 6000/8 = 750
      s"got ${got.toSeq}")
    val all = TextAnalysis.vocabCoverage(docs, k = 10).collect()
    assert(all.length == 3 && all.last.getLong(5) == 1000L,
      "full head covers the whole stream (permille 1000)")
  }

  test("token counts: whitespace and BPE-ish") {
    import spark.implicits._
    val r = Seq("Hello, world! 42 times").toDF("text")
      .select(
        TextAnalysis.tokenCountWs(col("text")).as("ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("bpe"))
      .head()
    assert(r.getInt(0) == 4)
    // Hello , world ! 42 times → 6 BPE-ish pieces
    assert(r.getInt(1) == 6)
  }

  test("tfidfTopTerms matches the hand-computed integer ranking") {
    import spark.implicits._
    // N=4; "common" in all 4 (idf 0), "pair" in 2, "solo*" in 1 each
    val d = Seq(
      (1L, "common pair solo1 solo1 solo1"),
      (2L, "common pair"),
      (3L, "common solo3"),
      (4L, "common common"))
      .toDF("doc_id", "text")
    def idf(df: Long) = math.round((math.log(4d) - math.log(df.toDouble)) * 1e6)
    val got = TextAnalysis.tfidfTopTerms(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == Map(
      (1L, 1) -> (("solo1", 3L, 1L, 3 * idf(1))),
      (1L, 2) -> (("pair", 1L, 2L, idf(2))),
      (2L, 1) -> (("pair", 1L, 2L, idf(2))),
      (2L, 2) -> (("common", 1L, 4L, 0L)),
      (3L, 1) -> (("solo3", 1L, 1L, idf(1))),
      (3L, 2) -> (("common", 1L, 4L, 0L)),
      (4L, 1) -> (("common", 2L, 4L, 0L))))
  }

  test("tfidfTopTerms plans a WindowGroupLimit (map-side top-k before the exchange)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    (1L to 50L).map(i => (i, s"w$i x y z")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val plan = TextAnalysis.tfidfTopTerms(spark.read.parquet(dir), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }
}
