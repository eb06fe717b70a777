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
}
