package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SyntheticCorpus

class TextExtractSpec extends AnyFunSuite {

  test("strips tags, drops script/style bodies, decodes entities, collapses ws") {
    val html =
      """<html><head><title></title><STYLE>p{color:red}</STYLE></head>
        |<body><script type="x">var a = "<p>not text</p>";</script>
        |<p>Hello &amp; welcome to  &lt;Spark&gt;&nbsp;&quot;world&#39;s&quot; engine</p>
        |</body></html>""".stripMargin
    assert(TextExtract.extractText(html) ==
      "Hello & welcome to <Spark> \"world's\" engine")
  }

  test("title text is kept (only script/style bodies drop); tags add no whitespace") {
    assert(TextExtract.extractText("<title>T</title><p>body</p>") == "Tbody")
    assert(TextExtract.extractText("<title>T</title> <p>body</p>") == "T body")
  }

  test("unterminated tag and unterminated script are tolerated") {
    assert(TextExtract.extractText("a <b unterminated") == "a")
    assert(TextExtract.extractText("a <script>never closed") == "a")
  }

  test("unknown entities pass through; utf-8 multibyte survives") {
    assert(TextExtract.extractText("&unknown; café 中文") == "&unknown; café 中文")
  }

  test("round trip: extractText(html) == text byte-identically on fixture corpus") {
    val corpus = SyntheticCorpus.local(300)
    corpus.pages.foreach { p =>
      val extracted = TextExtract.extractText(p.html)
      assert(
        java.util.Arrays.equals(extracted.getBytes(UTF_8), p.text.getBytes(UTF_8)),
        s"mismatch for ${p.url}")
    }
  }

  test("escape/extract inverse on entity-heavy text") {
    val text = "a&b <c> 'd' \"e\" café"
    val html = "<p>" + TextExtract.escape(text) + "</p>"
    assert(TextExtract.extractText(html) == text)
  }
}
