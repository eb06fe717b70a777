package graft.functions

import java.nio.charset.StandardCharsets

/** The canonical HTML→text extractor (FIXTURES.md "extractor contract").
  *
  * Semantics: decode UTF-8; drop `<script>…</script>` and `<style>…</style>`
  * blocks (case-insensitive); strip all remaining tags; decode exactly the
  * entity set {&amp; &lt; &gt; &quot; &#39; &nbsp;}; collapse whitespace runs
  * to single spaces; trim.
  *
  * This single function is shared by the synthetic-corpus generator
  * (graft.sources.SyntheticCorpus) and the pipeline's Catalyst expression
  * (graft.functions.ExtractText) so the per-row invariant
  * `extractText(html) == text` (BASELINE.json input_hint) holds byte-for-byte
  * by construction and is testable as a real round trip.
  *
  * Reference analog: row construction from raw sources with corrupt-input
  * tolerance (`ViewModels/MainViewModel.cs:874-940`).
  */
object TextExtract {

  def extractText(html: Array[Byte]): String =
    extractText(new String(html, StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    val n = html.length
    val stripped = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (regionMatchesIgnoreCase(html, i + 1, "script")) {
          i = skipElement(html, i, "script")
        } else if (regionMatchesIgnoreCase(html, i + 1, "style")) {
          i = skipElement(html, i, "style")
        } else {
          // strip tag: advance past the next '>'
          val close = html.indexOf('>', i + 1)
          i = if (close < 0) n else close + 1
        }
      } else {
        stripped.append(c)
        i += 1
      }
    }
    decodeEntitiesCollapseTrim(stripped)
  }

  /** True if html[at..) starts with `word` ignoring ASCII case. */
  private def regionMatchesIgnoreCase(s: String, at: Int, word: String): Boolean = {
    if (at + word.length > s.length) return false
    var i = 0
    while (i < word.length) {
      val a = lower(s.charAt(at + i)); val b = word.charAt(i)
      if (a != b) return false
      i += 1
    }
    true
  }

  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Skip from the '<' that opens `tag` past the matching `</tag...>`. */
  private def skipElement(s: String, openAt: Int, tag: String): Int = {
    val n = s.length
    var i = openAt + 1 + tag.length
    while (i < n) {
      if (s.charAt(i) == '<' && i + 1 < n && s.charAt(i + 1) == '/' &&
          regionMatchesIgnoreCase(s, i + 2, tag)) {
        val close = s.indexOf('>', i + 2)
        return if (close < 0) n else close + 1
      }
      i += 1
    }
    n
  }

  /** Single pass: decode the fixed entity set, collapse whitespace, trim. */
  private def decodeEntitiesCollapseTrim(sb: java.lang.StringBuilder): String = {
    val n = sb.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var c = sb.charAt(i)
      var consumed = 1
      if (c == '&') {
        val rep = matchEntity(sb, i)
        if (rep != null) { c = rep._1; consumed = rep._2 }
      }
      if (Character.isWhitespace(c)) {
        pendingSpace = out.length > 0 // leading whitespace trims away
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += consumed
    }
    out.toString // trailing pendingSpace dropped = trim
  }

  private val entities: Array[(String, Char)] = Array(
    ("&amp;", '&'), ("&lt;", '<'), ("&gt;", '>'),
    ("&quot;", '"'), ("&#39;", '\''), ("&nbsp;", ' '))

  /** (replacement char, chars consumed) or null. */
  private def matchEntity(sb: java.lang.StringBuilder, at: Int): (Char, Int) = {
    var e = 0
    while (e < entities.length) {
      val (pat, rep) = entities(e)
      if (at + pat.length <= sb.length) {
        var i = 0
        var ok = true
        while (ok && i < pat.length) {
          if (sb.charAt(at + i) != pat.charAt(i)) ok = false
          i += 1
        }
        if (ok) return (rep, pat.length)
      }
      e += 1
    }
    null
  }

  /** Inverse used by the fixture generator: escape text for embedding in HTML. */
  def escape(text: String): String = {
    val out = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '&' => out.append("&amp;")
        case '<' => out.append("&lt;")
        case '>' => out.append("&gt;")
        case '"' => out.append("&quot;")
        case '\'' => out.append("&#39;")
        case c => out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
