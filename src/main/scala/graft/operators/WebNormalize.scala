package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus canonicalization: the normalize-before-compare operators a
  * training-data pipeline runs ahead of exact dedup (CCNet/Gopher-style
  * "fuzzy exact" matching), plus PII scrubbing and URL canonicalization.
  *
  * All pure built-in Column compositions — codegen'd, no UDFs, no shuffle
  * of their own; at 100 TB they ride the same scan as the rest of the
  * projection. Every regex here sticks to the portable subset that Java
  * regex (Spark) and RE2 (DuckDB) interpret identically — explicit ASCII
  * ranges instead of `\p{Punct}` (Java's is ASCII-only, RE2's `\pP` is
  * Unicode) — so each operator carries a byte-identical DuckDB oracle
  * (`SparkEntry.oracleSql`).
  *
  * Reference analog: the cheap normalization predicates of the compare
  * cascade (case-insensitive name equality,
  * `ViewModels/MainViewModel.cs:1047-1055`; prefix similarity `:1064-1072`)
  * — equality-after-normalization as a first-class key.
  */
object WebNormalize {

  /** ASCII punctuation as explicit ranges: ! through / , : through @ ,
    * [ through backtick, { through ~ . */
  private val AsciiPunct = "[!-/:-@\\[-`{-~]+"

  /** Dedup-canonical text: lowercase, ASCII punctuation to space,
    * whitespace collapsed, trimmed. Two pages differing only in case,
    * punctuation or spacing normalize to equal strings. The whitespace
    * class is EXPLICIT rather than `\s` because Java's `\s` includes
    * vertical tab while RE2's does not (ADVICE r2) — the oracle must agree
    * byte-for-byte on VT-bearing documents. */
  def normalText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), AsciiPunct, " "),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Blocking key for normalized exact dedup: md5 of [[normalText]]. */
  def normalSha(c: Column): Column = md5(normalText(c))

  /** PII scrub: emails and NNN-NNN-NNNN phone shapes become typed tokens.
    * Deliberately conservative patterns — a production pipeline swaps in
    * jurisdiction-specific rules; the operator shape (ordered
    * regexp_replace cascade over the text column) is the contract. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>")

  /** True when the page declares a robots `noindex` directive in a meta
    * tag — the politeness gate a crawl-derived corpus applies before
    * anything else (the page's author explicitly opted out of indexing;
    * responsible corpus builders honor it for training data too, cf. the
    * robots.txt/meta-robots opt-out discussion in public corpus datacards).
    * Both attribute orders are matched (`name=… content=…` and the
    * reverse); the tag is detected case-insensitively via `lower()` so
    * `NOINDEX`/`Robots` variants gate identically. `[^>]`/`[^"']` classes
    * keep Java and RE2 byte-agreed for the oracle. Pure projection: rides
    * the scan, nothing shuffles. */
  def noindexFlag(html: Column): Column = {
    val h = lower(html)
    h.rlike("<meta [^>]*name=[\"']robots[\"'][^>]*content=[\"'][^\"']*noindex") ||
      h.rlike("<meta [^>]*content=[\"'][^\"']*noindex[^\"']*[\"'][^>]*name=[\"']robots[\"']")
  }

  /** Page title: the first `<title>…</title>` body, whitespace-collapsed
    * and trimmed (empty string when the tag is absent or empty). Titles
    * are the cheapest near-dup BLOCKING key the web offers — syndicated
    * articles and template pages share titles long before their bodies
    * hash equal — and the (host, normalized title) pair is a standard
    * crawl-dedup pre-filter. `(?is)` keeps the match case-insensitive and
    * dot-all in BOTH Java and RE2, the lazy body stops at the first close
    * tag, and `[^>]*` tolerates attributes on the open tag. Pure
    * projection: rides the scan. */
  def titleOf(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Crawl-trap key: the url with its fragment dropped and every digit
    * run collapsed to a single `N` — urls that differ only in dates, page
    * numbers, numeric session ids or offsets share one key. Grouping
    * a host's urls by this key exposes the classic infinite-crawl traps
    * (calendar pages, `?page=12345` pagination, faceted-search
    * explosions): a key with thousands of members is a template being
    * enumerated, not content. Pure projection — the groupBy that reads it
    * is key-grain, far smaller than the url table. */
  def urlTrapKey(c: Column): Column =
    regexp_replace(regexp_replace(c, "[0-9]+", "N"), "#.*", "")

  /** Soft-404 flag: the page SAYS it is an error (404/not-found/denied
    * phrasing in its extracted text) and is short enough (< `maxWords`
    * whitespace words) to be the error shell rather than an article ABOUT
    * errors. Crawls are full of these — servers answering 200 with an
    * error body — and they form giant near-dup clusters of worthless
    * text; the standard move is to gate them before dedup spends effort
    * on them. Integer word bound + portable regex ⇒ oracle-exact. */
  def soft404Flag(text: Column, maxWords: Int = 30): Column =
    lower(text).rlike(
      "(404|page not found|file not found|access denied|" +
        "not available|forbidden|server error)") &&
      TextAnalysis.tokenCountWs(text) < maxWords

  /** Canonical url: fragment dropped, `utm_*` params dropped (with `?`/`&`
    * separators tidied), scheme+authority lowercased, path/query case
    * preserved. The utm match is anchored to a `?`/`&` parameter boundary
    * (ADVICE r2: the unanchored form corrupted params merely *containing*
    * "utm_") and swallows whole runs of consecutive utm params in one
    * match, since regexp_replace is single-pass in both engines. */
  def canonUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val noUtm = regexp_replace(
      regexp_replace(noFrag, "([?&])utm_[^&#]*(&utm_[^&#]*)*&", "$1"),
      "[?&]utm_[^&#]*(&utm_[^&#]*)*$", "")
    val head = regexp_extract(noUtm, "^[a-zA-Z]+://[^/]*", 0)
    concat(lower(head), noUtm.substr(length(head) + lit(1), length(noUtm)))
  }

  /** SURT (Sort-friendly URI Reordering Transform) key over the
    * [[canonUrl]] form: host labels reversed comma-joined, optional
    * `:port` appended AFTER the labels, `)` separator, then
    * path-and-query — `https://www.news.bbc.co.uk/a?b` →
    * `uk,co,bbc,news)/a?b`, `https://example.com:8080/a` →
    * `com,example:8080)/a`. Userinfo (`user@`) is dropped and the
    * leading `www.` folds (the standard alias rules), so apex and www
    * captures of a page share one key — and because the port rides
    * BEHIND the reversed labels rather than inside them, ported
    * captures still sort inside their domain's key range.
    *
    * This is THE key web archives sort their CDX indexes by: under it,
    * every page of a domain — and every subdomain under it — is one
    * CONTIGUOUS key range (`uk,co,bbc` prefix ⊇ all of bbc.co.uk), so
    * "everything under this domain" is a range scan over sorted files,
    * not a filter over the corpus. Pure codegen'd projection. */
  def surtKey(c: Column): Column = {
    val u = canonUrl(c)
    val authFull = regexp_extract(u, "^[a-z]+://[^/?#]*", 0)
    val hostPort = regexp_replace(
      regexp_extract(u, "^[a-z]+://([^/?#]*)", 1), "^[^/@]*@", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val host = regexp_replace(
      regexp_replace(hostPort, ":[0-9]+$", ""), "^www\\.", "")
    concat(
      concat_ws(",", reverse(split(host, "\\."))),
      when(port =!= "", concat(lit(":"), port)).otherwise(lit("")),
      lit(")"),
      u.substr(length(authFull) + lit(1), length(u)))
  }

  /** CDX-style capture index: one row per capture, `(surt, ts_s, digest,
    * rec_len)`, globally sorted by `(surt, ts_s)` — the web-archive lookup
    * artifact (a capture's history = one contiguous run; a domain = one
    * key range). The global sort is a RANGE exchange + per-partition sort:
    * exactly how a sorted artifact is written at 100 TB — each output file
    * covers a disjoint key range, and a CDX range scan touches only the
    * files whose range intersects the query prefix. */
  def cdxIndex(
      captures: org.apache.spark.sql.DataFrame,
      urlCol: String = "url",
      tsCol: String = "ts_s",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    captures.select(
      surtKey(col(urlCol)).as("surt"),
      col(tsCol),
      md5(col(textCol)).as("digest"),
      length(col(textCol)).cast("long").as("rec_len"))
      .orderBy("surt", tsCol)
}
