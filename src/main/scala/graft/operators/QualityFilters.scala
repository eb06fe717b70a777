package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published web-corpus quality filters, re-expressed as pure Catalyst
  * column expressions (no UDFs, no shuffle — one projection over the scan;
  * the regexp rules are codegen'd and the higher-order list folds are
  * still single-pass vectorized expressions, which is what makes a 100 TB
  * pass cheap):
  *
  *   - Gopher document-quality rules (Rae et al. 2021, "Scaling Language
  *     Models: Methods, Analysis & Insights from Training Gopher", §A1.1):
  *     word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  *     bullet/ellipsis line fractions, alphabetic-word fraction, stop-word
  *     floor.
  *   - C4 line cleaning (Raffel et al. 2020, "Exploring the Limits of
  *     Transfer Learning with a Unified Text-to-Text Transformer", §2.2):
  *     keep lines that end in terminal punctuation and have ≥3 words; drop
  *     lines mentioning javascript or containing braces; drop whole docs
  *     mentioning "lorem ipsum" or left with too few lines.
  *
  * Both operate on newline-delimited text. Regexes are kept inside the
  * Java∩RE2 portable subset so the DuckDB oracles read byte-identically
  * (same discipline as [[WebNormalize]]). Reference analog: the
  * size/extension pre-filter cascade the reference applies before hashing
  * (`/root/reference/ViewModels/MainViewModel.cs:826-846`) — cheap per-item
  * predicates that cut the expensive downstream stages.
  */
object QualityFilters {

  /** Words = runs of non-whitespace, on the portable whitespace class. */
  private def words(text: Column): Column =
    filter(split(text, "[ \\t\\n\\f\\r]+"), w => w =!= "")

  private def lines(text: Column): Column = split(text, "\n")

  /** Gopher rules over a (idCol, textCol) frame → one row per doc with the
    * metric columns + `passes` verdict. Thresholds are the paper's (word
    * count 50..100k, mean word length 3..10, symbol ratio ≤ 0.1, bullet
    * lines ≤ 90%, ellipsis lines ≤ 30%, words-with-alpha ≥ 80%, ≥ 2 stop
    * words). Ratios rounded to 6 places so engine and oracle agree
    * bit-for-bit.
    *
    * Built as THREE stacked projections, not one: the word/line arrays
    * materialize as intermediate columns at level 1 and every metric reads
    * the attribute. A single inline expression tree re-evaluates
    * `filter(split(text))` once per metric (~12× per row — visible in the
    * physical plan), and Catalyst's CollapseProject deliberately refuses
    * to merge projections when that would duplicate non-cheap
    * multi-referenced expressions, which is exactly the guarantee this
    * layering relies on. Still one pipelined task per partition: no
    * shuffle, no UDF. */
  def gopherQuality(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val t = col(text)
    val arrays = df.select(
      col(id),
      words(t).as("__ws"),
      lines(t).as("__ls"),
      // Gopher counts '#' and '…' as symbols; '...' is the ASCII ellipsis
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")))
        .as("__n_sym"),
      regexp_count(lower(t), lit("\\b(the|be|to|of|and|that|have|with)\\b"))
        .as("__stop"))
    val ws = col("__ws")
    val ls = col("__ls")
    // empty/whitespace-only docs: size(ws) = 0 would make the three
    // per-word ratios 0/0 = NaN with implementation-defined (and
    // DuckDB-divergent) downstream semantics (ADVICE r3) — guard to a
    // deterministic 0.0; `passes` then fails cleanly on the word-count
    // floor on both engine and oracle
    def perWord(num: Column): Column =
      when(size(ws) === 0, lit(0.0)).otherwise(round(num / size(ws), 6))
    val metrics = arrays.select(
      col(id),
      size(ws).cast("long").as("n_words"),
      perWord(aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double"))
        .as("mean_word_len"),
      perWord(col("__n_sym").cast("double")).as("symbol_ratio"),
      round(
        size(filter(ls, l => substring(l, 1, 2).isin("- ", "* "))).cast("double") /
          size(ls), 6).as("bullet_frac"),
      round(
        size(filter(ls, l => substring(l, -3, 3) === "...")).cast("double") /
          size(ls), 6).as("ellipsis_frac"),
      perWord(size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double"))
        .as("alpha_frac"),
      col("__stop").cast("long").as("stop_hits"))
    metrics.select(
      col(id), col("n_words"), col("mean_word_len"), col("symbol_ratio"),
      col("bullet_frac"), col("ellipsis_frac"), col("alpha_frac"),
      col("stop_hits"),
      (col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_frac") <= 0.9 &&
        col("ellipsis_frac") <= 0.3 &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 2).as("passes"))
  }

  /** True for a line C4 keeps: ends in terminal punctuation, ≥ `minWords`
    * words, no "javascript", no curly brace. */
  private def c4LineKeep(l: Column, minWords: Int): Column =
    substring(l, -1, 1).isin(".", "!", "?", "\"", "'") &&
      size(filter(split(l, "[ \\t]+"), w => w =!= "")) >= minWords &&
      !lower(l).contains("javascript") &&
      !l.contains("{")

  /** C4 line cleaning over a (idCol, textCol) frame of newline-delimited
    * docs. Emits (id, clean_text, n_kept, n_dropped, doc_kept): doc_kept is
    * false when the doc mentions "lorem ipsum" (pre-clean) or keeps fewer
    * than `minLines` lines. One codegen'd projection — linear, shuffle-free,
    * the shape a 100 TB cleaning pass needs. */
  def c4Clean(
      df: DataFrame,
      id: String = "doc_id",
      text: String = "text",
      minWords: Int = 3,
      minLines: Int = 3): DataFrame = {
    // same projection layering as gopherQuality: the kept-lines array
    // materializes once and the four outputs read the attribute
    val arrays = df.select(
      col(id),
      filter(lines(col(text)), l => c4LineKeep(l, minWords)).as("__kept"),
      size(lines(col(text))).as("__n_lines"),
      lower(col(text)).contains("lorem ipsum").as("__lorem"))
    val kept = col("__kept")
    arrays.select(
      col(id),
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast("long").as("n_kept"),
      (col("__n_lines") - size(kept)).cast("long").as("n_dropped"),
      (!col("__lorem") && size(kept) >= minLines).as("doc_kept"))
  }

  /** Encoding-damage ("mojibake") detector: per doc, counts of
    * U+FFFD replacement characters (a decoder already gave up), raw C0/DEL
    * control characters outside the whitespace set (binary or charset
    * damage), and the classic UTF-8-read-as-Latin-1 double-encoding pairs
    * (U+00C2/U+00C3 followed by a U+0080–U+00BF continuation — "Ã©", "â€™"
    * artifacts). Flags the doc when the damage density exceeds
    * `thresholdPermille` of its characters, by the pure integer rule
    * `(n_repl + n_ctrl + n_dbl) · 1000 > n_chars · threshold` so the
    * DuckDB oracle replays the verdict exactly. Crawl corpora carry a
    * steady trickle of mis-declared charsets; this is the standard cheap
    * gate before any text operator trusts the bytes.
    *
    * One codegen'd projection (three `regexp_count` scans over the row) —
    * linear, shuffle-free, rides the corpus scan at 100 TB.
    *
    * The three patterns live in the constants below, shared with the
    * Column-level [[mojibakeFlag]] so a funnel can fuse the same verdict
    * into its own projection. */
  private val ReplPattern = "\uFFFD"
  private val CtrlPattern = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"
  private val DblPattern = "[\\u00C2\\u00C3][\\u0080-\\u00BF]"

  /** Row-local form of the [[mojibake]] verdict — for fusing into a
    * funnel projection without the counts frame. Same integer rule. */
  def mojibakeFlag(text: Column, thresholdPermille: Int = 2): Column =
    (regexp_count(text, lit(ReplPattern)) +
      regexp_count(text, lit(CtrlPattern)) +
      regexp_count(text, lit(DblPattern))) * 1000L >
      length(text) * thresholdPermille

  def mojibake(
      df: DataFrame,
      id: String = "doc_id",
      text: String = "text",
      thresholdPermille: Int = 2): DataFrame = {
    require(thresholdPermille >= 0,
      s"thresholdPermille must be non-negative: $thresholdPermille")
    // the projection drops every caller column except `id`, so the only
    // possible clash is the id column itself shadowing an output name
    require(!Seq("n_chars", "n_repl", "n_ctrl", "n_dbl", "mojibake")
        .exists(_.equalsIgnoreCase(id)),
      s"mojibake: id column '$id' collides with an output column name")
    df.select(
        col(id),
        length(col(text)).cast("long").as("n_chars"),
        regexp_count(col(text), lit(ReplPattern)).cast("long").as("n_repl"),
        regexp_count(col(text), lit(CtrlPattern)).cast("long").as("n_ctrl"),
        regexp_count(col(text), lit(DblPattern)).cast("long").as("n_dbl"))
      .withColumn("mojibake",
        (col("n_repl") + col("n_ctrl") + col("n_dbl")) * 1000L >
          col("n_chars") * thresholdPermille)
  }

  /** The spam-term slice of the C4 badlist (Raffel et al. 2020 drop any
    * page containing a blocklist term; the published list is the LDNOOBW
    * set — this fixture carries innocuous spam stand-ins, the list is a
    * parameter). */
  val defaultBlocklist: Seq[String] =
    Seq("casino", "viagra", "lottery", "betting", "clickbait", "adspam")

  /** Whole-word blocklist hit over lowercased text. Word boundaries are
    * explicit `[^a-z0-9]`-or-edge classes, not `\b`, so the pattern means
    * the same thing under Java regex (Spark) and RE2 (the DuckDB oracle)
    * — "casinos" does NOT hit "casino". One alternation scan per row. */
  def blocklistHit(text: Column, words: Seq[String] = defaultBlocklist): Column = {
    require(words.nonEmpty && words.forall(_.matches("[a-z0-9]+")),
      s"blocklist terms must be lowercase alphanumeric words: $words")
    lower(text).rlike(blocklistPattern(words))
  }

  /** Fail fast when `df` already carries a column this operator writes —
    * `withColumn` replaces silently, which would corrupt caller data.
    * Case-insensitive to match Spark's default resolution. */
  private def requireFreeColumns(
      df: DataFrame, op: String, reserved: Seq[String]): Unit = {
    val clash = df.columns.filter(c => reserved.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"$op writes reserved columns [${reserved.mkString(", ")}]; the " +
        s"input already carries [${clash.mkString(", ")}] — rename them " +
        "before calling (withColumn would silently overwrite)")
  }

  /** The shared engine/oracle pattern — exposed so the SQL mirror embeds
    * the exact same string. */
  def blocklistPattern(words: Seq[String]): String =
    "(^|[^a-z0-9])(" + words.mkString("|") + ")([^a-z0-9]|$)"

  /** C4 badlist doc filter: (id, flagged). Flagged docs are the ones C4
    * drops. A pure projection — fuses into the corpus scan, nothing
    * shuffles, linear at 100 TB like every other per-row gate here. */
  def blocklistFlag(
      df: DataFrame,
      id: String = "doc_id",
      text: String = "text",
      words: Seq[String] = defaultBlocklist): DataFrame =
    df.select(col(id), blocklistHit(col(text), words).as("flagged"))

  /** UT1-style DOMAIN blocklist filter: adds (domain, blocked) where
    * `domain` is the url's registered domain ([[Splits.registeredDomain]])
    * and `blocked` is true iff the registered domain OR the full host
    * appears in `blocked(domain)` — a 2-label entry catches EVERY
    * subdomain and path of a listed site, while a host-level entry (real
    * UT1 lists carry many, e.g. one bad subdomain of a shared-hosting
    * domain) matches exactly that host. Matching is a join against a
    * domain TABLE, not an in-row literal list: real lists hold millions
    * of entries (far past any `IN`-list), while still being tiny next to
    * the corpus — a few hundred MB that AQE broadcast-joins, and above
    * the threshold it degrades to a key-keyed shuffle of short strings,
    * never of page payloads. Pages with no parseable host (including a
    * NULL url) get domain = '' and pass — flag-don't-drop keeps row
    * counts and accounting intact, as with [[blocklistFlag]].
    *
    * RESERVED OUTPUT/TEMP NAMES: `domain`, `blocked`, `__key`, `__b`,
    * `__h`, `__domHit`. `withColumn` REPLACES an existing column of the
    * same name, so an input already carrying one of these would be
    * silently corrupted — the require below fails fast instead; rename
    * the caller's column first. */
  def flagBlockedDomains(
      df: DataFrame,
      blocked: DataFrame,
      urlCol: String = "url"): DataFrame = {
    requireFreeColumns(df, "flagBlockedDomains",
      Seq("domain", "blocked", "__key", "__b", "__h", "__domHit"))
    val bl = blocked.select(lower(col("domain")).as("__key"))
      .where(col("__key").isNotNull && col("__key") =!= "").distinct()
      .withColumn("__b", lit(true))
    val host = lower(coalesce(Splits.host(col(urlCol)), lit("")))
    df.withColumn("domain",
        lower(coalesce(Splits.registeredDomain(col(urlCol)), lit(""))))
      .withColumn("__h", host)
      .withColumn("__key", col("domain"))
      .join(bl, Seq("__key"), "left")
      .withColumn("__domHit", coalesce(col("__b"), lit(false)))
      .drop("__b", "__key")
      .withColumn("__key", col("__h"))
      .join(bl, Seq("__key"), "left")
      .withColumn("blocked", col("__domHit") || coalesce(col("__b"), lit(false)))
      .drop("__b", "__key", "__h", "__domHit")
  }

  /** DOMAIN-level quality gate (the FineWeb-style "filter by site, not
    * just by page" stage): per registered domain, the mean of an INTEGRAL
    * per-doc quality score; docs whose domain mean falls below `minMean`
    * flag `low_quality_domain` — a handful of bad pages on a good site
    * survive, a content farm drops whole, which page-level gates cannot
    * express. The score must be integral so the mean is
    * `sum(long)/count` — exact, order-free arithmetic that any engine
    * reproduces bit-for-bit (a double sum's value depends on partial-agg
    * order). Adds (domain, domain_mean, low_quality_domain).
    *
    * Shape at 100 TB: one map-side-combining groupBy of (domain, 2×long),
    * then a domain-keyed join the optimizer broadcasts (|domains| ≪
    * |docs|) — page payloads never shuffle.
    *
    * RESERVED OUTPUT NAMES: `domain`, `domain_mean`,
    * `low_quality_domain` — same fail-fast contract as
    * [[flagBlockedDomains]]. */
  def domainQualityFlag(
      df: DataFrame,
      minMean: Double,
      urlCol: String = "url",
      scoreCol: String = "score"): DataFrame = {
    requireFreeColumns(df, "domainQualityFlag",
      Seq("domain", "domain_mean", "low_quality_domain"))
    // domain coalesces to '' for unparseable hosts AND null urls: the
    // stats join key must never be NULL (an inner join would silently
    // drop the row — flag-don't-drop, same contract as the blocklist)
    val withDom = df.withColumn("domain",
      lower(coalesce(Splits.registeredDomain(col(urlCol)), lit(""))))
    val stats = withDom.groupBy(col("domain"))
      .agg(round(sum(col(scoreCol).cast("long")).cast("double") /
        count(lit(1)), 6).as("domain_mean"))
    withDom.join(stats, Seq("domain"))
      .withColumn("low_quality_domain", col("domain_mean") < minMean)
  }

  /** Paragraph-grain link density from raw html — the jusText/boilerplate
    * heuristic (Pomikálek 2011): a paragraph whose visible characters are
    * mostly anchor text is navigation chrome, not content. Per `<p>`
    * block: `total_len` = visible chars (tags stripped, trimmed),
    * `link_len` = visible chars inside `<a>` tags, and
    * `boiler = 100·link_len > maxPct·total_len OR total_len = 0` —
    * integer arithmetic only, so the DuckDB oracle replays the flag
    * bit-identically (no IEEE ratio anywhere). `(?s)` + lazy `.*?` are
    * the portable Java/RE2 subset; nested block structure is out of the
    * regex tier's scope (same contract as [[LinkGraph.AnchorPat]]).
    *
    * Scale shape: one linear `posexplode` per page, everything else is a
    * codegen'd projection on the paragraph row — no shuffle at all; the
    * (url, pos) key is carried so callers can reassemble kept paragraphs
    * or roll up per page with one narrow groupBy. */
  def paragraphLinkDensity(
      pages: DataFrame,
      maxPct: Int = 50,
      urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    require(maxPct >= 0 && maxPct <= 100, s"maxPct out of range: $maxPct")
    val parPat = "(?s)<p[^>]*>(.*?)</p>"
    val aPat = "(?s)<a [^>]*>(.*?)</a>"
    pages.select(col(urlCol),
        posexplode(regexp_extract_all(col(htmlCol), lit(parPat), lit(1)))
          .as(Seq("pos", "par")))
      .select(col(urlCol), col("pos"),
        length(trim(regexp_replace(col("par"), "<[^>]*>", "")))
          .cast("long").as("total_len"),
        aggregate(
          transform(regexp_extract_all(col("par"), lit(aPat), lit(1)),
            x => length(x)),
          lit(0), (a, x) => a + x).cast("long").as("link_len"))
      .withColumn("boiler",
        lit(100L) * col("link_len") > lit(maxPct.toLong) * col("total_len")
          || col("total_len") === 0L)
  }
}
