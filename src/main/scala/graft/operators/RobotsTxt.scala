package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt exclusion gate (RFC 9309 group semantics, the wildcard
  * user-agent subset): parse each host's robots.txt into `Allow` /
  * `Disallow` path-prefix rules belonging to a `User-agent: *` group,
  * then gate crawled pages by the MOST SPECIFIC matching rule. Together
  * with [[WebNormalize.noindexFlag]] this is the politeness pair a
  * crawl-derived corpus applies before any content processing: both are
  * author opt-outs, not quality judgments.
  *
  * Grouping contract (RFC 9309 §2.2.1): groups are runs of non-blank
  * lines; a group may open with SEVERAL `User-agent:` lines, and its
  * rules bind to every named agent. We honor exactly that for the `*`
  * agent: an `Allow:`/`Disallow:` line applies iff its group names `*`
  * among its user-agents. Lines are matched case-insensitively on the
  * field name; values keep their case (paths are case-sensitive).
  *
  * Precedence contract (RFC 9309 §2.2.2): among the rules whose prefix
  * matches the url path, the LONGEST prefix wins; on an exact length tie
  * between an Allow and a Disallow, the least restrictive (Allow) wins.
  * A rule with an empty value matches nothing, so empty `Disallow:`
  * (the classic allow-all idiom) and empty `Allow:` lines both drop at
  * parse time. Wildcard patterns (`*`, `$`) inside paths are out of the
  * regex-free tier's scope — treated as literal prefixes, documented.
  *
  * Scale shape: parsing is one `posexplode` over robots lines (robots
  * files are KB-sized — the explode is bounded per host) + two windows
  * PARTITIONED BY HOST (never global): a running blank-line count assigns
  * group ids, then a per-(host, group) aggregation marks `*` groups. The
  * rules table is host-grain × rules-per-host — tiny next to the page
  * corpus — so [[gate]] broadcasts it when it fits and the page side
  * never shuffles at all; above the threshold the join degrades to a
  * host-keyed shuffle of (url, host, path) rows. Rule selection is a
  * row-local fold over the host's rule array (filter + aggregate higher-
  * order functions — codegen'd, no per-rule row duplication, no window).
  *
  * Reference anchor: the reference's selected folder list decides which
  * sources enter the scan at all (`ViewModels/MainViewModel.cs:845-868`,
  * the folder loop drives ingest); robots rules are the web-corpus
  * version of that source-level gate, declared by the source itself.
  */
object RobotsTxt {

  /** Lines of every robots file split, trimmed, numbered within host,
    * assigned their blank-line group id, and tagged with the recognized
    * field values (`ua`, `dis`, `al`, `cd`) — the shared front half of
    * [[rules]] and [[crawlDelays]]. */
  private def taggedLines(
      robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "line")))
      .select(col("host"), col("pos"), trim(col("line")).as("line"))
    val wByPos = Window.partitionBy(col("host")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // value separator consumes post-colon blanks too (RFC 9309 allows
    // tabs; `trim` alone is space-only in both engines)
    def field(name: String): Column =
      when(lower(col("line")).rlike(s"^$name[ \\t]*:"),
        trim(regexp_replace(col("line"), s"(?i)^$name[ \\t]*:[ \\t]*", "")))
        .otherwise(lit(null))
    lines
      .withColumn("grp",
        sum(when(col("line") === "", 1).otherwise(0)).over(wByPos))
      .withColumn("ua", field("user-agent"))
      .withColumn("dis", field("disallow"))
      .withColumn("al", field("allow"))
      .withColumn("cd", field("crawl-delay"))
      .withColumn("sm", field("sitemap"))
  }

  /** The (host, grp) ids of groups naming the `*` agent. */
  private def starGroups(tagged: DataFrame): DataFrame =
    tagged.where(col("ua") === "*")
      .select(col("host"), col("grp")).distinct()

  /** (host, prefix, allow) rules for the `*` agent from a frame of
    * (host, robots_txt). Empty-value rules drop (they match nothing). */
  def rules(
      robots: DataFrame,
      hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame = {
    val tagged = taggedLines(robots, hostCol, txtCol)
    tagged
      .withColumn("prefix", coalesce(col("dis"), col("al")))
      .withColumn("allow", col("al").isNotNull)
      .where(col("prefix").isNotNull && col("prefix") =!= "")
      .join(starGroups(tagged), Seq("host", "grp"))
      .select(col("host"), col("prefix"), col("allow"))
      .distinct()
  }

  /** (host, crawl_delay_s) for hosts whose `*` group declares a numeric
    * `Crawl-delay` (the de-facto extension Bing/Yandex honor; RFC 9309
    * leaves it out, so the parse is deliberately strict: integer seconds
    * only, anything else drops). Several star-group declarations keep the
    * MAX — the most conservative politeness wins, the same direction a
    * crawl scheduler must round in anyway. Feed the host-grain result
    * into the crawl-budget scoreboard: it is the per-host rate limit the
    * fetch planner divides by. */
  def crawlDelays(
      robots: DataFrame,
      hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame = {
    val tagged = taggedLines(robots, hostCol, txtCol)
    tagged
      .where(col("cd").rlike("^[0-9]+$"))
      .join(starGroups(tagged), Seq("host", "grp"))
      .groupBy(col("host"))
      .agg(max(col("cd").cast("long")).as("crawl_delay_s"))
  }

  /** (host, sitemap_url) for every `Sitemap:` record in a robots file.
    * Per the sitemaps.org protocol (and RFC 9309 §2.2.4's "other records"
    * carve-out), Sitemap is a STANDALONE record: valid anywhere in the
    * file and independent of user-agent groups — a line inside a
    * bot-only group still counts, so unlike [[rules]]/[[crawlDelays]]
    * there is no star-group join. Values must be absolute http(s) URLs
    * (the protocol's requirement; relative or other-scheme junk drops);
    * kept verbatim — case included — since sitemap paths are
    * case-sensitive. Duplicates collapse per (host, url). This is the
    * crawl scheduler's seed-discovery input, the third leg of the
    * politeness family (gate / delay / discovery). */
  def sitemaps(
      robots: DataFrame,
      hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame =
    taggedLines(robots, hostCol, txtCol)
      .where(col("sm").rlike("(?i)^https?://"))
      .select(col("host"), col("sm").as("sitemap_url"))
      .distinct()

  /** Pages (urlCol) + rules → pages with a `blocked` flag: true iff the
    * most specific matching rule for the url's path on the url's host is
    * a Disallow (longest prefix wins; Allow wins exact-length ties; no
    * matching rule — or no robots at all — means allowed).
    *
    * Rules first collapse to ONE row per host (host, array of
    * (prefix, allow) structs) — robots files carry a handful of rules,
    * so the arrays are tiny — and that table left-joins the pages on
    * host. Rule selection is a row-local `filter` (prefix matches) +
    * `aggregate` fold keeping the best rule under the RFC order. The
    * page side is never duplicated per rule, never re-aggregated, and
    * never exchanged: the host-grain rule table is the small side
    * (|hosts| ≪ |pages|), so the optimizer broadcasts it and the whole
    * gate rides the page scan. */
  def gate(
      pages: DataFrame,
      rulesDf: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val ruleSets = rulesDf.groupBy(col("host"))
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("__rules"))
      .withColumnRenamed("host", "__host")
    // best = fold over matching rules: longer prefix wins; equal-length
    // Allow beats Disallow (RFC 9309 §2.2.2 "least restrictive rule").
    def better(acc: Column, r: Column): Column =
      acc.isNull
        .or(length(r("prefix")) > length(acc("prefix")))
        .or(length(r("prefix")) === length(acc("prefix"))
          && r("allow") && !acc("allow"))
    pages.withColumn("__host", LinkGraph.hostOf(col(urlCol)))
      .withColumn("__path",
        regexp_replace(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""))
      .join(ruleSets, Seq("__host"), "left")
      .withColumn("__m",
        filter(col("__rules"), r => col("__path").startsWith(r("prefix"))))
      .withColumn("__best",
        aggregate(col("__m"),
          lit(null).cast("struct<prefix:string,allow:boolean>"),
          (acc, r) => when(better(acc, r), r).otherwise(acc)))
      .withColumn("blocked", coalesce(!col("__best")("allow"), lit(false)))
      .drop("__host", "__path", "__rules", "__m", "__best")
  }
}
