package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt exclusion gate (RFC 9309 group semantics, the wildcard
  * user-agent subset): parse each host's robots.txt into `Disallow`
  * path-prefix rules belonging to a `User-agent: *` group, then gate
  * crawled pages whose url path starts with a disallowed prefix. Together
  * with [[WebNormalize.noindexFlag]] this is the politeness pair a
  * crawl-derived corpus applies before any content processing: both are
  * author opt-outs, not quality judgments.
  *
  * Grouping contract (RFC 9309 §2.2.1): groups are runs of non-blank
  * lines; a group may open with SEVERAL `User-agent:` lines, and its
  * rules bind to every named agent. We honor exactly that for the `*`
  * agent: a `Disallow:` line applies iff its group names `*` among its
  * user-agents. Lines are matched case-insensitively on the field name;
  * values keep their case (paths are case-sensitive). `Disallow:` with an
  * empty value allows everything (RFC: an empty pattern matches nothing).
  * Wildcard patterns (`*`, `$`) inside paths are out of the regex-free
  * tier's scope — treated as literal prefixes, documented; `Allow:`
  * precedence is likewise future work (rare for the corpus-gate use).
  *
  * Scale shape: parsing is one `posexplode` over robots lines (robots
  * files are KB-sized — the explode is bounded per host) + two windows
  * PARTITIONED BY HOST (never global): a running blank-line count assigns
  * group ids, then a per-(host, group) aggregation marks `*` groups. The
  * rules table is host-grain × rules-per-host — tiny next to the page
  * corpus — so [[gate]] broadcasts it when it fits and the page side
  * never shuffles at all; above the threshold the join degrades to a
  * host-keyed shuffle of (url, host, path) rows. Prefix matching is
  * per-row `startswith`, codegen'd.
  *
  * Reference anchor: the reference's selected folder list decides which
  * sources enter the scan at all (`ViewModels/MainViewModel.cs:845-868`,
  * the folder loop drives ingest); robots rules are the web-corpus
  * version of that source-level gate, declared by the source itself.
  */
object RobotsTxt {

  /** (host, prefix) disallow rules for the `*` agent from a frame of
    * (host, robots_txt). Empty-value Disallow lines drop (allow-all). */
  def rules(
      robots: DataFrame,
      hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "line")))
      .select(col("host"), col("pos"), trim(col("line")).as("line"))
    val wByPos = Window.partitionBy(col("host")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = lines
      .withColumn("grp",
        sum(when(col("line") === "", 1).otherwise(0)).over(wByPos))
      .withColumn("ua",
        when(lower(col("line")).rlike("^user-agent[ \\t]*:"),
          trim(regexp_replace(col("line"), "(?i)^user-agent[ \\t]*:", "")))
          .otherwise(lit(null)))
      .withColumn("dis",
        when(lower(col("line")).rlike("^disallow[ \\t]*:"),
          trim(regexp_replace(col("line"), "(?i)^disallow[ \\t]*:", "")))
          .otherwise(lit(null)))
    val starGroups = tagged.where(col("ua") === "*")
      .select(col("host"), col("grp")).distinct()
    tagged.where(col("dis").isNotNull && col("dis") =!= "")
      .join(starGroups, Seq("host", "grp"))
      .select(col("host"), col("dis").as("prefix"))
      .distinct()
  }

  /** Pages (urlCol) + rules → pages with a `blocked` flag: true iff the
    * url's path starts with any disallowed prefix of the url's host.
    *
    * Rules first collapse to ONE row per host (host, array of prefixes) —
    * robots files carry a handful of rules, so the arrays are tiny — and
    * that table left-joins the pages on host with the any-prefix test as
    * a row-local `exists(…, startswith)`. The page side is never
    * duplicated per rule, never re-aggregated, and never exchanged: the
    * host-grain rule table is the small side (|hosts| ≪ |pages|), so the
    * optimizer broadcasts it and the whole gate rides the page scan. */
  def gate(
      pages: DataFrame,
      rulesDf: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val ruleSets = rulesDf.groupBy(col("host"))
      .agg(collect_list(col("prefix")).as("__prefixes"))
      .withColumnRenamed("host", "__host")
    pages.withColumn("__host", LinkGraph.hostOf(col(urlCol)))
      .withColumn("__path",
        regexp_replace(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""))
      .join(ruleSets, Seq("__host"), "left")
      .withColumn("blocked",
        coalesce(
          exists(col("__prefixes"), p => col("__path").startsWith(p)),
          lit(false)))
      .drop("__host", "__path", "__prefixes")
  }
}
