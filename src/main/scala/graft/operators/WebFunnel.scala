package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end web-politeness + hygiene funnel — the crawl-side twin of
  * [[Curation.curate]]'s content funnel: every page gets ONE verdict from
  * the ordered chain
  *
  *   1. `noindex`        — meta-robots opt-out ([[WebNormalize.noindexFlag]])
  *   2. `robots_blocked` — robots.txt rule, RFC 9309 precedence
  *                         ([[RobotsTxt.gate]])
  *   3. `soft404`        — error shell served as 200
  *                         ([[WebNormalize.soft404Flag]])
  *   4. `mojibake`       — encoding damage ([[QualityFilters.mojibakeFlag]])
  *   5. `title_dup`      — a (host, normalized-title) block already kept a
  *                         surviving page with a smaller url
  *   6. `kept`
  *
  * The point is COMPOSITION: each gate is independently oracled
  * elsewhere; this chains them in one declarative plan. Gates 1–4 are
  * pure codegen'd projections fused into the scan (the robots rules
  * arrive as a broadcast host-array join — zero page-side exchanges,
  * PLAN 31), so the funnel pays exactly ONE page-side exchange: the
  * (host, title-key) window for gate 5. That window orders survivors
  * first (`pass DESC, url ASC`), so a surviving page's row_number IS its
  * rank among survivors and the election never needs a second pass;
  * untitled pages (empty key) are exempt from gate 5 — an empty title is
  * not a syndication signal.
  *
  * Reference anchor: the ordered cheap→expensive verdict chain is the
  * reference's compare cascade (`ViewModels/MainViewModel.cs:996-1218`)
  * applied to crawl politeness, with the same "first failing predicate
  * names the state" discipline as its keep/delete states (`:1226-1240`).
  */
object WebFunnel {

  /** Pages (url, text, html) + robots rules ([[RobotsTxt.rules]] schema)
    * → (url, verdict). */
  def verdicts(
      pages: DataFrame,
      robotsRules: DataFrame,
      soft404MaxWords: Int = 30,
      mojibakeThresholdPermille: Int = 2): DataFrame = {
    val flagged = RobotsTxt.gate(pages, robotsRules)
      .withColumn("__noindex", WebNormalize.noindexFlag(col("html")))
      .withColumn("__soft404",
        WebNormalize.soft404Flag(col("text"), soft404MaxWords))
      .withColumn("__moji",
        QualityFilters.mojibakeFlag(col("text"), mojibakeThresholdPermille))
      .withColumn("__host", LinkGraph.hostOf(col("url")))
      .withColumn("__tkey",
        WebNormalize.normalText(WebNormalize.titleOf(col("html"))))
      .withColumn("__pass",
        !col("__noindex") && !col("blocked") && !col("__soft404") &&
          !col("__moji"))
    val w = Window.partitionBy(col("__host"), col("__tkey"))
      .orderBy(col("__pass").desc, col("url"))
    flagged
      .withColumn("__rn", row_number().over(w))
      .select(
        col("url"),
        when(col("__noindex"), "noindex")
          .when(col("blocked"), "robots_blocked")
          .when(col("__soft404"), "soft404")
          .when(col("__moji"), "mojibake")
          .when(col("__tkey") =!= "" && col("__rn") > 1, "title_dup")
          .otherwise("kept")
          .as("verdict"))
  }

  /** The funnel's one-row-per-verdict count summary (same plan + one
    * verdict-grain groupBy). */
  def stats(
      pages: DataFrame,
      robotsRules: DataFrame,
      soft404MaxWords: Int = 30,
      mojibakeThresholdPermille: Int = 2): DataFrame =
    verdicts(pages, robotsRules, soft404MaxWords, mojibakeThresholdPermille)
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n"))
}
