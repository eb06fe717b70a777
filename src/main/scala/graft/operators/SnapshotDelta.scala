package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-snapshot (re-crawl) duplicate handling: classify every captured
  * page version against the SAME url's previous capture and keep payloads
  * only when the content actually changed — the WARC "revisit record"
  * convention (ISO 28500 / WARC 1.1 §6.7.2: a capture whose digest equals
  * an earlier capture of the same URI is stored as a payload-less revisit
  * pointing at the original). Common Crawl's monthly snapshots are the
  * motivating corpus: most urls re-crawl unchanged month over month, so a
  * multi-snapshot training corpus that ingests captures naively is
  * dominated by this one duplicate class before any content dedup runs.
  *
  * Statuses per (url, ts) capture, ordered by ts within url:
  *   - `new`       — first capture of the url
  *   - `unchanged` — digest equals the immediately previous capture
  *   - `changed`   — digest differs from the immediately previous capture
  *
  * Note the contract is CONSECUTIVE-capture equality (the revisit-record
  * rule), not set membership: an A→B→A flip-flop is `new`,`changed`,
  * `changed` — the third capture re-stores A because its predecessor was
  * B. Whole-history dedup is [[ExactDedup]]'s job after this gate.
  *
  * Scale shape (10¹² captures): statuses are computed on a THREE-column
  * frame (url, ts, 8-byte xxhash64 digest) — the digest is taken map-side
  * in the scan projection, so page payloads never enter the exchange. One
  * shuffle on url; the per-url window holds only that url's captures
  * (≈ number of snapshots, a small constant), so no partition-local state
  * grows with corpus size and no key is hot. [[changedOnly]] re-attaches
  * payloads by an inner join on the narrow (url, ts) key — the second
  * exchange ships keys, not html. Equality is digest equality
  * (collision-free at 64 bits for per-url version counts; dial to
  * [[WebNormalize.normalSha]]/sha2 via `digestCol` when 10⁻¹⁹ per-pair
  * isn't enough or normalized comparison is wanted).
  *
  * Reference anchor: on re-runs the reference skips files already
  * resolved by an earlier pass — only still-undecided entries re-enter
  * comparison (`ViewModels/MainViewModel.cs:703-706`); snapshot
  * classification is that re-run short-circuit at corpus grain, with the
  * crawl timestamp as the version axis and digest-vs-previous as the
  * "already resolved" test.
  */
object SnapshotDelta {

  /** Per-capture status frame: (url, ts, status). Requires (url, ts)
    * unique (one capture per url per snapshot — the WARC/CDX key);
    * `digest` defaults to xxhash64 of `textCol` and may be any
    * equality-faithful projection of the payload. */
  def classify(
      pages: DataFrame,
      urlCol: String = "url",
      tsCol: String = "ts_s",
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(urlCol)).orderBy(col(tsCol))
    pages
      .select(col(urlCol), col(tsCol), xxhash64(col(textCol)).as("__dig"))
      .withColumn("__prev", lag(col("__dig"), 1).over(w))
      .select(col(urlCol), col(tsCol),
        when(col("__prev").isNull, lit("new"))
          .when(col("__prev") === col("__dig"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The revisit-record retention rule: drop `unchanged` captures, keep
    * full rows for `new`/`changed` ones (status attached). Payloads
    * rejoin on the narrow (url, ts) key — see scale shape above. */
  def changedOnly(
      pages: DataFrame,
      urlCol: String = "url",
      tsCol: String = "ts_s",
      textCol: String = "text"): DataFrame = {
    val kept = classify(pages, urlCol, tsCol, textCol)
      .where(col("status") =!= "unchanged")
    pages.join(kept, Seq(urlCol, tsCol))
  }

  /** Per-snapshot churn report: capture counts by (ts, status) — the
    * first table a crawl-over-crawl datacard shows (how much of this
    * snapshot is genuinely new content). Pure rollup of [[classify]]. */
  def deltaStats(
      pages: DataFrame,
      urlCol: String = "url",
      tsCol: String = "ts_s",
      textCol: String = "text"): DataFrame =
    classify(pages, urlCol, tsCol, textCol)
      .groupBy(col(tsCol), col("status"))
      .agg(count(lit(1)).as("n"))
}
