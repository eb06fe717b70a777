package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-duplicate stage: content identity via `sha2(text, 256)`.
  *
  * Reference semantics: blocking-before-compare (size index,
  * `ViewModels/MainViewModel.cs:586-588`), then byte-equality intent of the
  * content compare (`:1093-1146` — we implement the intent, not its
  * remove-while-iterating bug) and the cryptographic digest equality
  * (`:1155-1218`, algorithms `:25-38`). At web scale the digest group *is*
  * the byte-equality check (sha256 collision odds ≈ 1 in 10⁷⁵, the
  * reference's own published tradeoff at `MainViewModel.cs:33-34`).
  *
  * Scale notes:
  *   - `groupBy(sha)` does map-side partial aggregation, so a mega-group of
  *     identical boilerplate (the skew bomb) never concentrates on one task
  *     during rep election.
  *   - edges are a star to the natural-sort-min member (linear in group
  *     size, never quadratic) — CC flattens stars in one iteration.
  */
object ExactDedup {

  /** Re-crawl collapse: keep the row with the maximum `ts` per `key`
    * (ties broken toward the maximum `tieBreak`) — the standard keep-latest
    * rule for repeatedly-crawled urls. Narrow two-phase shape: a
    * map-side-combining `max(struct(ts, tieBreak))` election over three
    * columns, then a LEFT SEMI join on (key, ts, tieBreak) keeps the
    * winner's full row — wide payloads (html, text) cross one exchange and
    * never enter the aggregate's buffers, the same discipline as rep
    * election below.
    *
    * Precondition: `tieBreak` must be unique per (key, ts) — the semi join
    * keeps EVERY row tying on all three columns, so a non-unique tieBreak
    * returns more than one row per key (use a row id, as the bench's
    * doc_id, when ts alone can tie). */
  def latestPerKey(
      df: DataFrame,
      key: String,
      ts: String,
      tieBreak: String): DataFrame = {
    val elect = df
      .groupBy(col(key))
      .agg(max(struct(col(ts), col(tieBreak))).as("m"))
      .select(col(key), col(s"m.$ts").as(ts), col(s"m.$tieBreak").as(tieBreak))
    df.join(elect, Seq(key, ts, tieBreak), "left_semi")
  }

  /** Keep-best-copy election: keep the row with the MAXIMUM `score` per
    * `key`, ties broken toward the MINIMUM `tieBreak` — the FineWeb-style
    * keep policy ("keep the highest-quality copy, not the first-seen one")
    * for exact/near-dup groups where members differ in quality signal
    * (cleaner boilerplate strip, longer body, better source). Same narrow
    * two-phase shape as [[latestPerKey]]: a map-side-combining
    * `min(struct(-score, tieBreak))` election (negating the score turns
    * max-score-then-min-tie into one lexicographic min), then a LEFT SEMI
    * join keeps the winner's full row — wide payloads never enter the
    * aggregate's buffers.
    *
    * Precondition: `tieBreak` unique per (key, score), same as
    * [[latestPerKey]]; `score` must be numeric (it is negated). */
  def bestPerKey(
      df: DataFrame,
      key: String,
      score: String,
      tieBreak: String): DataFrame = {
    val elect = df
      .groupBy(col(key))
      .agg(min(struct((-col(score)).as("ns"), col(tieBreak).as("tb"))).as("m"))
      .select(col(key), (-col("m.ns")).as(score), col("m.tb").as(tieBreak))
    df.join(elect, Seq(key, score, tieBreak), "left_semi")
  }

  /** (rep, url) star edges within every block of size ≥ 2, plus the per-url
    * block size. Input needs columns: url, nk, and the block columns
    * (default just sha; Same*-scope runs block on (sha, scope) so identical
    * docs within one scope always star together regardless of where the
    * globally-first copy of their text lives). min_by/min keep the partial
    * aggregation hash-based — min(struct(..)) planned a SortAggregate. */
  def repsAndEdges(
      docs: DataFrame,
      blockCols: Seq[String] = Seq("sha")): (DataFrame, DataFrame) = {
    val bc = blockCols.map(col)
    val groups = docs
      .groupBy(bc: _*)
      .agg(
        min_by(col("url"), col("nk")).as("rep"),
        count(lit(1)).as("block_cnt"))

    val joined = docs.join(groups, blockCols)
    val edges = joined
      .where(col("block_cnt") > 1 && col("url") =!= col("rep"))
      .select(col("rep").as("src"), col("url").as("dst"))
    val withRep = joined.select(
      docs.columns.map(col) :+ col("rep").as("exact_rep") :+ col("block_cnt"): _*)
    (withRep, edges)
  }
}
