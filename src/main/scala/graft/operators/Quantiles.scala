package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics — the thresholds every gate family
  * here consumes ([[Perplexity]] head/middle/tail cuts, [[QualityFilters]]
  * length/score cuts, [[Mixing]] budget caps) derived from the corpus
  * itself instead of hand-picked constants.
  *
  * Shape: ONE map-side-combined groupBy collapses the corpus to its
  * distinct (value, count) histogram, and everything after runs on the
  * histogram, not the rows. A cumulative window over the sorted distinct
  * values then answers any rank query. The quantile of 10¹² lengths costs
  * one narrow shuffle of ≤ |distinct values| rows. The deliberate single-
  * partition window is over the HISTOGRAM (bounded for the discrete
  * features this serves: lengths, token counts, integer scores — ~10⁵
  * distinct values); for genuinely high-cardinality real-valued columns,
  * quantize first (the [[Dsir]] bucket trick) — documented contract, same
  * tiering as `Perplexity.bucketExact`.
  *
  * Exactness discipline: quantile levels are integer PERMILLE (p = 500 =
  * median) and the target rank is pure integer arithmetic —
  * rank = (p·N + 999) div 1000, result = min value with cumulative count
  * ≥ rank — so Spark, the Scala reference, and the DuckDB oracle agree
  * bit-for-bit with no IEEE ceil(q·N) seam (ceil(0.1·500) is already
  * engine-trap territory in doubles).
  *
  * Reference anchor: the reference's size pre-filter is a hand-picked
  * constant (`ViewModels/MainViewModel.cs:603`); corpus-derived cuts are
  * what that constant becomes when the corpus is too big to eyeball.
  */
object Quantiles {

  /** Exact permille quantiles of `valueCol` (nulls dropped).
    *
    * @param pMilles levels in (0, 1000], e.g. Seq(100, 500, 900)
    * @return (p_mille, value, rank, n) — one row per level; `value` is
    *         the smallest value whose cumulative count reaches `rank`
    */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      pMilles: Seq[Int]): DataFrame = {
    require(pMilles.nonEmpty && pMilles.forall(p => p > 0 && p <= 1000),
      s"permille levels must be in (0, 1000]: $pMilles")
    val spark = df.sparkSession
    import spark.implicits._

    val hist = df.select(col(valueCol).as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"))
    // the window runs on the histogram, not the corpus (see scaladoc)
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // N = the last cumulative count — same subtree as `cum`, so the scan
    // and histogram exchanges are reused instead of re-aggregated
    val tot = cum.agg(coalesce(max(col("cum")), lit(0L)).as("n"))
    val levels = pMilles.distinct.sorted.toDF("p_mille")
      .crossJoin(broadcast(tot))
      .withColumn("rank", expr("(p_mille * n + 999) div 1000"))
    levels.join(cum, cum("cum") >= levels("rank"))
      .groupBy(col("p_mille"), col("rank"), col("n"))
      .agg(min(col("v")).as("value"))
      .select(col("p_mille").cast("int").as("p_mille"), col("value"),
        col("rank"), col("n"))
  }

  /** Threshold calibration to a target keep-rate: the corpus-derived cut
    * every "keep the best X%" gate needs. keepRank = ⌈kp·n/1000⌉ docs
    * should keep; the threshold is the smallest value whose cumulative
    * count reaches `n − keepRank + 1` for `higherIsBetter` scores (keep
    * rule `score >= threshold`), or `keepRank` for lower-is-better
    * (perplexity, spam odds; rule `score <= threshold`) — so a tie-free
    * score keeps EXACTLY keepRank docs.
    *
    * One row out: `(target_permille, threshold, n, kept,
    * kept_permille)`. `kept` counts the rule applied verbatim — with a
    * tie-heavy score the actual keep rate overshoots the target (every
    * tied doc at the threshold keeps; a deterministic rule cannot split a
    * tie), which is why the ACTUAL rate ships next to the target instead
    * of being assumed. All rank arithmetic is integer; `kept_permille`
    * is integer floor-division — engine-exact.
    *
    * Same shape as [[exactQuantiles]] (histogram groupBy + bounded
    * histogram window) plus the 1-row threshold broadcast back over the
    * score column — no extra shuffle of the corpus. */
  def calibrateKeep(
      df: DataFrame,
      scoreCol: String,
      keepPermille: Int,
      higherIsBetter: Boolean = true): DataFrame = {
    require(keepPermille > 0 && keepPermille < 1000,
      s"keepPermille must be in (0, 1000): $keepPermille")
    val hist = df.select(col(scoreCol).as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.agg(coalesce(max(col("cum")), lit(0L)).as("n"))
      .withColumn("keep_rank", expr(s"($keepPermille * n + 999) div 1000"))
      .withColumn("rank",
        if (higherIsBetter) expr("n - keep_rank + 1") else col("keep_rank"))
    val th = cum.crossJoin(broadcast(tot))
      .where(col("cum") >= col("rank"))
      .groupBy(col("n")).agg(min(col("v")).as("threshold"))
    val cond =
      if (higherIsBetter) col("v") >= col("threshold")
      else col("v") <= col("threshold")
    df.select(col(scoreCol).as("v")).where(col("v").isNotNull)
      .crossJoin(broadcast(th))
      .groupBy(col("threshold"), col("n"))
      .agg(sum(when(cond, 1L).otherwise(0L)).as("kept"))
      .select(
        lit(keepPermille).as("target_permille"), col("threshold"),
        col("n"), col("kept"),
        expr("kept * 1000 div n").as("kept_permille"))
  }
}
