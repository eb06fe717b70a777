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
}
