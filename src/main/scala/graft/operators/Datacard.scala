package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition report — the "data card" table every corpus release
  * publishes (docs / token mass / char mass / dup rate per language ×
  * source, plus each cell's share of the whole): the summary a user reads
  * before training and the regression surface an ingest pipeline diffs
  * between epochs.
  *
  * Scale shape: ONE map-side-combining groupBy over the corpus computing
  * only fixed-width aggregates (counts, sums, a distinct-digest count);
  * the result is O(|langs| × |sources|) rows, so the share-of-corpus
  * window over it is free. Document text contributes its length and its
  * digest to the aggregate buffers — never the body itself.
  *
  * Reference analog: the reference's run-summary panel (state counts and
  * percentage scalars, `ViewModels/MainViewModel.cs:1352-1392`) — the
  * same read-after-run report shape, widened to corpus composition.
  */
object Datacard {

  /** @param docs (lang, source, text)
    * @return one row per (lang, source): n_docs, n_tokens (whitespace),
    *         n_chars, mean_chars, n_distinct (exact-digest), dup_rate,
    *         token_share of the whole corpus. */
  def composition(docs: DataFrame): DataFrame =
    byKey(docs, Seq("lang", "source"))

  /** [[composition]] over an arbitrary grouping key — the host-grain
    * variant is the crawl datacard (pages / token mass / within-host dup
    * rate per site), the first place crawl pathologies (mirror hosts,
    * calendar-page explosions, template farms) become visible. Same
    * one-pass scale shape; output is O(|key cardinality|) rows, so keep
    * the key at host/domain/source grain, not url grain. */
  def byKey(docs: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "byKey needs at least one grouping column")
    val tok = when(length(trim(col("text"))) === 0, lit(0))
      .otherwise(size(split(trim(col("text")), "\\s+")))
    val cells = docs
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tok).cast("long").as("n_tokens"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        avg(length(col("text"))).as("mean_chars"),
        countDistinct(sha2(col("text"), 256)).as("n_distinct"))
    cells
      .withColumn("dup_rate",
        lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))
      .withColumn("token_share",
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(Window.partitionBy()))
  }
}
