package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence chunking: split long documents into overlapping
  * windows of at most `maxTokens` whitespace tokens with step `stride` —
  * the preprocessing move between a curated corpus and a fixed-context
  * trainer (the sliding-window side of what [[Mixing.packSequences]] does
  * for SHORT docs; together they map any length profile onto a fixed
  * context length).
  *
  * Window rule (deterministic, fully replayable in SQL): starts are
  * `0, stride, 2·stride, …`, and a start `o > 0` is emitted only if the
  * PREVIOUS window did not already reach the document's end
  * (`o − stride + maxTokens < n`) — so the tail is always covered, short
  * tails extend the last window's overlap instead of spawning a window
  * that is a strict subset of its predecessor, and a doc with
  * `n <= maxTokens` is exactly one chunk. With `stride = maxTokens` this
  * degenerates to exact non-overlapping splits.
  *
  * Scale shape: one codegen'd projection (`split` → `sequence` →
  * `filter`) and one explode — no shuffle, no state; chunk provenance
  * `(url, chunk_id)` is a pure row function, so downstream dedup can
  * attribute any chunk back to its document.
  *
  * Reference anchor: the reference's fixed-size read buffer walks a file
  * in strides (`ViewModels/MainViewModel.cs:1103-1111`); this is the same
  * bounded-window discipline applied to token streams.
  */
object Chunking {

  /** One row per chunk: `url, chunk_id, n_chunk_tokens, chunk_text`.
    * Tokens are SINGLE-SPACE tokens — `split(text, " ")`, the same
    * convention every token operator in this engine uses (token counts,
    * vocab, drift, the LM), so chunk token counts agree with the budget
    * solver's. Text carrying raw newlines/tabs (e.g. straight off the
    * WET reader) counts a whole line as one token — normalize whitespace
    * first ([[WebNormalize.normalText]], or a `regexp_replace` to
    * spaces) when feeding unnormalized text. Empty/null docs yield no
    * rows (nothing to train on). */
  def chunk(
      df: DataFrame,
      maxTokens: Int,
      stride: Int,
      urlCol: String = "url",
      textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens]: $stride")
    df.where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(
        col(urlCol).as("url"),
        split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("starts",
        filter(
          sequence(lit(0), col("n") - 1, lit(stride)),
          o => o === 0 || o - lit(stride) + lit(maxTokens) < col("n")))
      .select(
        col("url"), col("n"), col("toks"),
        posexplode(col("starts")).as(Seq("chunk_id", "o")))
      .select(
        col("url"),
        col("chunk_id").cast("long").as("chunk_id"),
        least(lit(maxTokens), col("n") - col("o")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("o") + 1, lit(maxTokens)))
          .as("chunk_text"))
  }
}
