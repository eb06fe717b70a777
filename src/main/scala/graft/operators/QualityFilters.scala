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

  /** Gopher quality metrics + verdict for one text column. Thresholds are
    * the paper's (word count 50..100k, mean word length 3..10, symbol ratio
    * ≤ 0.1, bullet lines ≤ 90%, ellipsis lines ≤ 30%, words-with-alpha
    * ≥ 80%, ≥ 2 stop words). Ratios are rounded to 6 places so engine and
    * oracle agree bit-for-bit. */
  def gopherMetrics(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws)
    val meanLen = round(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        nWords, 6)
    // Gopher counts '#' and '…' as symbols; '...' is the ASCII ellipsis
    val nSym = regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\."))
    val symRatio = round(nSym.cast("double") / nWords, 6)
    val ls = lines(text)
    val nLines = size(ls)
    val bulletFrac = round(
      size(filter(ls, l => substring(l, 1, 2).isin("- ", "* "))).cast("double") /
        nLines, 6)
    val ellipsisFrac = round(
      size(filter(ls, l => substring(l, -3, 3) === "...")).cast("double") /
        nLines, 6)
    val alphaFrac = round(
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / nWords, 6)
    val stopHits = regexp_count(
      lower(text), lit("\\b(the|be|to|of|and|that|have|with)\\b"))
    val passes = nWords.between(50, 100000) &&
      meanLen.between(3.0, 10.0) &&
      symRatio <= 0.1 &&
      bulletFrac <= 0.9 &&
      ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 &&
      stopHits >= 2
    struct(
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      stopHits.cast("long").as("stop_hits"),
      passes.as("passes"))
  }

  /** Gopher rules over a (idCol, textCol) frame → one row per doc with the
    * metric columns flattened. Pure projection: no shuffle, no UDF. */
  def gopherQuality(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), gopherMetrics(col(text)).as("m")).select(col(id), col("m.*"))

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
    val ls = lines(col(text))
    val kept = filter(ls, l => c4LineKeep(l, minWords))
    df.select(
      col(id),
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast("long").as("n_kept"),
      (size(ls) - size(kept)).cast("long").as("n_dropped"),
      (!lower(col(text)).contains("lorem ipsum") &&
        size(kept) >= minLines).as("doc_kept"))
  }
}
