package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end curation funnel — the FineWeb/CCNet-shaped chain every
  * web-corpus pipeline runs between the crawl and the tokenizer:
  *
  *   1. language id (stopword/script tier, [[TextAnalysis.langId]]) —
  *      keep one target language;
  *   2. quality gate — word count ≥ `minWords` and mean word length in
  *      [1, `maxMeanWordLen`] (the cheap Gopher-subset thresholds; the
  *      full rule set is [[QualityFilters.gopherQuality]]);
  *   3. exact dedup — keep the lowest-id row per `sha2(text, 256)`
  *      group (the [[ExactDedup]] election specialised to id order);
  *   4. per-source cap — at most `capPerSource` survivors per source,
  *      [[Mixing.capPerStratum]]'s WindowGroupLimit shape.
  *
  * The point of this operator is COMPOSITION: each stage exists (and is
  * independently oracled) elsewhere; this chains them in one declarative
  * plan — ONE corpus scan, the per-row stages fused into it, and exactly
  * two exchanges end to end (dedup's per-sha group limit and the cap's
  * per-source group limit), both with PARTIAL map-side limits so
  * duplicates and over-cap rows drop before they shuffle.
  *
  * Scale notes:
  *   - stages 1–2 are pure codegen'd projections/filters — they fuse
  *     into the scan and drop rows BEFORE anything shuffles, so the
  *     dedup exchange carries only the language+quality survivors;
  *   - exact dedup is "cap 1 per sha in id order" ([[Mixing
  *     .capPerStratum]]): the partial WindowGroupLimit means a
  *     boilerplate mega-group (the skew bomb) reaches its reducer as
  *     ≤ 1 row per map task, and the corpus is scanned once — the
  *     groupBy-election + semi-join alternative re-reads the scan (and
  *     re-evaluates the langid regexes) once per join branch;
  *   - the cap is the same rank-filter shape over (source, id).
  *
  * Reference anchor: the chain mirrors the reference's own stage order —
  * source scan → pre-filter → blocking → keep/delete election
  * (`ViewModels/MainViewModel.cs:833-872`, `:586-588`, `:1226-1240`) —
  * with web-corpus stages (language, quality, source cap) in the slots
  * its size/scope filters occupy.
  */
object Curation {

  /** Words = runs of non-whitespace on the portable class (same
    * tokenisation as [[QualityFilters]], same DuckDB mirror). */
  private def words(text: Column): Column =
    filter(split(text, "[ \\t\\n\\f\\r]+"), w => w =!= "")

  /** Per-row annotations the funnel filters on: `pred_lang`, `n_words`
    * (long), `mean_word_len` (rounded to 6 places so engine and oracle
    * agree bit-for-bit). Stacked projections keep the word array
    * materialised once (the [[QualityFilters.gopherQuality]]
    * discipline). */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val l1 = docs
      .withColumn("__ws", words(t))
      .withColumn("pred_lang", TextAnalysis.langId(t))
    l1
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn(
        "mean_word_len",
        when(size(col("__ws")) === 0, lit(0.0)).otherwise(
          round(
            aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w))
              .cast("double") / size(col("__ws")),
            6)))
      .drop("__ws")
  }

  /** The intermediate frames of the funnel, so both [[curate]] and
    * [[funnelStats]] run the same plan: (annotated, languageAndQuality
    * survivors, post-dedup uniques, post-cap final). */
  private def stages(
      docs: DataFrame,
      keepLang: String,
      minWords: Int,
      maxMeanWordLen: Double,
      capPerSource: Int,
      id: String,
      source: String,
      text: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ann = annotate(docs, text)
    val kept = ann.where(
      col("pred_lang") === keepLang &&
        col("n_words") >= minWords &&
        col("mean_word_len").between(1.0, maxMeanWordLen))
    // exact dedup = "cap 1 per sha block in id order": the rank-filter
    // form plans a PARTIAL WindowGroupLimit, so each map task drops its
    // local duplicates before the exchange and a boilerplate mega-group
    // arrives at its reducer as ≤ 1 row per map task. One corpus scan
    // total — the groupBy-election + semi-join alternative re-reads the
    // scan (and re-evaluates the langid regexes) once per branch.
    val hashed = kept.withColumn("__sha", sha2(col(text), 256))
    val unique = Mixing.capPerStratum(hashed, "__sha", 1, col(id)).drop("__sha")
    val capped = Mixing.capPerStratum(unique, source, capPerSource, col(id))
    (ann, kept, unique, capped)
  }

  /** Run the funnel; returns the surviving rows as
    * (id, source, pred_lang, n_words). */
  def curate(
      docs: DataFrame,
      keepLang: String = "en",
      minWords: Int = 10,
      maxMeanWordLen: Double = 12.0,
      capPerSource: Int = 15,
      id: String = "doc_id",
      source: String = "source",
      text: String = "text"): DataFrame = {
    val (_, _, _, capped) =
      stages(docs, keepLang, minWords, maxMeanWordLen, capPerSource, id, source, text)
    capped.select(col(id), col(source), col("pred_lang"), col("n_words"))
  }

  /** [[curate]] with a NORMALIZE stage fused in front: unicode NFC
    * ([[graft.functions.gf.unicode_norm]]) then the within-doc
    * first-occurrence line strip ([[LineDedup.firstOccurrenceText]]),
    * applied BEFORE language id, quality and — critically — the exact
    * dedup, which therefore hashes canonical text: composed/decomposed
    * twins and copies differing only in intra-doc repeated lines collapse
    * into one group where the raw chain would keep both.
    *
    * Both added stages are pure per-row expressions, so they fuse into
    * the same single scan and the chain keeps its two-exchange shape —
    * the whole point of expressing normalization as expressions rather
    * than DataFrame passes. */
  def curateNormalized(
      docs: DataFrame,
      keepLang: String = "en",
      minWords: Int = 10,
      maxMeanWordLen: Double = 12.0,
      capPerSource: Int = 15,
      id: String = "doc_id",
      source: String = "source",
      text: String = "text",
      sep: String = "\n"): DataFrame = {
    val normalized = docs.withColumn(text,
      LineDedup.firstOccurrenceText(
        graft.functions.gf.unicode_norm(col(text), "NFC"), sep))
    curate(normalized, keepLang, minWords, maxMeanWordLen, capPerSource,
      id, source, text)
  }

  /** One-row funnel report: how many rows entered, survived the
    * language filter, survived quality, remained after exact dedup, and
    * remained after the source cap. Built as three single-row
    * aggregates cross-joined (each side is one row — the joins are
    * broadcast nested loops over scalars, not data joins). */
  def funnelStats(
      docs: DataFrame,
      keepLang: String = "en",
      minWords: Int = 10,
      maxMeanWordLen: Double = 12.0,
      capPerSource: Int = 15,
      id: String = "doc_id",
      source: String = "source",
      text: String = "text"): DataFrame = {
    val (ann, _, unique, capped) =
      stages(docs, keepLang, minWords, maxMeanWordLen, capPerSource, id, source, text)
    val langOk = col("pred_lang") === keepLang
    val qualOk = langOk &&
      col("n_words") >= minWords && col("mean_word_len").between(1.0, maxMeanWordLen)
    val flags = ann.agg(
      count(lit(1)).as("n_input"),
      sum(when(langOk, 1L).otherwise(0L)).as("n_lang"),
      sum(when(qualOk, 1L).otherwise(0L)).as("n_quality"))
    val nUnique = unique.agg(count(lit(1)).as("n_unique"))
    val nFinal = capped.agg(count(lit(1)).as("n_final"))
    flags.crossJoin(nUnique).crossJoin(nFinal)
  }
}
