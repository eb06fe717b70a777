package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level dedup (CCNet-style, Wenzek et al. LREC 2020): strip lines
  * whose exact text recurs across many documents — navigation chrome,
  * cookie banners, boilerplate headers — while keeping each document's
  * unique prose. The standard web-pipeline dedup family between whole-doc
  * exact dedup and span-level dedup.
  *
  * Semantics: a line is stripped from EVERY document when its corpus-wide
  * document frequency (distinct docs containing it) reaches `maxDf`.
  * Remaining lines are reassembled in original order.
  *
  * Scale shape (all linear, three shuffles):
  *   1. posexplode lines — rides the document scan;
  *   2. df per line: groupBy(xxhash64(line)) with a two-phase distinct
  *      count — partial aggregation map-side; the shuffle carries
  *      (line_hash, url_hash) pairs, never line text;
  *   3. hash-join the per-line df back (line side carries text once) and
  *      groupBy(url) to reassemble — partial aggregation again.
  * A 64-bit line-hash collision (~n²/2^65) could strip an innocent line;
  * the reassembly join verifies nothing textual, so production runs at
  * 10^12 docs may widen the key to (hash, length) — both sides here use
  * the plain hash so the DuckDB oracle (which groups by line text) agrees
  * exactly at test scale.
  *
  * Reference analog: the blocking group-by (`ViewModels/MainViewModel.cs:
  * 586-588`) applied per-line instead of per-file, with the delete sink's
  * content-removal intent (`:1248-1346`) at line granularity.
  */
object LineDedup {

  /** @param docs (url, text) — text with `sep` unit separators
    * @param maxDf units appearing in ≥ maxDf distinct docs are stripped
    * @param sep the dedup granularity: "\n" = lines (CCNet), "\n\n" =
    *        paragraphs (the RefinedWeb / Falcon variant of the same
    *        operator — Penedo et al. 2023 dedup exact paragraphs the
    *        same way)
    * @return (url, kept_text, n_lines, n_stripped) for every input doc */
  def stripFrequentLines(docs: DataFrame, maxDf: Long, sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col("url"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
    // document frequency per line; hash key keeps the shuffle narrow and
    // the join build side compact (the line text never enters this agg)
    val freq = lines
      .groupBy(xxhash64(col("line")).as("lh"))
      .agg(countDistinct(xxhash64(col("url"))).as("df"))
      .where(col("df") >= maxDf) // join side: only the lines to strip
    val marked = lines
      .join(freq.hint("shuffle_hash"), xxhash64(col("line")) === col("lh"), "left")
      .select(col("url"), col("pos"), col("line"), col("df").isNotNull.as("strip"))
    marked
      .groupBy(col("url"))
      .agg(
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(col("pos"), col("line"), col("strip")))),
              x => !x.getField("strip")),
            x => x.getField("line")),
          sep).as("kept_text"),
        count(lit(1)).as("n_lines"),
        sum(when(col("strip"), 1L).otherwise(0L)).as("n_stripped"))
  }
}
