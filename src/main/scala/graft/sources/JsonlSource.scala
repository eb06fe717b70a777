package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.gf

/** JSONL corpus source — the interchange format derived web corpora
  * actually ship in (one JSON object per line; C4, RefinedWeb, FineWeb
  * and most HuggingFace-hosted crawl derivatives are JSONL or its parquet
  * re-encoding), feeding the same `input_hint` pages schema as the
  * parquet and WARC paths (`url, warc_ts, html, text, lang`).
  *
  * Contract per line: `url` (string), `warc_ts` (ISO-8601 string),
  * `html` (base64 string, optional), `text` (string, optional), `lang`
  * (string, optional). When `html` is present AND decodes as base64 the
  * page text is RE-DERIVED with the canonical extractor — the
  * byte-identity invariant holds by construction, exactly as in
  * [[WarcSource.pages]]; text-only corpora (the common derived case)
  * pass `text` through and leave `html` null. A NON-decodable `html`
  * value never reaches the extractor: `try_to_binary(_, 'base64')`
  * validates the payload and yields null on garbage, so the line falls
  * back to its `text` field (or, with no other content, drops to
  * [[corruptLines]]) instead of extracting from mis-decoded bytes.
  *
  * [[pages]] and [[corruptLines]] are an EXACT PARTITION of the
  * non-blank input lines by construction: both views read the files as
  * text and run the SAME `from_json` parse with the same content
  * predicate — one keeps the lines where it holds, the other keeps the
  * complement. (The earlier split-brain — `spark.read.json` for pages,
  * `from_json` for accounting — let a top-level `[{...},{...}]` array
  * line count as several pages AND one corrupt line, because the JSON
  * datasource expands top-level arrays while `from_json` with a struct
  * schema does not. One parser, one verdict per line: under `from_json`
  * an array line carries no contract object and lands in corrupt.)
  * A line is a PAGE iff it parses and carries actual page content — a
  * `url`, a `text`, or a decodable `html`; a metadata-only line like
  * `{"lang":"en"}` is accounting's problem, not a null-url page
  * downstream.
  *
  * Scale shape: the schema is EXPLICIT — schema inference would pay a
  * full pre-scan (a second pass over 100 TB) and drift with whatever keys
  * the first sampled files happen to carry. Line-split JSON via the text
  * datasource is splittable within a file, so parallelism is
  * byte-range-level, finer than WARC's file-level; `.gz` fixtures
  * decompress transparently (gzip is not splittable — production keeps
  * files ~1 GB like CC, or re-encodes to zstd/parquet after ingest).
  * Point `path` at files or a `*.jsonl` glob — a bare directory reads
  * EVERY non-hidden file in it, so a mixed-format layout (jsonl next to
  * its parquet re-encoding) needs the glob or a `pathGlobFilter` option.
  *
  * Reference anchor: the recursive source scan
  * (`ViewModels/MainViewModel.cs:833-872`), third container format.
  */
object JsonlSource {

  /** input_hint page schema as it appears on the wire (timestamps and
    * html arrive as strings in JSON). */
  val wireSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", StringType),
    StructField("html", StringType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** One parse shared by both views: the raw line plus its contract
    * struct (`from_json`, PERMISSIVE — malformed lines parse to all-null
    * fields) and the VALIDATED html decode (null unless the payload is
    * well-formed base64). */
  private def parsedLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        col("value").as("line"),
        from_json(col("value"), wireSchema).as("w"))
      .withColumn("html_bin",
        try_to_binary(col("w.html"), lit("base64")))

  /** The keep predicate both views share: the line parsed to an object
    * carrying actual page content. */
  private val isPage: Column =
    col("w.url").isNotNull || col("w.text").isNotNull ||
      col("html_bin").isNotNull

  /** input_hint-shaped pages from every `.jsonl`/`.jsonl.gz` matched by
    * `path`; lines that fail the shared content predicate are dropped
    * here and surfaced by [[corruptLines]]. */
  def pages(spark: SparkSession, path: String): DataFrame =
    parsedLines(spark, path)
      .where(isPage)
      .select(
        col("w.url").as("url"),
        col("w.warc_ts").cast("timestamp").as("warc_ts"),
        col("html_bin").as("html"),
        when(col("html_bin").isNotNull, gf.extract_text(col("html_bin")))
          .otherwise(col("w.text")).as("text"),
        col("w.lang").as("lang"))

  /** The raw text of every non-blank line [[pages]] drops — malformed
    * JSON, top-level arrays, contentless objects (`{}`, `{"lang":"en"}`),
    * and html-only lines whose base64 does not decode: the EXACT
    * complement of pages' keep predicate, from the same parse. Reads the
    * files as text; one pass, same cost. */
  def corruptLines(spark: SparkSession, path: String): DataFrame =
    parsedLines(spark, path)
      .where(!coalesce(isPage, lit(false)) && trim(col("line")) =!= "")
      .select(col("line"))
}
