package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * (string, optional). When `html` is present the page text is
  * RE-DERIVED with the canonical extractor — the byte-identity invariant
  * holds by construction, exactly as in [[WarcSource.pages]]; text-only
  * corpora (the common derived case) pass `text` through and leave
  * `html` null.
  *
  * Scale shape: the schema is EXPLICIT — `spark.read.json` without one
  * pays a full inference pre-scan (a second pass over 100 TB) and drifts
  * with whatever keys the first sampled files happen to carry. Line-split
  * JSON is splittable within a file, so parallelism is byte-range-level,
  * finer than WARC's file-level; `.gz` fixtures decompress transparently
  * (gzip is not splittable — production keeps files ~1 GB like CC, or
  * re-encodes to zstd/parquet after ingest). Malformed lines surface
  * under `_corrupt_record` semantics (PERMISSIVE default) rather than
  * killing the scan.
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

  /** input_hint-shaped pages from every `.jsonl`/`.jsonl.gz` under `path`
    * (glob allowed). */
  def pages(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(wireSchema).json(path)
    val html = unbase64(col("html"))
    raw.select(
      col("url"),
      col("warc_ts").cast("timestamp").as("warc_ts"),
      html.as("html"),
      when(col("html").isNotNull, gf.extract_text(html))
        .otherwise(col("text")).as("text"),
      col("lang"))
  }
}
