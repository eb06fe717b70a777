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
  * re-encodes to zstd/parquet after ingest). Point `path` at files or a
  * `*.jsonl` glob — a bare directory reads EVERY non-hidden file in it
  * as JSON, so a mixed-format layout (jsonl next to its parquet
  * re-encoding) needs the glob or a `pathGlobFilter` option. Malformed
  * lines are captured in an explicit `_corrupt_record` column: [[pages]]
  * DROPS them (they carry no page), [[corruptLines]] returns them for
  * accounting — a truncated shard shows up in the ingest report instead
  * of flowing downstream as null-url pages.
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

  /** input_hint-shaped pages from every `.jsonl`/`.jsonl.gz` matched by
    * `path`; malformed lines are dropped (see [[corruptLines]]). Under
    * PERMISSIVE parsing a malformed line yields all-null contract fields,
    * so the drop predicate tests exactly that — it deliberately avoids
    * Spark's `_corrupt_record` column, whose referenced-columns
    * restriction breaks innocent `pages(...).count()` calls after the
    * optimizer prunes the projection (a contentless `{}` line carries no
    * page either and drops with them). */
  def pages(spark: SparkSession, path: String): DataFrame = {
    val html = unbase64(col("html"))
    spark.read.schema(wireSchema).json(path)
      .where(wireSchema.fields.map(f => col(f.name).isNotNull)
        .reduce(_ || _))
      .select(
        col("url"),
        col("warc_ts").cast("timestamp").as("warc_ts"),
        html.as("html"),
        when(col("html").isNotNull, gf.extract_text(html))
          .otherwise(col("text")).as("text"),
        col("lang"))
  }

  /** The raw text of every line [[pages]] drops — malformed JSON and
    * contentless objects both parse to an all-null contract struct under
    * PERMISSIVE `from_json`, the EXACT mirror of pages' drop predicate.
    * Reads the files as TEXT; one pass, same cost. */
  def corruptLines(spark: SparkSession, path: String): DataFrame = {
    val parsed = from_json(col("value"), wireSchema)
    spark.read.text(path)
      .where(wireSchema.fields.map(f => parsed.getField(f.name).isNull)
        .reduce(_ && _) && trim(col("value")) =!= "")
      .select(col("value").as("line"))
  }
}
