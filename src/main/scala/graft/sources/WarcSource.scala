package graft.sources

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Minimal WARC (ISO 28500) container source — the real ingest format of
  * Common-Crawl-style corpora, feeding the same pages schema the parquet
  * path produces (`url, warc_ts, html, text, lang`).
  *
  * Format handled: concatenated `WARC/1.0` / `WARC/1.1` records, each a
  * CRLF header block terminated by a blank line with `Content-Length`
  * framing the body, then the mandatory two CRLFs before the next record.
  * `response` records carry an HTTP message as body; the payload after
  * the HTTP header block is the page html. Other record types
  * (`warcinfo`, `request`, `metadata`) are skipped. Line endings are
  * strict CRLF as the standard mandates — this is a framing parser, not
  * a recovery tool; a malformed offset ends that file's scan (records
  * before it are kept).
  *
  * Scale shape: `binaryFile` rows parse per file inside `mapPartitions`
  * (opaque binary is the one place imperative per-partition code is the
  * right tool — same stance as the media decoders). Parallelism is
  * file-level, which is how Common Crawl ships: ~1 GB WARC files by
  * convention, thousands per crawl, so the natural task is one file and
  * no record-boundary split of a single file is needed. Text is
  * re-derived from the payload with the canonical extractor, so the
  * byte-identity invariant holds by construction.
  *
  * Reference anchor: this is the recursive source scan
  * (`ViewModels/MainViewModel.cs:833-872`) for the container format web
  * corpora actually arrive in.
  */
object WarcSource {

  final case class WarcPage(url: String, warc_ts: Timestamp, html: Array[Byte])

  private val CRLF2 = Array[Byte]('\r', '\n', '\r', '\n')

  /** Index of `pat` in `hay` at or after `from`, -1 if absent.
    * NB: must NOT be named `indexOf` — inside the `new Iterator` body below,
    * that name resolves to the inherited `Iterator.indexOf(elem, from)` via
    * auto-tupling and silently searches the iterator instead of the bytes. */
  private def byteIndexOf(hay: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val limit = hay.length - pat.length
    while (i <= limit) {
      var j = 0
      while (j < pat.length && hay(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Parse one file's bytes into its response-record pages. */
  def parseRecords(bytes: Array[Byte]): Iterator[WarcPage] = new Iterator[WarcPage] {
    private var pos = 0
    private var nextPage: WarcPage = null

    private def advance(): Unit = {
      nextPage = null
      while (nextPage == null && pos < bytes.length) {
        // header block: version line + fields, terminated by CRLFCRLF
        val hdrEnd = byteIndexOf(bytes, CRLF2, pos)
        if (hdrEnd < 0) { pos = bytes.length; return }
        val header = new String(bytes, pos, hdrEnd - pos, StandardCharsets.UTF_8)
        val lines = header.split("\r\n")
        if (!lines.headOption.exists(_.startsWith("WARC/"))) { pos = bytes.length; return }
        val fields = lines.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
        }.toMap
        val len = fields.get("content-length").flatMap(_.toLongOption)
          .filter(n => n >= 0 && n <= Int.MaxValue.toLong)
        len match {
          case None => pos = bytes.length // unframed record: cannot continue
          case Some(n) =>
            val bodyStart = hdrEnd + 4
            val bodyEnd = bodyStart + n.toInt
            if (bodyEnd > bytes.length) { pos = bytes.length; return }
            if (fields.get("warc-type").contains("response")) {
              val uri = fields.get("warc-target-uri")
              val ts = fields.get("warc-date").flatMap(d =>
                scala.util.Try(Timestamp.from(java.time.Instant.parse(d))).toOption)
              // payload = bytes after the HTTP header block (if present)
              val httpEnd = byteIndexOf(bytes, CRLF2, bodyStart)
              val payloadStart =
                if (httpEnd >= 0 && httpEnd + 4 <= bodyEnd &&
                  bodyStart < bodyEnd && bytes(bodyStart) == 'H') httpEnd + 4
                else bodyStart
              (uri, ts) match {
                case (Some(u), Some(t)) =>
                  nextPage = WarcPage(
                    u, t, java.util.Arrays.copyOfRange(bytes, payloadStart, bodyEnd))
                case _ => // response without uri/date: skip
              }
            }
            // consume the two record-terminating CRLFs when present
            pos = bodyEnd
            var terms = 0
            while (terms < 2 && pos + 2 <= bytes.length &&
              bytes(pos) == '\r' && bytes(pos + 1) == '\n') { pos += 2; terms += 1 }
        }
      }
    }

    advance()
    override def hasNext: Boolean = nextPage != null
    override def next(): WarcPage = {
      val p = nextPage; advance(); p
    }
  }

  /** Raw record frame: (url, warc_ts, html) from every `.warc` under
    * `path` (glob allowed). One task per file. */
  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseRecords))
      .toDF()
  }

  /** input_hint-shaped pages: text re-derived from the payload by the
    * canonical extractor (byte-identity invariant by construction), lang
    * unknown at ingest (null — language id is a downstream operator). */
  def pages(spark: SparkSession, path: String): DataFrame =
    records(spark, path).select(
      col("url"),
      col("warc_ts"),
      col("html"),
      gf.extract_text(col("html")).as("text"),
      lit(null).cast("string").as("lang"))
}
