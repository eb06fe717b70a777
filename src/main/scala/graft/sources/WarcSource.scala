package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Minimal WARC (ISO 28500) container source — the real ingest format of
  * Common-Crawl-style corpora, feeding the same pages schema the parquet
  * path produces (`url, warc_ts, html, text, lang`). Reads both plain
  * `.warc` and production `.warc.gz` (Common Crawl ships ONLY the
  * latter: one gzip member per record, concatenated — the member framing
  * is what lets CC index byte offsets into a compressed file).
  *
  * Format handled: concatenated `WARC/1.0` / `WARC/1.1` records, each a
  * CRLF header block terminated by a blank line with `Content-Length`
  * framing the body, then the mandatory two CRLFs before the next record.
  * `response` records carry an HTTP message as body; the payload after
  * the HTTP header block is the page html. Other record types
  * (`warcinfo`, `request`, `metadata`) are skipped. Line endings are
  * strict CRLF as the standard mandates — this is a framing parser, not
  * a recovery tool; a malformed offset (or a corrupt gzip member) ends
  * that file's scan (records before it are kept).
  *
  * Scale shape: the container files are STREAMED, never materialized —
  * the listing reads only `path` (binaryFile prunes `content` away), and
  * each task opens its files through the Hadoop filesystem and parses
  * records off the stream, holding one record body in memory at a time
  * (~page-sized), not one file (~GB-sized). Gzip is detected by magic
  * bytes and inflated member-by-member through the same stream —
  * `GZIPInputStream` walks concatenated members natively, so per-record
  * members and whole-file gzip both decode without ever inflating the
  * file into a buffer. Parallelism is file-level, which is how Common
  * Crawl ships: ~1 GB WARC files by convention, thousands per crawl, so
  * the natural task is one file and no record-boundary split of a single
  * file is needed (gzip is not byte-range splittable anyway). Text is
  * re-derived from the payload with the canonical extractor, so the
  * byte-identity invariant holds by construction.
  *
  * Reference anchor: this is the recursive source scan
  * (`ViewModels/MainViewModel.cs:833-872`) for the container format web
  * corpora actually arrive in.
  */
object WarcSource {

  /** `wtype` ∈ {response, conversion}: response records carry captured
    * html (payload = bytes after the HTTP header block); conversion
    * records (WET files — CC's extracted-text distribution) carry the
    * plain text itself. */
  final case class WarcPage(
      url: String, warc_ts: Timestamp, html: Array[Byte], wtype: String)

  private val CRLF2 = Array[Byte]('\r', '\n', '\r', '\n')

  /** Hard cap on one record's header block — a stream position that
    * claims a megabyte of WARC headers is framing corruption, not a
    * header. */
  private val MaxHeaderBytes = 1 << 20

  /** Hadoop `Configuration` that survives the driver→executor hop.
    * `Configuration` is `Writable` but not `Serializable`; this is the
    * standard write/readFields envelope (Spark carries its own
    * `private[spark]` twin — public API only here). */
  final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Index of `pat` in `hay` at or after `from`, -1 if absent.
    * NB: must NOT be named `indexOf` — inside an `Iterator` body, that
    * name resolves to the inherited `Iterator.indexOf(elem, from)` via
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

  /** Parse one file's bytes into its response-record pages (in-memory
    * convenience over [[parseStream]]; the distributed path never
    * materializes files — see [[records]]). */
  def parseRecords(bytes: Array[Byte]): Iterator[WarcPage] =
    parseStream(new ByteArrayInputStream(bytes))

  /** Streaming record parser: one record body in memory at a time. The
    * stream is closed when the scan ends (exhaustion, framing error, or
    * an I/O / gzip-member failure — any of which keeps the records
    * already emitted and drops the rest of the file, the same stance as
    * the original whole-buffer parser). */
  def parseStream(in0: InputStream): Iterator[WarcPage] = new Iterator[WarcPage] {
    private val in = new BufferedInputStream(in0, 1 << 16)
    private var nextPage: WarcPage = null
    private var closed = false

    private def stop(): Unit = {
      if (!closed) { closed = true; scala.util.Try(in.close()) }
      nextPage = null
    }

    /** Header block bytes INCLUDING the CRLFCRLF terminator, or null at
      * EOF / missing terminator / over-cap. */
    private def readHeaderBlock(): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream(512)
      var state = 0 // matched prefix length of \r\n\r\n
      while (state < 4) {
        val b = in.read()
        if (b < 0 || buf.size >= MaxHeaderBytes) return null
        buf.write(b)
        state =
          if (b == '\r') { if (state == 2) 3 else 1 }
          else if (b == '\n') { if (state == 1) 2 else if (state == 3) 4 else 0 }
          else 0
      }
      buf.toByteArray
    }

    private def advance(): Unit = {
      nextPage = null
      try {
        while (nextPage == null && !closed) {
          val hdrBytes = readHeaderBlock()
          if (hdrBytes == null) { stop(); return }
          val header =
            new String(hdrBytes, 0, hdrBytes.length - 4, StandardCharsets.UTF_8)
          val lines = header.split("\r\n")
          if (!lines.headOption.exists(_.startsWith("WARC/"))) { stop(); return }
          val fields = lines.drop(1).flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None
            else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
          }.toMap
          val len = fields.get("content-length").flatMap(_.toLongOption)
            .filter(n => n >= 0 && n <= Int.MaxValue.toLong)
          len match {
            case None => stop() // unframed record: cannot continue
            case Some(n) =>
              val body = in.readNBytes(n.toInt)
              if (body.length < n.toInt) { stop(); return } // truncated record
              val wtype = fields.get("warc-type")
              if (wtype.exists(t => t == "response" || t == "conversion")) {
                val uri = fields.get("warc-target-uri")
                val ts = fields.get("warc-date").flatMap(d =>
                  scala.util.Try(Timestamp.from(java.time.Instant.parse(d))).toOption)
                // response payload = bytes after the HTTP header block (if
                // present); conversion bodies are the text verbatim — the
                // HTTP strip must NOT run on them (a text that starts with
                // 'H' and contains a CRLF CRLF would be mangled)
                val httpEnd = byteIndexOf(body, CRLF2, 0)
                val payload =
                  if (wtype.contains("response") && httpEnd >= 0 &&
                      body.nonEmpty && body(0) == 'H')
                    java.util.Arrays.copyOfRange(body, httpEnd + 4, body.length)
                  else body
                (uri, ts) match {
                  case (Some(u), Some(t)) =>
                    nextPage = WarcPage(u, t, payload, wtype.get)
                  case _ => // record without uri/date: skip
                }
              }
              // consume the two record-terminating CRLFs when present
              var terms = 0
              var more = true
              while (terms < 2 && more) {
                in.mark(2)
                val a = in.read()
                val b = if (a >= 0) in.read() else -1
                if (a == '\r' && b == '\n') terms += 1
                else {
                  if (a >= 0) in.reset()
                  more = false
                }
              }
          }
        }
        if (nextPage == null) stop()
      } catch {
        // corrupt gzip member / I/O failure mid-file: keep what we have
        case _: java.io.IOException => stop()
      }
    }

    advance()
    override def hasNext: Boolean = nextPage != null
    override def next(): WarcPage = {
      val p = nextPage
      advance()
      p
    }
  }

  /** Wrap `raw` in a gzip inflater when the magic bytes say so —
    * extension-independent, so a mislabeled `.warc` that is really gzip
    * still parses. Multi-member streams (CC's per-record convention)
    * decode transparently: `GZIPInputStream` starts the next member when
    * one ends. */
  def maybeGunzip(raw: InputStream): InputStream = {
    val buf = new BufferedInputStream(raw, 1 << 16)
    buf.mark(2)
    val a = buf.read()
    val b = buf.read()
    buf.reset()
    if (a == 0x1f && b == 0x8b) new GZIPInputStream(buf, 1 << 16) else buf
  }

  /** Raw record frame: (url, warc_ts, html) from every `.warc` /
    * `.warc.gz` under `path` (glob allowed). One task per file; each
    * file is STREAMED through the Hadoop filesystem (the binaryFile
    * listing is pruned to `path` only, so file contents are never
    * buffered as rows). */
  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    spark.read.format("binaryFile").load(path)
      .select(col("path"))
      .as[String]
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(confBc.value.value)
          parseStream(maybeGunzip(fs.open(hp)))
        }
      }
      .toDF()
  }

  /** input_hint-shaped pages: for response records text is re-derived
    * from the payload by the canonical extractor (byte-identity invariant
    * by construction); for conversion records (WET) the payload IS the
    * text. lang unknown at ingest (null — language id is a downstream
    * operator). */
  def pages(spark: SparkSession, path: String): DataFrame =
    records(spark, path).select(
      col("url"),
      col("warc_ts"),
      col("html"),
      when(col("wtype") === "conversion", decode(col("html"), "UTF-8"))
        .otherwise(gf.extract_text(col("html"))).as("text"),
      lit(null).cast("string").as("lang"))

  /** WET-style conversion sink — the emit half of the CC loop ([[pages]]
    * is the ingest half): one `.warc.gz` file per partition that emits at
    * least one record, one gzip MEMBER per conversion record (Common
    * Crawl's own WET framing — per-member gzip is what keeps byte
    * offsets indexable into a compressed file and record skips cheap).
    * Records carry the ISO 28500 mandatory headers (including a
    * DETERMINISTIC name-based `WARC-Record-ID` — a random uuid would
    * break resume/retry idempotence) plus CC's `Content-Type:
    * text/plain`, so the output validates under standard WARC tooling
    * and reads back through [[pages]] (the conversion branch). Null
    * url/ts/text rows are skipped (a WET record cannot frame them); a
    * partition whose rows ALL skip writes no file (a zero-byte
    * member-less `.gz` chokes gzip tooling).
    *
    * Retry-safe: each task attempt streams to an attempt-unique
    * `.inprogress` temp file and renames into place only on success, so
    * a retried or speculative duplicate attempt can never interleave
    * bytes with — or truncate — a committed part file (the same
    * temp+rename discipline as Spark's own file committers).
    *
    * Scale shape: a pure per-partition streaming write — no shuffle, no
    * driver involvement, one output file per task, records never
    * co-buffered (one member in memory at a time). */
  def writeWet(pages: DataFrame, outDir: String): Unit = {
    val spark = pages.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    pages.select(col("url"), col("warc_ts"), col("text"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val dest =
          new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d.warc.gz")
        val tmp = new org.apache.hadoop.fs.Path(
          outDir, f".part-$pid%05d.warc.gz.inprogress-${tc.taskAttemptId()}%d")
        val fs = dest.getFileSystem(confBc.value.value)
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        try {
          it.foreach { r =>
            val url = r.getString(0)
            val ts = r.getTimestamp(1)
            val text = r.getString(2)
            if (url != null && ts != null && text != null) {
              if (out == null) out = fs.create(tmp, true)
              val body = text.getBytes(StandardCharsets.UTF_8)
              val recId = java.util.UUID.nameUUIDFromBytes(
                (url + " " + ts.toInstant.toString)
                  .getBytes(StandardCharsets.UTF_8))
              val hdr = ("WARC/1.0\r\n" +
                "WARC-Type: conversion\r\n" +
                s"WARC-Record-ID: <urn:uuid:$recId>\r\n" +
                s"WARC-Target-URI: $url\r\n" +
                "WARC-Date: " +
                java.time.format.DateTimeFormatter.ISO_INSTANT
                  .format(ts.toInstant) + "\r\n" +
                "Content-Type: text/plain\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n")
                .getBytes(StandardCharsets.UTF_8)
              val member =
                new java.io.ByteArrayOutputStream(hdr.length + body.length + 64)
              val gz = new java.util.zip.GZIPOutputStream(member)
              gz.write(hdr)
              gz.write(body)
              gz.write(Array[Byte]('\r', '\n', '\r', '\n'))
              gz.close()
              out.write(member.toByteArray)
            }
          }
          if (out != null) {
            out.close(); out = null
            // last-committer-wins publish: a racing attempt that already
            // renamed produces an identical file, so delete+rename is safe
            if (!fs.rename(tmp, dest)) {
              fs.delete(dest, false)
              if (!fs.rename(tmp, dest))
                throw new java.io.IOException(s"cannot publish $dest")
            }
          }
        } finally {
          if (out != null) out.close()
          fs.delete(tmp, false)
          ()
        }
      }
  }
}
