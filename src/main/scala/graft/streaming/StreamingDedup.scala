package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.gf

/** Streaming ingest dedup: the batch engine's exact stage re-expressed over
  * Structured Streaming, for the "pages arrive continuously" deployment
  * (a crawl feed). The reference is batch-only (SURVEY.md §2 coverage note);
  * this is the engine's forward-looking surface, built on stock streaming
  * operators so the state store, checkpointing and exactly-once sinks are
  * all Spark-native.
  *
  * Semantics: per incoming page, emit (url, sha, state) where state is
  *   first   — first time this content hash is seen (the stream-order
  *             analog of the batch `keep`: arrival order replaces natural
  *             sort order, which cannot exist over an unbounded stream)
  *   dup     — content hash seen before (batch `delete`)
  *   ignored — length(text) < minLen
  *
  * State: one compact entry per distinct sha via
  * `mapGroupsWithState` (first-seen url + count), the streaming analog of
  * the batch blocking index (`ViewModels/MainViewModel.cs:586-588`).
  */
object StreamingDedup {

  final case class PageIn(url: String, html: Array[Byte])
  final case class ShaState(firstUrl: String, count: Long)
  final case class Decision(url: String, sha: String, state: String, dupOf: String)

  /** Transform a streaming pages frame (url, html binary) into streaming
    * decisions. Works identically on a batch frame (unit tests use both). */
  def decisions(spark: SparkSession, pages: DataFrame, minLen: Int = 20): DataFrame = {
    import spark.implicits._
    val extracted = pages
      .withColumn("text", gf.extract_text(col("html")))
      .where(col("url").isNotNull && col("text").isNotNull)
      .withColumn("len", length(col("text")))
      .withColumn("sha", sha2(col("text"), 256))

    val live = extracted.where(col("len") >= minLen)
      .select(col("url"), col("sha")).as[(String, String)]

    val deduped = live
      .groupByKey(_._2)
      .mapGroupsWithState[ShaState, Seq[Decision]](GroupStateTimeout.NoTimeout) {
        (sha: String, rows: Iterator[(String, String)], state: GroupState[ShaState]) =>
          val batch = rows.map(_._1).toSeq.sorted // deterministic intra-batch order
          state.getOption match {
            case Some(st) =>
              state.update(ShaState(st.firstUrl, st.count + batch.size))
              batch.map(url => Decision(url, sha, "dup", st.firstUrl))
            case None =>
              val first = batch.head
              state.update(ShaState(first, batch.size))
              Decision(first, sha, "first", first) +:
                batch.tail.map(url => Decision(url, sha, "dup", first))
          }
      }
      .flatMap(ds => ds)

    val ignored = extracted.where(col("len") < minLen)
      .select(col("url"), col("sha"), lit("ignored").as("state"), col("url").as("dupOf"))

    deduped.toDF().unionByName(ignored)
  }

  /** Wire a parquet-directory stream through the dedup to a memory sink —
    * the local harness used by tests; production swaps source/sink formats
    * and adds `option("checkpointLocation", …)` for exactly-once. */
  def runFileStream(
      spark: SparkSession,
      inputDir: String,
      queryName: String,
      minLen: Int = 20): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("html", org.apache.spark.sql.types.BinaryType)))
    val pages = spark.readStream.schema(schema).parquet(inputDir)
    decisions(spark, pages, minLen)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
