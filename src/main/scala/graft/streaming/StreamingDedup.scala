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

  // ---- near-dup tier ----

  final case class MemberSig(url: String, sig: Array[Long], simhash: Long)
  final case class BucketState(members: List[MemberSig], dropped: Long)
  final case class NearMatch(url: String, dupOf: String, estJaccard: Double, ham: Int)

  /** Streaming near-duplicate matches: the batch LSH stage re-expressed as
    * one stateful operator. Incoming pages are signed (MinHash + SimHash,
    * same codegen'd kernels and config as the batch engine) and exploded
    * into band buckets; state per bucket holds up to `bucketCap` member
    * signatures (arrival order — the batch cap discipline with stream
    * order standing in for natural order, overflow counted in the state,
    * never silent). A new arrival emits a match against every stored or
    * earlier-same-batch member whose signature agreement passes
    * (`est_jaccard ≥ tau` or SimHash Hamming ≤ hamMax).
    *
    * Verification is SIGNATURE-level by design: exact shingle-set Jaccard
    * would require storing full document text in the state store —
    * unbounded bytes per bucket — so the streaming tier trades the batch
    * tier's exact verify for `O(cap·(8·numHashes))` bounded state per
    * bucket. est_jaccard concentrates within ±3/√numHashes of the true
    * value (SignatureSpec property), so at numHashes=128 a τ=0.8 gate is
    * a ±0.27-quality online filter; the batch pipeline over the archived
    * corpus remains the ground truth (same signatures ⇒ its exact verify
    * accepts a superset semantics, documented deviation).
    *
    * A pair sharing b buckets is emitted up to b times (one per bucket
    * group — streaming state is partitioned by bucket and groups cannot
    * see each other); consumers dedup on (url, dupOf), e.g.
    * `matches.dropDuplicates("url", "dupOf")` — done by the test harness
    * and any batch read of the sink. */
  def nearDupMatches(
      spark: SparkSession,
      pages: DataFrame,
      cfg: graft.operators.Lsh.Config = graft.operators.Lsh.Config(),
      tau: Double = 0.8,
      bucketCap: Int = 16,
      minLen: Int = 20): DataFrame = {
    import spark.implicits._
    val signed = pages
      .withColumn("text", gf.extract_text(col("html")))
      .where(col("url").isNotNull && col("text").isNotNull)
      .where(length(col("text")) >= minLen)
      // fused signature pass — see Lsh.withSignatures (bit-identical)
      .withColumn("__sp",
        gf.sig_pair(col("text"), cfg.shingleK, cfg.numHashes, cfg.seed))
      .withColumn("sig", col("__sp.sig"))
      .withColumn("simhash", col("__sp.simhash"))
      .drop("__sp")
      .select(
        col("url"), col("sig"), col("simhash"),
        explode(gf.band_buckets(col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed))
          .as("bucket"))
      .as[(String, Array[Long], Long, Long)]

    signed
      .groupByKey(_._4)
      .flatMapGroupsWithState[BucketState, NearMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(String, Array[Long], Long, Long)],
         state: GroupState[BucketState]) =>
          val st0 = state.getOption.getOrElse(BucketState(Nil, 0L))
          // deterministic intra-batch order (stream analog of natural order)
          val batch = rows.toSeq.sortBy(_._1)
          var members = st0.members
          var dropped = st0.dropped
          val out = Seq.newBuilder[NearMatch]
          batch.foreach { case (url, sig, sim, _) =>
            members.foreach { m =>
              val est = graft.functions.MinHashImpl.estJaccard(sig, m.sig)
              val ham = graft.functions.MinHashImpl.hamming(sim, m.simhash)
              if (est >= tau || ham <= cfg.hamMax)
                out += NearMatch(url, m.url, est, ham)
            }
            if (members.size < bucketCap) members = members :+ MemberSig(url, sig, sim)
            else dropped += 1
          }
          state.update(BucketState(members, dropped))
          out.result().iterator
      }
      .toDF()
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
