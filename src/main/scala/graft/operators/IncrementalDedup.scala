package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Incremental (batch-vs-corpus) deduplication — the continuous-ingest
  * shape of a training-data pipeline: each new crawl batch must drop (a)
  * documents duplicated *within* the batch and (b) documents already in
  * the accumulated corpus, WITHOUT rescanning corpus content.
  *
  * The corpus side is represented by its content-digest table only (one
  * narrow hex-string column) — the corpus text never moves. Plan shape at
  * 100 TB:
  *   - batch-internal dedup is one map-side-combining groupBy(sha) with a
  *     min(struct) representative election (no window, no sort of texts);
  *   - batch-vs-corpus is a LEFT ANTI join on sha. The batch side is the
  *     small side by construction (one crawl vs the whole corpus), so at
  *     scale the anti-join should run as a broadcast of the BATCH's
  *     distinct shas against the corpus-sha table — Spark plans exactly
  *     that when the batch fits `autoBroadcastJoinThreshold`; for bigger
  *     batches, keep the corpus-sha table bucketed by sha so the shuffle
  *     touches only the batch side (storage-partitioned join).
  *
  * Reference analog: the reference compares a scan against the existing
  * hash index before re-hashing content
  * (`/root/reference/ViewModels/MainViewModel.cs:1093-1146` — new items
  * join the existing duplicate groups rather than recomputing them).
  */
object IncrementalDedup {

  /** Digest column for `algo` ∈ {crc32, md5, sha256, sha512} — same dial
    * as `DedupConfig.algo`; crc32 zero-padded so the column is uniformly a
    * hex string. */
  def digestCol(text: Column, algo: String): Column = algo match {
    case "crc32" => lpad(lower(hex(crc32(text))), 16, "0")
    case "md5" => md5(text)
    case "sha256" => sha2(text, 256)
    case "sha512" => sha2(text, 512)
    case other => throw new IllegalArgumentException(s"unknown digest algo: $other")
  }

  /** New-content extraction: batch (url, text) minus corpus digests.
    * Returns (url, text, sha): one elected representative (min url) per
    * batch-distinct sha that is absent from `corpusShas` (a frame with a
    * `sha` column).
    *
    * Shape: a narrow (sha → url, rid) election, a left-anti against the
    * corpus digests, then the text re-attaches by the UNIQUE per-row id —
    * document bodies never enter any aggregate's sort/hash buffers, and a
    * batch carrying exact duplicate (url, text) rows still emits exactly
    * one output row per sha (ADVICE r3: the former (sha, url) re-attach
    * join multiplied by the copy count). The row id is reproducible for a
    * deterministic source scan (partitionId ⧺ row index), which both
    * branches of the self-reference read identically. */
  def newDocs(batch: DataFrame, corpusShas: DataFrame, algo: String = "sha256"): DataFrame = {
    val (hashed, reps) = electReps(batch, algo)
    reps
      .join(corpusShas.select(col("sha")), Seq("sha"), "left_anti")
      .join(hashed.select(col("rid"), col("text")), Seq("rid"))
      .select(col("url"), col("text"), col("sha"))
  }

  /** Shared head of both newDocs variants: digest + unique row id, then the
    * narrow per-sha representative election. */
  private def electReps(batch: DataFrame, algo: String): (DataFrame, DataFrame) = {
    val hashed = batch
      .withColumn("sha", digestCol(col("text"), algo))
      .withColumn("rid", monotonically_increasing_id())
    val reps = hashed.groupBy(col("sha"))
      .agg(
        min(col("url")).as("url"),
        min_by(col("rid"), struct(col("url"), col("rid"))).as("rid"))
    (hashed, reps)
  }

  /** Persist the corpus digest table BUCKETED by sha — the storage layout
    * that makes every subsequent batch-vs-corpus join corpus-shuffle-free.
    * A bucketed scan reports `HashPartitioning(sha, nBuckets)` to the
    * planner, so the anti-join in [[newDocsBucketed]] exchanges only the
    * batch side (repartitioned to the table's bucket count); the 10^12-row
    * digest table is read in place, every epoch, forever. `sortBy(sha)`
    * additionally lets single-file buckets skip their merge-side sort.
    *
    * At 100 TB this is the difference between "each crawl batch shuffles
    * the whole corpus digest table" and "each batch shuffles itself":
    * the corpus side's cost per batch drops from O(corpus) network to
    * O(corpus) local scan — and the Bloom gate ([[newDocsBloomGated]])
    * composes on top to cut even the scan to the overlap residue. */
  def saveShaTable(
      corpusShas: DataFrame, table: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    corpusShas.select(col("sha"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "sha").sortBy("sha")
      .format("parquet").saveAsTable(table)
  }

  /** [[newDocs]] against a sha-bucketed corpus table (written by
    * [[saveShaTable]]): identical output, but the `merge` hint pins the
    * sort-merge strategy so the bucketed layout is actually exercised —
    * the corpus side plans NO Exchange (its scan already satisfies the
    * join's distribution), while a broadcast of a 10^12-row digest table
    * would be impossible and an unhinted SMJ would shuffle it. */
  def newDocsBucketed(
      batch: DataFrame,
      bucketedCorpusShas: DataFrame,
      algo: String = "sha256"): DataFrame = {
    val (hashed, reps) = electReps(batch, algo)
    reps
      .join(bucketedCorpusShas.select(col("sha")).hint("merge"), Seq("sha"), "left_anti")
      .join(hashed.select(col("rid"), col("text")), Seq("rid"))
      .select(col("url"), col("text"), col("sha"))
  }

  /** Serialized Bloom filter over the corpus digest table, keyed by
    * xxhash64(sha) — Spark's own sketch via the Catalyst
    * `BloomFilterAggregate` (the aggregate behind runtime join-filter
    * injection), so the build is one map-side-combining pass over the
    * digest column with no driver-side iteration; only the final O(numBits)
    * buffer returns. Built once per ingest epoch and reused across every
    * batch of that epoch.
    *
    * `expectedItems`/`fpp` size the filter by the standard
    * m = -n·ln p / (ln 2)² bits. Spark caps a single aggregate's filter
    * (`spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`
    * family, default 4M items / 8 MB); a 10^12-digest corpus therefore
    * carries one bloom per digest-table bucket (the table is bucketed by
    * sha for the storage-partitioned anti-join already — the per-bucket
    * blooms ride the same layout), each batch probing its bucket's filter.
    * Returns null on an empty corpus — callers fall back to [[newDocs]]
    * (everything is new; there is nothing to gate). */
  def corpusBloom(
      corpusShas: DataFrame, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: items=$expectedItems fpp=$fpp")
    val ln2 = math.log(2)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong)
    val agg = new BloomFilterAggregate(
      bridge.expression(xxhash64(col("sha"))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    corpusShas.select(bridge.column(agg).as("bf"))
      .first().getAs[Array[Byte]](0)
  }

  /** [[newDocs]] with a Bloom gate on the corpus side — identical output
    * (bloom negatives are definitive, so non-members never reach the join;
    * members and the fpp fraction of false positives are re-verified by the
    * same left-anti join), different 100 TB cost: the (1 − dup_rate −
    * fpp) majority of a typical crawl batch is decided by an O(1) in-row
    * probe against a filter built once per epoch, and only the "maybe"
    * residue consults the corpus digest table at all. Without the gate
    * EVERY batch pays a full-batch join against 10^12 digests; with it the
    * authoritative join input shrinks to the batch's actual overlap. */
  def newDocsBloomGated(
      batch: DataFrame,
      corpusShas: DataFrame,
      bloom: Array[Byte],
      algo: String = "sha256"): DataFrame = {
    require(bloom != null, "null bloom — empty corpus? use newDocs")
    val (hashed, reps) = electReps(batch, algo)
    val maybeDup = bridge.column(BloomFilterMightContain(
      bridge.expression(lit(bloom)),
      bridge.expression(xxhash64(col("sha")))))
    val flagged = reps.withColumn("maybe_dup", maybeDup)
    val definiteNew = flagged.where(!col("maybe_dup"))
    val verifiedNew = flagged.where(col("maybe_dup"))
      .join(corpusShas.select(col("sha")), Seq("sha"), "left_anti")
    definiteNew.unionByName(verifiedNew)
      .drop("maybe_dup")
      .join(hashed.select(col("rid"), col("text")), Seq("rid"))
      .select(col("url"), col("text"), col("sha"))
  }

  /** Ingest accounting over the same inputs: one row of batch/new/dup
    * counters — the per-batch progress metrics a resumable ingest logs.
    * Output: (n_batch, n_distinct, n_internal_dups, n_corpus_dups, n_new). */
  def ingestStats(batch: DataFrame, corpusShas: DataFrame, algo: String = "sha256"): DataFrame = {
    val hashed = batch.withColumn("sha", digestCol(col("text"), algo))
    val perSha = hashed.groupBy(col("sha")).agg(count(lit(1)).as("cnt"))
    val flagged = perSha.join(
      corpusShas.select(col("sha")).distinct().withColumn("in_corpus", lit(true)),
      Seq("sha"), "left")
    flagged.agg(
      sum(col("cnt")).cast("long").as("n_batch"),
      count(lit(1)).as("n_distinct"),
      (sum(col("cnt")) - count(lit(1))).cast("long").as("n_internal_dups"),
      sum(when(col("in_corpus"), 1L).otherwise(0L)).cast("long").as("n_corpus_dups"),
      sum(when(col("in_corpus"), 0L).otherwise(1L)).cast("long").as("n_new"))
  }
}
