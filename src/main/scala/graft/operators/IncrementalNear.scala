package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Incremental NEAR-duplicate detection: a new ingest batch probed
  * against the standing corpus's LSH index without re-clustering the
  * corpus — the MinHash analog of [[IncrementalDedup]]'s exact sha tier,
  * and the operation an epoch-scale pipeline actually runs daily (the
  * full corpus re-cluster is the quarterly audit, not the ingest path).
  *
  * Mechanics: both sides get MinHash band buckets; the CORPUS bucket
  * table and the corpus shingle-set table are per-epoch artifacts — in
  * production they persist bucketed by `bkey` / `url` exactly like the
  * sha digest table (PLAN 21), so a batch ingest exchanges ONLY batch
  * rows: batch buckets probe the corpus bucket table with one join,
  * candidates dedup to (batch url, corpus url), and exact shingle
  * Jaccard verifies the survivors (each side's sets attach via a
  * semi-join-reduced build keyed by the candidate set, proportional to
  * candidates, not the corpus). Verdict = best corpus match per batch
  * doc (max Jaccard, ties to the min corpus url) or novel.
  *
  * Skew: a bucket shared by more than `hotBucketCap` corpus docs is
  * boilerplate-grade (the band key carries ~no information there) and is
  * dropped WHOLE from probing — the standard LSH hot-bucket policy, same
  * bounded-work discipline as [[Lsh]]'s `bucketCap`, and at the default
  * the drop is empty at any honest corpus scale-per-bucket. Recall for a
  * J ≥ 0.8 pair through 32×4 banding is 1 − (1 − 0.8⁴)³² ≈ 1 − 5·10⁻⁸,
  * so the oracled fixture (planted J ≈ 0.97 copies + the corpus's
  * natural near-dups) must agree with the EXHAUSTIVE batch×corpus truth
  * — which is exactly what the driver oracle computes.
  *
  * Reference anchor: the reference compares each incoming file against
  * the standing index before admitting it
  * (`ViewModels/MainViewModel.cs:586-596` blocking indexes; the compare
  * cascade `:996-1218`) — this is that admission check at batch-vs-10¹²
  * scale for NEAR duplicates.
  */
object IncrementalNear {

  /** (bkey, url) distinct band-bucket rows — the corpus-side per-epoch
    * index artifact (persist bucketed by bkey; batch probes join it in
    * place). */
  def bandBuckets(docs: DataFrame, cfg: Lsh.Config): DataFrame =
    Lsh.withSignatures(docs, cfg)
      .select(col("url"),
        posexplode(gf.band_buckets(col("sig"), cfg.bands, cfg.rowsPerBand,
          cfg.seed)).as(Seq("band", "bucket")))
      .select(col("url"), xxhash64(col("band"), col("bucket")).as("bkey"))
      .distinct()

  /** Batch (url, text) vs corpus (url, text) → one verdict row PER BATCH
    * DOC: (url, dup_of, jaccard, is_novel), where dup_of is the best
    * corpus match with exact shingle Jaccard ≥ tau (ties to min corpus
    * url) or null. */
  def vsCorpus(
      batch: DataFrame,
      corpus: DataFrame,
      cfg: Lsh.Config = Lsh.Config(),
      tau: Double = 0.8,
      hotBucketCap: Int = 1024): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    require(hotBucketCap >= 1, s"hotBucketCap must be positive: $hotBucketCap")

    val cb = bandBuckets(corpus, cfg)
    // hot-bucket drop: corpus-grain decision, part of the epoch artifact
    val cold = cb
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("bkey"))))
      .where(col("__n") <= hotBucketCap)
      .select(col("bkey"), col("url").as("curl"))
    val bb = bandBuckets(batch, cfg)

    // three consumers below (both semi-join reductions + the scored
    // join): pin the narrow pair frame so the bucket-probe subtree —
    // including both sides' signature kernels — runs once, not three
    // times (in production the corpus side is the persisted per-epoch
    // artifact already; this pins the per-ingest probe result)
    val cands = bb.join(cold, "bkey")
      .select(col("url"), col("curl"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bsets = batch
      .join(cands.select(col("url")).distinct(), Seq("url"), "left_semi")
      .select(col("url"),
        gf.shingle_set(col("text"), cfg.shingleK, cfg.seed).as("bset"))
    val csets = corpus
      .join(cands.select(col("curl").as("url")).distinct(),
        Seq("url"), "left_semi")
      .select(col("url").as("curl"),
        gf.shingle_set(col("text"), cfg.shingleK, cfg.seed).as("cset"))

    val scored = cands
      .join(bsets.hint("shuffle_hash"), Seq("url"))
      .join(csets.hint("shuffle_hash"), Seq("curl"))
      .withColumn("jaccard", gf.merge_jaccard(col("bset"), col("cset")))
      .where(col("jaccard") >= tau)

    val w = Window.partitionBy(col("url"))
      .orderBy(col("jaccard").desc, col("curl"))
    val best = scored
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("url"), col("curl").as("dup_of"),
        round(col("jaccard"), 6).as("jaccard"))

    batch.select(col("url"))
      .join(best, Seq("url"), "left")
      .withColumn("is_novel", col("dup_of").isNull)
  }
}
