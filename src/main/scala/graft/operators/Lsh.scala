package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{gf, MinHashImpl, NaturalKey}

/** Near-duplicate candidate generation: MinHash LSH banding + SimHash block
  * bucketing, with a bounded sorted-groupWithin pair join.
  *
  * Pipeline: signature columns → posexplode band buckets (the engine's only
  * generator, a Spark built-in) → group by (band, bucket) → within each
  * bucket, sort members by natural key and emit
  *   (a) star edges between identical-signature members (linear — the
  *       hot-bucket "skew bomb" of repeated boilerplate never goes
  *       quadratic; the exact stage already stars byte-identical docs, this
  *       covers identical-signature-but-different-bytes), and
  *   (b) all pairs among at most `bucketCap` distinct-signature
  *       representatives (bounded B(B-1)/2), counting what was dropped —
  *       no silent truncation.
  *
  * This is the scaled analog of the reference's per-device scheduling
  * discipline — bounded work per hot resource
  * (`ViewModels/MainViewModel.cs:1166-1213`, semaphores `:1175,1178`) —
  * applied to hot LSH buckets instead of hot disks.
  */
object Lsh {

  final case class Config(
      shingleK: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      seed: Long = 42L,
      bucketCap: Int = 64,
      maxBucketRead: Int = 8192,
      estJPrefilter: Double = 0.6,
      hamMax: Int = 3,
      /** SimHash 16-bit-block candidate generation (complete for Hamming≤3
        * by pigeonhole) is OFF by default: the block key space is only
        * 2^16, so beyond ~10^5 docs every block bucket goes quadratic
        * (observed: 16M+ false candidates at 757k docs). MinHash banding
        * alone misses a J≥0.8 pair with P≈(1-0.8⁴)³²≈5e-8. The scale path
        * for Hamming-only retrieval is `useSimhashTables`. */
      useSimhashBuckets: Boolean = false,
      /** Manku WWW'07 permuted-table SimHash retrieval: C(tableBlocks,
        * tableKeep) keys per doc, each over a ~2^(keep·64/nBlocks) key
        * space — complete for Hamming ≤ tableBlocks - tableKeep with tiny
        * buckets at web scale. OFF by default (MinHash banding is the
        * primary near-dup signal; enable for Hamming-defined similarity). */
      useSimhashTables: Boolean = false,
      tableBlocks: Int = 6,
      tableKeep: Int = 3) {
    require(bands * rowsPerBand == numHashes, "bands*rowsPerBand must equal numHashes")
    require(
      !useSimhashTables || tableBlocks - tableKeep >= hamMax,
      s"simhash tables cover Hamming ≤ ${tableBlocks - tableKeep} < hamMax=$hamMax")
  }

  /** Adds sig / simhash / sigd columns to a docs frame with a text column. */
  def withSignatures(docs: DataFrame, cfg: Config): DataFrame = {
    val sig = gf.minhash_sig(col("text"), cfg.shingleK, cfg.numHashes, cfg.seed)
    docs
      .withColumn("sig", sig)
      .withColumn("sigd", gf.sig_digest(col("sig")))
      .withColumn("simhash", gf.simhash64(col("text"), cfg.shingleK, cfg.seed))
  }

  private val pairSchema = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("same_sig", BooleanType, nullable = false),
    StructField("dropped", LongType, nullable = false)))

  /** Candidate pairs from MinHash band buckets ∪ SimHash 16-bit blocks.
    * Input: url, nk, sig, sigd, simhash. Output: src, dst (src < dst by
    * natural key; distinct across all buckets), same_sig, dropped (count of
    * distinct-sig members beyond the cap in the emitting bucket).
    * `scopeCol` is folded into every bucket key (Same*-scope runs pass the
    * scope value so pairs are same-scope by construction; the default empty
    * literal is a no-op salt). */
  def candidatePairs(
      spark: SparkSession,
      docs: DataFrame,
      cfg: Config,
      scopeCol: org.apache.spark.sql.Column = lit("")): DataFrame = {
    import spark.implicits._

    val minhashBuckets = docs
      .select(
        col("url"), col("nk"), col("sigd"), scopeCol.as("bscope_"),
        posexplode(gf.band_buckets(col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed))
          .as(Seq("band", "bucket")))
      .select(
        // tag the band into the bucket key so cross-band collisions split
        xxhash64(col("band"), col("bucket"), col("bscope_")).as("bkey"),
        col("url"), col("nk"), col("sigd"))

    val withBlocks =
      if (!cfg.useSimhashBuckets) minhashBuckets
      else {
        val simhashBuckets = docs
          .select(
            col("url"), col("nk"), col("sigd"), scopeCol.as("bscope_"),
            explode(gf.simhash_blocks(col("simhash"))).as("bucket"))
          .select(
            xxhash64(lit(0x51AB17L), col("bucket"), col("bscope_")).as("bkey"),
            col("url"), col("nk"), col("sigd"))
        minhashBuckets.unionByName(simhashBuckets)
      }

    val all =
      if (!cfg.useSimhashTables) withBlocks
      else {
        val tableBuckets = docs
          .select(
            col("url"), col("nk"), col("sigd"), scopeCol.as("bscope_"),
            explode(gf.simhash_table_keys(col("simhash"), cfg.tableBlocks, cfg.tableKeep))
              .as("tkey"))
          .select(
            xxhash64(lit(0x7AB1E5L), col("tkey"), col("bscope_")).as("bkey"),
            col("url"), col("nk"), col("sigd"))
        withBlocks.unionByName(tableBuckets)
      }

    // sorted groupWithin: one group per (band, bucket); bounded read
    val cap = cfg.bucketCap
    val maxRead = cfg.maxBucketRead
    val pairs = all
      .select(col("bkey"), col("url"), col("nk"), col("sigd"))
      .as[(Long, String, Array[Byte], Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        emitBucketPairs(it, cap, maxRead)
      }(org.apache.spark.sql.Encoders.row(pairSchema))
    pairs.dropDuplicates("src", "dst")
  }

  /** Pair emission for one bucket. Members sorted by natural key; identical
    * signatures become star edges to their first member; distinct-signature
    * representatives (first per signature, up to cap) pair all-to-all. */
  private def emitBucketPairs(
      it: Iterator[(Long, String, Array[Byte], Long)],
      cap: Int,
      maxRead: Int): Iterator[Row] = {
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Array[Byte], Long)]()
    var overflow = 0L
    while (it.hasNext) {
      val (_, url, nk, sigd) = it.next()
      if (buf.length < maxRead) buf += ((url, nk, sigd)) else overflow += 1
    }
    if (buf.length < 2) return Iterator.empty
    val sorted = buf.sortWith((a, b) => NaturalKey.compareKeys(a._2, b._2) < 0)

    val out = new scala.collection.mutable.ArrayBuffer[Row]()
    // group by signature digest; reps keep the bucket's natural order
    val firstBySig = new java.util.HashMap[java.lang.Long, String]()
    val reps = new scala.collection.mutable.ArrayBuffer[String]()
    sorted.foreach { case (url, _, sigd) =>
      val first = firstBySig.get(java.lang.Long.valueOf(sigd))
      if (first == null) {
        firstBySig.put(java.lang.Long.valueOf(sigd), url)
        reps += url
      } else {
        out += Row(first, url, true, 0L)
      }
    }
    val dropped = math.max(0L, reps.length.toLong - cap) + overflow
    val limit = math.min(reps.length, cap)
    var i = 0
    while (i < limit) {
      var j = i + 1
      while (j < limit) {
        out += Row(reps(i), reps(j), false, dropped)
        j += 1
      }
      i += 1
    }
    out.iterator
  }

  /** Verified near-dup edges: candidates are prefiltered on the cheap
    * signature estimates (est. Jaccard or SimHash Hamming), then confirmed
    * with the exact shingle-set Jaccard computed from both texts — the
    * cheap→expensive cascade of the reference's predicate chain
    * (`ViewModels/MainViewModel.cs:996-1218`) as pipeline stages. */
  def verifiedEdges(
      candidates: DataFrame, // src, dst, same_sig
      docs: DataFrame, // url, text, sig, simhash
      cfg: Config,
      tau: Double): DataFrame = {
    // cheap prefilter first, against signatures only (no texts shuffled yet)
    val sa = docs.select(col("url").as("src"), col("sig").as("sig_a"), col("simhash").as("sim_a"))
    val sb = docs.select(col("url").as("dst"), col("sig").as("sig_b"), col("simhash").as("sim_b"))
    val prefiltered = candidates
      .join(sa, "src")
      .join(sb, "dst")
      .withColumn("est_j", gf.est_jaccard(col("sig_a"), col("sig_b")))
      .withColumn("ham", gf.hamming_dist(col("sim_a"), col("sim_b")))
      .where(col("same_sig") || col("est_j") >= cfg.estJPrefilter || col("ham") <= cfg.hamMax)
      .select(col("src"), col("dst"), col("est_j"), col("ham"))

    // expensive exact verification: join texts, then REBALANCE before the
    // shingle-set kernel — join output is partitioned by the join key, and
    // hot bucket representatives concentrate thousands of pairs on one
    // task; hashing on the full pair spreads the kernel evenly (the skew
    // discipline of the reference's per-disk scheduler,
    // ViewModels/MainViewModel.cs:1166-1213, applied to CPU)
    val ta = docs.select(col("url").as("src"), col("text").as("text_a"))
    val tb = docs.select(col("url").as("dst"), col("text").as("text_b"))
    prefiltered
      .join(ta, "src")
      .join(tb, "dst")
      .repartition(col("src"), col("dst"))
      .withColumn("jaccard", gf.shingle_jaccard(col("text_a"), col("text_b"), cfg.shingleK, cfg.seed))
      .where(col("jaccard") >= tau)
      .select(col("src"), col("dst"), col("jaccard"), col("est_j"), col("ham"))
  }
}
