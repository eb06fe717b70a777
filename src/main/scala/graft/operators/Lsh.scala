package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Near-duplicate candidate generation: MinHash LSH banding (+ optional
  * SimHash blocks / Manku tables), entirely in Catalyst.
  *
  * Pipeline: signature columns → one partially-aggregated (sigd) groupBy
  * electing a center per distinct signature (non-centers star to it —
  * linear: the hot-bucket "skew bomb" of repeated boilerplate never goes
  * quadratic; the exact stage already stars byte-identical docs, this
  * covers identical-signature-but-different-bytes) → posexplode band
  * buckets of the CENTERS only (identical signatures share identical
  * buckets, so non-centers can't contribute new pairs) → one bounded-top-k
  * aggregate per bucket keeping members by (nk-prefix, id) up to
  * `bucketCap` (counting what was dropped — no silent truncation) and a
  * higher-order transform expands the pairs.
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
      /** Verification prefilter: pairs pass when same-signature, SimHash
        * Hamming ≤ hamMax, or co-bucketed in ≥ minSharedBands buckets.
        * All three signals fall out of candidate generation for free — no
        * signature join. Recall-safe at the default: J ≥ 0.8 pairs share
        * ≥ 2 of 32 bands with P ≈ 1 - 1e-6. */
      minSharedBands: Int = 2,
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

  /** Adds sig / simhash / sigd columns to a docs frame with a text column.
    * MinHash and SimHash come from ONE fused tokenize+hash pass
    * (`sig_pair`) — the standalone expressions each paid the UTF-8 decode
    * and per-shingle rolling hash; values are bit-identical. The struct
    * lands as a real column first so both field extractions read one
    * evaluation whatever the project-collapse rules decide. */
  def withSignatures(docs: DataFrame, cfg: Config): DataFrame = {
    docs
      .withColumn("__sp",
        gf.sig_pair(col("text"), cfg.shingleK, cfg.numHashes, cfg.seed))
      .withColumn("sig", col("__sp.sig"))
      .withColumn("sigd", gf.sig_digest(col("__sp.sig")))
      .withColumn("simhash", col("__sp.simhash"))
      .drop("__sp")
  }

  /** Candidate pairs from MinHash band buckets (∪ optional SimHash blocks /
    * Manku tables). Input: url, nk, sig, sigd, simhash. Output: src, dst
    * (src < dst by natural order; one row per pair), same_sig, ham (SimHash
    * Hamming distance), nshared (for distinct-sig pairs: the number of
    * buckets the pair co-occurred in; 1 for same-sig star pairs, which the
    * prefilter passes on same_sig), dropped (distinct-sig members beyond
    * the cap in the pair's buckets).
    *
    * Hot-path design (round-2 rework): every bucket row is FOUR LONGS —
    * doc id (xxhash64 of url), an 8-byte natural-key prefix for ordering,
    * the SimHash, and the bucket key (plus the signature digest when a
    * SimHash bucket path needs per-bucket dedup). No strings or byte
    * arrays pass through the big explode-shuffle or the per-bucket sort:
    * at 1M docs the old string-carrying rows made task CPU inflate 2.7×
    * from 8→32 threads (allocation-rate bound, not compute bound). Ids
    * resolve back to urls with two cheap joins on the (small) pair output.
    * An id collision (~N²/2^65) merely duplicates a candidate, which exact
    * verification discards.
    *
    * same_sig / ham / nshared come free from the buckets and replace the
    * round-1 est-Jaccard prefilter, whose signature join shuffled the full
    * 1 KB-per-row sig table (~1.5 GB at 1M docs) to score 0.27M pairs.
    *
    * `scopeCol` is folded into every bucket key (Same*-scope runs pass the
    * scope value so pairs are same-scope by construction). */
  def candidatePairs(
      spark: SparkSession,
      docs: DataFrame,
      cfg: Config,
      scopeCol: org.apache.spark.sql.Column = lit("")): DataFrame = {
    import spark.implicits._

    val ids = docs.select(
      xxhash64(col("url"), lit(0x1D5EEDL)).as("id"),
      col("url"), col("nk"), col("sig"), col("sigd"), col("simhash"),
      scopeCol.as("bscope_"))
    val base = ids.select(
      col("id"), gf.nk_prefix64(col("nk")).as("nkp"), col("sigd"),
      col("simhash"), col("bscope_"), col("sig"))
    // Per-bucket signature dedup is needed only when the SimHash bucket
    // paths are on: the MinHash band path explodes one row per DISTINCT
    // signature by construction (centers below), so the default config
    // drops sigd from bucket rows (8 B/row less through the widest
    // exchange+sort) and skips the lag-based dedup entirely.
    val dedupNeeded = cfg.useSimhashBuckets || cfg.useSimhashTables
    def compact(df: DataFrame, keyCol: org.apache.spark.sql.Column) = df.select(
      Seq(keyCol.as("bkey"), col("id"), col("nkp")) ++
        (if (dedupNeeded) Seq(col("sigd")) else Nil) :+ col("simhash"): _*)

    // Distinct-signature CENTER election is ONE partially-aggregable
    // groupBy per branch, not a window (the round-4 rework): identical
    // signatures imply identical band buckets, so only centers enter the
    // band explode — a non-center member could never contribute a pair the
    // center doesn't. min(struct(nkp, id, …)) elects the (nkp, id)-first
    // member exactly as the former window rank did, but the map-side
    // PARTIAL pass collapses each input partition's share of a hot
    // identical-signature group (viral boilerplate) to one row before the
    // exchange — no task ever sorts the whole group, and AQE can split the
    // stars join below if the group is still hot.
    //
    // The 32 band-bucket keys (256 B) ride the elected struct, so the
    // ~1 KB signature never re-attaches: the round-3 shape semi-joined the
    // full sig table against the elected ids, which at 2M docs exchanged
    // 1.6 GB of signatures (and burned ~30% of the stage's task time)
    // just to recover `sig` for the band explode.
    import org.apache.spark.sql.expressions.Window
    val narrow = base.drop("sig")
    val elected = base
      .select(
        col("sigd"), col("bscope_"), col("nkp"), col("id"), col("simhash"),
        gf.band_buckets(col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed).as("bks"))
      .groupBy(col("sigd"), col("bscope_"))
      .agg(min(struct(col("nkp"), col("id"), col("simhash"), col("bks"))).as("c"))
      .select(
        col("sigd"), col("bscope_"), col("c.nkp").as("nkp"),
        col("c.id").as("id"), col("c.simhash").as("simhash"), col("c.bks").as("bks"))

    val minhashBuckets = compact(
      elected.select(
        col("id"), col("nkp"), col("sigd"), col("simhash"), col("bscope_"),
        posexplode(col("bks")).as(Seq("band", "bucket"))),
      // tag the band into the bucket key so cross-band collisions split
      xxhash64(col("band"), col("bucket"), col("bscope_")))

    val withBlocks =
      if (!cfg.useSimhashBuckets) minhashBuckets
      else minhashBuckets.unionByName(compact(
        base.select(
          col("id"), col("nkp"), col("sigd"), col("simhash"), col("bscope_"),
          explode(gf.simhash_blocks(col("simhash"))).as("bucket")),
        xxhash64(lit(0x51AB17L), col("bucket"), col("bscope_"))))

    val all =
      if (!cfg.useSimhashTables) withBlocks
      else withBlocks.unionByName(compact(
        base.select(
          col("id"), col("nkp"), col("sigd"), col("simhash"), col("bscope_"),
          explode(gf.simhash_table_keys(col("simhash"), cfg.tableBlocks, cfg.tableKeep))
            .as("tkey")),
        xxhash64(lit(0x7AB1E5L), col("tkey"), col("bscope_"))))

    // Same-signature star edges are GLOBAL, not per-bucket: identical
    // signatures imply identical band buckets, so grouping by sigd once
    // (757k rows) replaces finding the same stars 32× inside the exploded
    // bucket table. Star center = (nkp, id)-first member — the same row
    // that entered the band explode above (a second narrow groupBy rather
    // than a reuse of `elected`, so column pruning drops the bucket arrays
    // from this branch's exchange; the join is a plain shuffle join on
    // sigd, which AQE skew-splits when one signature group is hot).
    val centersNarrow = narrow
      .groupBy(col("sigd"), col("bscope_"))
      .agg(min(struct(col("nkp"), col("id"), col("simhash"))).as("c"))
      .select(
        col("sigd"), col("bscope_"),
        col("c.id").as("center_id"), col("c.simhash").as("center_sim"))
    val sigStars = narrow
      .join(centersNarrow, Seq("sigd", "bscope_"))
      .where(col("id") =!= col("center_id"))
      .select(
        col("center_id").as("src_id"), col("id").as("dst_id"),
        lit(true).as("same_sig"),
        gf.hamming_dist(col("center_sim"), col("simhash")).as("ham"),
        lit(0L).as("dropped"))

    // Distinct-signature bucket pairs. Default path: ONE bounded-top-k
    // aggregate (`gf.bounded_topk`, a TypedImperativeAggregate) per bucket
    // — the planner gives it a map-side PARTIAL pass, so every input
    // partition ships at most `bucketCap` members per bucket through the
    // exchange. A viral-boilerplate bucket with 10^6 distinct-signature
    // members sends cap×partitions rows instead of 10^6, and the full
    // exploded-table sort the round-2 window rank needed is gone. Output is
    // bit-identical to the (nkp, id)-ordered window formulation tested in
    // BoundedTopKSpec; note the cap-retention ORDER changed from the
    // round-2 lag-window path ((sigd, nkp, id) there), so over-cap buckets
    // keep a different — equally valid — member subset than runs recorded
    // before this release. Rows beyond the cap drop with a count — never
    // silently. A higher-order
    // transform expands the ≤ cap members into pairs — no second shuffle,
    // no self-join. When the SimHash paths are on, a lag window
    // additionally keeps one member per signature per bucket first (the
    // band path needs no dedup — it explodes only distinct-signature
    // centers).
    val cap = cfg.bucketCap
    val grouped = if (!dedupNeeded) {
      all
        .groupBy(col("bkey"))
        .agg(gf.bounded_topk(col("nkp"), col("id"), col("simhash"), cap).as("r"))
        .select(
          col("bkey"), col("r.ms").as("ms"),
          greatest(col("r.total") - cap, lit(0L)).as("dropped"))
        .where(size(col("ms")) >= 2)
    } else {
      val wBu = Window.partitionBy(col("bkey"))
      val wB = Window.partitionBy(col("bkey")).orderBy(col("sigd"), col("nkp"), col("id"))
      val keepFlag = coalesce(col("sigd") =!= lag(col("sigd"), 1).over(wB), lit(true))
      all
        .withColumn("keep", keepFlag)
        .withColumn("krank", sum(when(col("keep"), 1).otherwise(0)).over(wB))
        .withColumn("kcnt", sum(when(col("keep"), 1).otherwise(0)).over(wBu))
        .where(col("keep") && col("krank") <= cap)
        .groupBy(col("bkey"))
        .agg(
          sort_array(collect_list(struct(col("krank"), col("id"), col("simhash")))).as("ms"),
          max(greatest(col("kcnt") - cap, lit(0))).cast("long").as("dropped"))
        .where(size(col("ms")) >= 2)
    }
    val bucketPairs = grouped
      .select(
        explode(flatten(transform(col("ms"), (x, i) =>
          transform(
            slice(col("ms"), i + lit(2), size(col("ms"))),
            y => struct(
              x.getField("id").as("src_id"),
              y.getField("id").as("dst_id"),
              gf.hamming_dist(x.getField("simhash"), y.getField("simhash")).as("ham")))))).as("p"),
        col("dropped"))
      .select(
        col("p.src_id"), col("p.dst_id"),
        lit(false).as("same_sig"), col("p.ham"), col("dropped"))

    // cross-bucket dedup + the free prefilter signals in one aggregation
    val pairs = bucketPairs.unionByName(sigStars)
      .groupBy(col("src_id"), col("dst_id"))
      .agg(
        max(col("same_sig")).as("same_sig"),
        min(col("ham")).as("ham"),
        count(lit(1)).as("nshared"),
        max(col("dropped")).as("dropped"))

    val m = ids.select(col("id"), col("url"))
    pairs
      .join(m.select(col("id").as("src_id"), col("url").as("src")), "src_id")
      .join(m.select(col("id").as("dst_id"), col("url").as("dst")), "dst_id")
      .select(
        col("src"), col("dst"), col("same_sig"), col("ham"),
        col("nshared"), col("dropped"))
  }


  /** Verified near-dup edges: candidates are prefiltered on the signals the
    * buckets already produced for free (identical signature, SimHash
    * Hamming, shared-bucket count — for a true pair at J ≥ 0.8 the expected
    * shared-band count is 32·0.8⁴ ≈ 13, so `nshared ≥ minSharedBands`
    * misses it with P < 1e-5), then confirmed with the exact shingle-set
    * Jaccard — the cheap→expensive cascade of the reference's predicate
    * chain (`ViewModels/MainViewModel.cs:996-1218`) as pipeline stages.
    * Only candidate-touched docs are shingled (semi-join reduction, once
    * per doc — see shingle_set), so the set side of the join is
    * proportional to the candidate set, not the corpus. */
  def verifiedEdges(
      candidates: DataFrame, // src, dst, same_sig, ham, nshared
      docs: DataFrame, // url, text
      cfg: Config,
      tau: Double): DataFrame = {
    val pre = candidates.where(
      col("same_sig") || col("ham") <= cfg.hamMax ||
        col("nshared") >= cfg.minSharedBands)
    val touched = pre.select(col("src").as("url"))
      .unionByName(pre.select(col("dst").as("url")))
      .distinct()
    // Shingle each touched doc ONCE into its distinct-sorted hash set; a doc
    // appearing in p pairs was previously re-tokenized + re-hashed p times
    // inside the per-pair kernel — the allocation burn that kept this stage
    // flat from 8→32 threads. The per-pair kernel is now a sorted merge.
    val sets = docs.select(col("url"), col("text"))
      .join(touched, Seq("url"), "left_semi")
      .select(col("url"), gf.shingle_set(col("text"), cfg.shingleK, cfg.seed).as("sset"))

    // Expensive exact verification. Each pair melts into two endpoint
    // probes so ONE hash join attaches both shingle sets from a single
    // evaluation of the `sets` subtree; the round-3 shape joined `sets`
    // twice (once per side) and Spark planned the shingle pipeline twice —
    // exchange reuse never fired across the two renamed sides, so the
    // dominant cost of this stage (tokenize+hash+sort per doc, 2.4 GB of
    // set bytes at 2M docs) was paid double. The SHUFFLE_HASH hint keeps
    // the wide set arrays out of a sort-merge sort; the reassembly groupBy
    // is keyed by the pair itself, so it is skew-free by construction (the
    // skew discipline of the reference's per-disk scheduler,
    // ViewModels/MainViewModel.cs:1166-1213, applied to CPU).
    val melted = pre
      .select(col("src"), col("dst"), col("ham"), col("nshared"),
        explode(array(lit(true), lit(false))).as("is_src"))
      .withColumn("url", when(col("is_src"), col("src")).otherwise(col("dst")))
    melted
      .join(sets.hint("shuffle_hash"), Seq("url"))
      .groupBy(col("src"), col("dst"))
      .agg(
        first(col("ham")).as("ham"),
        first(col("nshared")).as("nshared"),
        max(when(col("is_src"), col("sset"))).as("set_a"),
        max(when(!col("is_src"), col("sset"))).as("set_b"))
      .withColumn("jaccard", gf.merge_jaccard(col("set_a"), col("set_b")))
      .where(col("jaccard") >= tau)
      .select(col("src"), col("dst"), col("jaccard"), col("ham"), col("nshared"))
  }
}
