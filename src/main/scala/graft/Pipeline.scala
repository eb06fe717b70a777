package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators._
import graft.plans.CheckpointIO

/** End-to-end near-duplicate detection + clustering configuration.
  * The persisted query-parameter record of the reference
  * (`ViewModels/MainViewModel.cs:114-145`, persisted `:350-387`): its hash
  * is stamped into every checkpoint manifest so resume refuses mismatched
  * configs. */
final case class DedupConfig(
    minLen: Int = 20,
    shingleK: Int = 5,
    numHashes: Int = 128,
    bands: Int = 32,
    rowsPerBand: Int = 4,
    seed: Long = 42L,
    jaccardTau: Double = 0.8,
    estJPrefilter: Double = 0.6,
    hamMax: Int = 3,
    minSubstr: Int = 200,
    anchorK: Int = 50,
    bucketCap: Int = 64,
    scope: String = "all",
    verifyExtract: Boolean = false,
    runDir: Option[String] = None) {

  def lshConfig: Lsh.Config = Lsh.Config(
    shingleK = shingleK, numHashes = numHashes, bands = bands,
    rowsPerBand = rowsPerBand, seed = seed, bucketCap = bucketCap,
    estJPrefilter = estJPrefilter, hamMax = hamMax)

  def substrConfig: SubstringDup.Config = SubstringDup.Config(
    minSubstr = minSubstr, anchorK = anchorK, bucketCap = bucketCap, seed = seed)

  /** Deterministic config hash (stamped into checkpoint manifests). */
  def hash: String = {
    val repr = this.toString
    java.lang.Long.toHexString(graft.functions.Hash64.hashBytes(
      repr.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0x60F1L))
  }
}

final case class DedupResult(
    docs: DataFrame, // url,nk,ts,lang,host,dir,len,text,sha
    edges: DataFrame, // src,dst,kind
    decisions: DataFrame, // url,cluster,cluster_size,state,…
    stats: DataFrame)

/** The flagship pipeline (SURVEY.md §3.1 engine lifecycle):
  *
  *   read pages → extract text (byte-identical invariant) → length filter
  *   → exact sha2 stage (blocking + singleton short-circuit + star edges)
  *   → signatures (MinHash + SimHash, exact-representatives only — the
  *     laziness of the reference's memoized digest: hash only what can
  *     still collide) → LSH banding → bounded sorted-groupWithin candidate
  *   pairs → exact-Jaccard verification → winnowed substring pass →
  *   iterative connected components → representative election → decisions
  *   + stats.
  *
  * Every stage is an idiomatic DataFrame transform; shuffles happen exactly
  * at the blocking keys (sha, LSH bucket, fingerprint, cluster label).
  */
object DedupPipeline {

  /** pages: url, warc_ts, html, text, lang (input_hint shape). When
    * `fromHtml`, text is re-derived from html via the canonical extractor
    * (and optionally verified byte-identical against the provided text). */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      cfg: DedupConfig = DedupConfig(),
      fromHtml: Boolean = true): DedupResult = {

    val ck = cfg.runDir.map(d => new CheckpointIO(spark, d, cfg.hash))
    // Without a checkpoint dir, stage outputs are persisted and EAGERLY
    // materialized instead: several stages are consumed more than once
    // (signatures feed candidate generation AND both sides of pair
    // verification), un-materialized lineage would recompute the MinHash
    // kernel per consumer, and — critically — downstream join planning then
    // sees the cache's REAL size instead of string-width guesses (which at
    // millions of docs made the optimizer broadcast a multi-GB side).
    def stage(name: String)(build: => DataFrame): DataFrame =
      ck.map(_.stage(name)(build)).getOrElse {
        val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        df
      }

    // ---- extract + normalize (O1/O2/O3/O4 analogs) ----
    val docs = stage("docs") {
      val extracted =
        if (fromHtml) pages.withColumn("etext", gf.extract_text(col("html")))
        else pages.withColumn("etext", col("text"))
      val checked =
        if (cfg.verifyExtract && fromHtml)
          // per-row invariant (BASELINE.json input_hint): extracted text must
          // equal the provided text byte-for-byte; violations are surfaced,
          // never silently dropped
          extracted.withColumn("extract_ok", col("etext") === col("text"))
        else extracted.withColumn("extract_ok", lit(true))
      Scope.withScopeCols(
        checked
          .select(
            col("url"),
            col("warc_ts"),
            col("lang"),
            col("etext").as("text"),
            col("extract_ok"))
          .where(col("text").isNotNull && col("url").isNotNull)
          .withColumn("len", length(col("text")))
          .withColumn("nk", gf.natural_sort_key(col("url")))
          .withColumn("sha", sha2(col("text"), 256)))
    }

    // comparison universe: not ignored (strict <, MainViewModel.cs:603)
    val live = docs.where(col("len") >= cfg.minLen)

    // ---- exact stage (O5/O7/O11/O12) ----
    val exactEdges = stage("exact_edges") {
      val (_, edges) = ExactDedup.repsAndEdges(live.select(col("url"), col("nk"), col("sha")))
      edges.withColumn("kind", lit("exact"))
    }

    // exact representatives: one doc per distinct text — near-dup and
    // substring work runs on these only (identical texts ride along via the
    // exact star edges). This is the reference's lazy hashing inverted:
    // never compute an expensive signature twice for the same bytes.
    val reps = stage("reps") {
      live
        .groupBy(col("sha"))
        .agg(min(struct(col("nk"), col("url"))).as("m"), first(col("text")).as("text"))
        .select(col("m.url").as("url"), col("m.nk").as("nk"), col("text"))
    }

    // ---- signature stage (O12/O14) ----
    val sigs = stage("signatures") {
      Lsh.withSignatures(reps, cfg.lshConfig)
    }

    // ---- LSH candidates + verification (O8/O10/O13 analogs) ----
    val nearEdges = stage("near_edges") {
      val cands = Lsh.candidatePairs(spark, sigs, cfg.lshConfig)
        .where(Scope.pairFilter(Scope.parse(cfg.scope)))
      Lsh.verifiedEdges(cands, sigs, cfg.lshConfig, cfg.jaccardTau)
        .select(col("src"), col("dst"))
        .withColumn("kind", lit("near"))
    }

    // ---- substring stage (O15) ----
    val substrEdges = stage("substr_edges") {
      val cands = SubstringDup.candidatePairs(spark, reps, cfg.substrConfig)
        .where(Scope.pairFilter(Scope.parse(cfg.scope)))
      SubstringDup.verifiedEdges(cands, reps, cfg.substrConfig)
        .withColumn("kind", lit("substring"))
    }

    val scopedExact = exactEdges.where(Scope.pairFilter(Scope.parse(cfg.scope)))
    val edges = scopedExact
      .unionByName(nearEdges)
      .unionByName(substrEdges)

    // ---- clustering (O16) ----
    val labels = stage("labels") {
      ConnectedComponents.run(
        spark,
        live.select(col("url"), col("nk")),
        edges.select(col("src"), col("dst")))
    }

    // ---- decisions + stats (O16/O18/O19/O22) ----
    val decisions = stage("decisions") {
      Decisions.decide(
        docs.select(col("url"), col("warc_ts"), col("lang"), col("host"),
          col("dir"), col("len"), col("sha"), col("extract_ok")),
        labels.select(col("url"), col("cluster_url")),
        cfg.minLen)
    }

    val stats = Decisions.stats(decisions)
    DedupResult(docs, edges, decisions, stats)
  }

  /** The deduplicated corpus: everything except `delete` rows — the
    * copy-unique sink analog (`ViewModels/MainViewModel.cs:1348-1469`),
    * partitioned by host to preserve source structure. */
  def dedupedCorpus(pages: DataFrame, decisions: DataFrame): DataFrame =
    pages.join(
      decisions.where(col("state") === "delete").select(col("url")),
      Seq("url"), "left_anti")
}
