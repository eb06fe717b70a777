package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Sketch-based corpus sizing: distinct-count and corpus-overlap estimates
  * from k-minimum-values (KMV) sketches ([[graft.functions.KmvSketch]]).
  *
  * The questions a tier-dedup operator answers BEFORE paying for the dedup:
  *
  *   - "how many distinct documents does this corpus hold / what would
  *     exact dedup save?" → [[distinctReport]]: one corpus pass, `k` hashes
  *     exchanged per task, no groupBy of the corpus;
  *   - "how much do these two crawls share?" → [[overlap]]: one pass per
  *     corpus, then the Jaccard estimate `|S_k(A∪B) ∩ S(A) ∩ S(B)| / k` is
  *     computed on two k-row arrays (Bar-Yossef et al. 2002; the same
  *     min-hash identity MinHash uses, over the corpus instead of a doc).
  *
  * Everything is deterministic — md5 keys, lexicographic hex order, the
  * estimator in exact IEEE-double steps — so the DuckDB oracle replays the
  * estimates bit-for-bit (`SELECT DISTINCT md5(key) ORDER BY 1 LIMIT k` is
  * the sketch). Standard error of the distinct estimate is ~1/sqrt(k-2)
  * (≈ 6% at k=256); when the true distinct count is below `k` the sketch is
  * the full hash set and both estimates are EXACT.
  *
  * Reference anchor: the reference's pre-pairing hash pass sizes the
  * problem before any comparison work (`ViewModels/MainViewModel.cs:833-872`).
  */
object Kmv {

  /** 16^15 = 2^60 — the hash-fraction denominator. The estimator reads the
    * first 15 hex chars of the k-th smallest md5 (60 bits: the widest slice
    * that fits an int64 in BOTH engines), so `frac = h_k / 2^60` and
    * `est = floor((k-1) * 2^60 / h_k)`. `(k-1) * 2^60` is a power-of-two
    * multiple of a small int — exact in a double for any practical k — and
    * int64→double, multiply, divide, floor are each IEEE-deterministic, so
    * Spark and DuckDB produce the identical integer. */
  val FracDenom: Double = 1152921504606846976.0

  /** The KMV aggregate over a raw key column: k smallest distinct md5(key)
    * hex strings, ascending. Null keys are skipped (mirrors `count(key)`). */
  def sketchAgg(key: Column, k: Int): Column = gf.kmv_sketch(md5(key), k)

  /** Distinct-count estimate from a sketch array: exact size when the
    * sketch is under-full, else `floor((k-1) * 2^60 / h_k[0:15])`. */
  def estimateDistinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(floor(
        lit((k - 1).toDouble) * lit(FracDenom) /
          conv(substring(element_at(sketch, k), 1, 15), 16, 10).cast("double")))

  /** One-row corpus sizing report: `k, sketch_size, est_distinct,
    * rows_total, est_dup_rows, dup_rate_est` — the exact-dedup win forecast
    * from a single pass. `rows_total` counts non-null keys (the rows dedup
    * would actually consider). The estimate can exceed the row count by its
    * ~1/sqrt(k) error, so the dup forecast clamps at zero. */
  def distinctReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val est = estimateDistinct(col("sketch"), k)
    val dup = greatest(lit(0L), col("rows_total") - est)
    df.agg(
      sketchAgg(col(keyCol), k).as("sketch"),
      count(col(keyCol)).as("rows_total"))
      .select(
        lit(k).as("k"),
        size(col("sketch")).cast("long").as("sketch_size"),
        est.as("est_distinct"),
        col("rows_total"),
        dup.as("est_dup_rows"),
        (dup.cast("double") / col("rows_total").cast("double"))
          .as("dup_rate_est"))
  }

  /** Per-group sizing report: one row per group with `captures,
    * sketch_size, est_distinct` — the grouped form of [[distinctReport]]
    * ("how much duplicate mass does each HOST carry" feeds the crawl
    * budget the way the corpus-grain report feeds the epoch plan). The
    * aggregate stays map-side partial per group: a group's exchange
    * payload is ≤ k hashes per map task regardless of its capture count,
    * so a viral host costs the same network as a quiet one. */
  def distinctReportBy(
      df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        sketchAgg(col(keyCol), k).as("sketch"),
        count(col(keyCol)).as("captures"))
      .select(
        col(groupCol),
        col("captures"),
        size(col("sketch")).cast("long").as("sketch_size"),
        estimateDistinct(col("sketch"), k).as("est_distinct"))

  /** Per-group overlap report — the grouped [[overlap]]: one row per key
    * present in BOTH corpora (one-sided keys are [[SnapshotDelta]]'s
    * appeared/vanished report, same contract as `Drift.reportBy`) with
    * the same union-sketch columns plus the key. `overlapBy(snapA, snapB,
    * "host", "text", k)` is the re-crawl scheduler's skip list: a host
    * whose jaccard_est ≈ 1 did not change — don't re-fetch it. Cost: one
    * grouped-sketch pass per corpus and a ≤ k-array join on the key. */
  def overlapBy(
      dfA: DataFrame, dfB: DataFrame,
      groupCol: String, keyCol: String, k: Int): DataFrame = {
    val sa = dfA.groupBy(col(groupCol)).agg(sketchAgg(col(keyCol), k).as("sa"))
    val sb = dfB.groupBy(col(groupCol)).agg(sketchAgg(col(keyCol), k).as("sb"))
    sa.join(sb, Seq(groupCol))
      .withColumn("su", mergeSketches(col("sa"), col("sb"), k))
      .select(
        col(groupCol),
        lit(k).as("k"),
        size(col("su")).cast("long").as("union_sketch_size"),
        size(array_intersect(array_intersect(col("su"), col("sa")), col("sb")))
          .cast("long").as("both_in_union"),
        (size(array_intersect(array_intersect(col("su"), col("sa")), col("sb")))
          .cast("double") / size(col("su")).cast("double")).as("jaccard_est"),
        estimateDistinct(col("su"), k).as("est_union"))
  }

  /** Merge two KMV sketches into the sketch of the UNION corpus: the k
    * smallest of S(A) ∪ S(B). Exact identity, not an approximation —
    * every member of the union's true sketch is ≤ its side's k-th hash,
    * so it is present in that side's sketch and survives the merge.
    * This is what makes the sketch EPOCH-INCREMENTAL: store one ≤ k-row
    * sketch per ingested batch (or one running sketch), merge on read,
    * and corpus sizing never rescans history — the same
    * persist-the-artifact discipline as the sha digest table, at 64 KB
    * instead of 10¹² rows. Proven against a from-scratch union sketch in
    * KmvSpec. */
  def mergeSketches(sa: Column, sb: Column, k: Int): Column =
    slice(array_sort(array_union(sa, sb)), 1, k)

  /** One-row corpus-overlap report between two keyed corpora: `k,
    * union_sketch_size, both_in_union, jaccard_est, est_union`. The union
    * sketch is the k smallest of S(A) ∪ S(B) (a valid KMV sketch of A ∪ B
    * because each side's sketch contains every union-sketch member on its
    * side); the Jaccard estimate is the fraction of it present in BOTH
    * sides, and `est_union` is [[estimateDistinct]] over the union sketch —
    * |A ∪ B| without scanning either corpus twice. Each corpus is scanned
    * once; the combine is a 1-row × 1-row join of two ≤ k-element arrays. */
  def overlap(dfA: DataFrame, dfB: DataFrame, keyCol: String, k: Int): DataFrame = {
    val sa = dfA.agg(sketchAgg(col(keyCol), k).as("sa"))
    val sb = dfB.agg(sketchAgg(col(keyCol), k).as("sb"))
    sa.crossJoin(sb)
      .withColumn("su", mergeSketches(col("sa"), col("sb"), k))
      .select(
        lit(k).as("k"),
        size(col("su")).cast("long").as("union_sketch_size"),
        size(array_intersect(array_intersect(col("su"), col("sa")), col("sb")))
          .cast("long").as("both_in_union"),
        (size(array_intersect(array_intersect(col("su"), col("sa")), col("sb")))
          .cast("double") / size(col("su")).cast("double")).as("jaccard_est"),
        estimateDistinct(col("su"), k).as("est_union"))
  }
}
