package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators: deterministic stratified sampling
  * ("data mixing") and training-sequence packing — the two steps between a
  * deduplicated/filtered corpus and an actual training run. Both are
  * corpus-scale projections with no driver-side state, and both are
  * deterministic pure functions of the row, so re-runs (and the DuckDB
  * oracle) reproduce them bit-for-bit.
  *
  * Reference anchor: the reference's keep/delete election and per-folder
  * scoping (`ViewModels/MainViewModel.cs:1226-1240, 694-781`) decide which
  * rows survive; mixing decides *how many* of the survivors each stratum
  * contributes, the step a web-corpus user runs right after dedup.
  */
object Mixing {

  /** Uniform [0,1) sampling key for a row: the first 8 hex chars of
    * md5(id:seed), compared LEXICOGRAPHICALLY against a hex threshold —
    * hex-string order equals numeric order for fixed-width lowercase hex,
    * so `sampleKey < hexThreshold(f)` is an unbiased Bernoulli(f) draw
    * that any engine with md5() reproduces exactly (the DuckDB oracle
    * does; no engine-specific hash is involved). */
  def sampleKey(id: Column, seed: Long): Column =
    substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 8)

  /** 8-hex-char threshold for keep-fraction `f`: floor(f * 2^32) in hex,
    * zero-padded so the lexicographic compare stays width-aligned. */
  def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f")
    f"${math.min((f * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Deterministic stratified sample: keep each row of stratum s with
    * probability strata(s) (strata absent from the map are dropped —
    * mixing is an allowlist). One codegen'd projection + filter, no
    * shuffle, no RNG state: the keep decision is a pure function of
    * (id, seed), so executors re-running a lost partition make identical
    * choices — the property that makes sampling safe under retries at
    * 100 TB (a stateful RNG would not be). */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      strata: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    val key = sampleKey(col(idCol), seed)
    val keep = strata.foldLeft(lit(false)) { case (acc, (s, f)) =>
      // f >= 1 keeps the whole stratum (a threshold compare would drop the
      // 2^-32 of rows whose key is exactly "ffffffff")
      val cond =
        if (f >= 1.0) col(stratumCol) === s
        else col(stratumCol) === s && key < lit(hexThreshold(f))
      acc || cond
    }
    df.where(keep)
  }

  /** Epoch-weighted sampling — [[stratifiedSample]]'s UPSAMPLING
    * counterpart: a stratum weight may exceed 1, the standard LLM mix
    * spec ("wikipedia ×3.0, web ×0.8"). Every row of stratum s is
    * emitted floor(w(s)) times plus one more with probability frac(w(s)),
    * decided by the same md5 threshold draw as [[sampleKey]]; copies carry
    * a 0-based `epoch` column so packing can interleave them. Strata
    * absent from the map are dropped (allowlist, like
    * [[stratifiedSample]]).
    *
    * Scale shape: one codegen'd projection + a row generator — no
    * shuffle, no RNG state; the copy count is a pure function of
    * (id, seed), so lost-partition retries re-emit identical copies.
    * Output size is Σ w(s)·|s| by construction; the explode is the only
    * amplification and it is the intended one. */
  def epochSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      weights: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 100.0),
      s"weights out of [0,100]: $weights")
    require(!df.columns.contains("epoch") && !df.columns.contains("__n"),
      "input already carries an `epoch` or `__n` column")
    val key = sampleKey(col(idCol), seed)
    val copies = weights.foldLeft(lit(0)) { case (acc, (s, w)) =>
      val base = math.floor(w).toInt
      val frac = w - base
      val n =
        if (frac <= 0.0) lit(base)
        else when(key < lit(hexThreshold(frac)), lit(base + 1)).otherwise(lit(base))
      when(col(stratumCol) === s, n).otherwise(acc)
    }
    // the filter must precede the sequence: sequence(0, -1) would DESCEND
    df.withColumn("__n", copies)
      .where(col("__n") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(0), col("__n") - 1)).as("epoch"): _*)
  }

  /** Score-weighted sampling: keep each row with its OWN probability
    * `probCol` ∈ [0,1] — the quality-weighted keep rule ("retain
    * high-quality docs with certainty, the tail occasionally") that soft
    * filters use instead of a hard threshold. Same md5 draw as
    * [[sampleKey]], but the hex threshold is computed per row from
    * `probCol`, so the decision is still a pure function of
    * (id, seed, prob): retry-safe, shuffle-free, and replayable by any
    * engine with md5 (the DuckDB oracle recomputes it bit-for-bit).
    * `prob ≥ 1` keeps unconditionally (the threshold compare alone would
    * drop the 2^-32 of rows whose key is exactly "ffffffff"); `prob ≤ 0`
    * (including a garbage negative score) drops unconditionally — the
    * clamp matters because hex() of a negative long is 16 chars, which
    * would break the width-aligned compare and silently KEEP the row. */
  def sampleByProb(
      df: DataFrame,
      idCol: String,
      probCol: Column,
      seed: Long = 42L): DataFrame = {
    val key = sampleKey(col(idCol), seed)
    val clamped = greatest(probCol, lit(0.0))
    val thr = lpad(
      lower(hex(least(floor(clamped * lit(4294967296.0)), lit(4294967295.0))
        .cast("long"))),
      8, "0")
    df.where(probCol >= lit(1.0) || key < thr)
  }

  /** Token-budget mixture solver — computes the per-stratum epoch weights
    * that [[epochSample]] realises. A training run is specified as "p(s)
    * of the token budget from stratum s" (the composition table every
    * LLM data card publishes); the weight that delivers it is
    * w(s) = p(s)·budget / tokens(s), capped at `maxEpochs` because
    * repeating data beyond ~4 epochs stops helping (Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models"). A capped stratum
    * is flagged rather than silently rebalanced — the caller decides
    * whether to renormalize the remaining strata or accept the shortfall.
    *
    * Output: one row per allowlisted stratum PRESENT in the corpus —
    * (stratum, available_tokens, target_tokens, weight, capped,
    * realized_tokens = weight·available); a targeted stratum with no
    * rows emits nothing (its budget share is unrealizable — callers
    * diff the output strata against the target keys to detect it). Scale shape: one narrow
    * groupBy(stratum) sum — partial aggregation collapses each task to
    * ≤ |strata| rows before the exchange, and |strata| is O(languages ×
    * sources), never corpus-sized. */
  def solveEpochWeights(
      df: DataFrame,
      stratumCol: String,
      nTokens: Column,
      targets: Map[String, Double],
      budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    require(maxEpochs > 0.0, s"maxEpochs must be positive: $maxEpochs")
    require(targets.values.forall(_ >= 0.0) &&
      math.abs(targets.values.sum - 1.0) < 1e-9,
      s"targets must be non-negative proportions summing to 1: $targets")
    df.where(col(stratumCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(stratumCol).as("stratum"))
      .agg(sum(nTokens.cast("long")).as("available_tokens"))
      .withColumn("target_tokens",
        fracOf(targets)(col("stratum")) * lit(budgetTokens.toDouble))
      .withColumn("weight",
        least(col("target_tokens") / col("available_tokens"), lit(maxEpochs)))
      .withColumn("capped",
        col("target_tokens") / col("available_tokens") > lit(maxEpochs))
      .withColumn("realized_tokens", col("weight") * col("available_tokens"))
  }

  // solveEpochWeights' frac expression keyed by an output column
  private def fracOf(targets: Map[String, Double])(stratum: Column): Column =
    targets.foldLeft(lit(0.0)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc)
    }

  /** End-to-end budgeted mix: solve the weights, then upsample/downsample
    * with [[epochSample]]. The solver output is one row per stratum —
    * bounded by the mix spec, not the corpus — so collecting it to build
    * the weight map is the same O(|strata|) driver step as broadcasting
    * any model table, not a data collect. */
  def epochSampleByBudget(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      nTokens: Column,
      targets: Map[String, Double],
      budgetTokens: Long,
      maxEpochs: Double = 4.0,
      seed: Long = 42L): DataFrame = {
    val weights = solveEpochWeights(
      df, stratumCol, nTokens, targets, budgetTokens, maxEpochs)
      .select(col("stratum"), col("weight"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    epochSample(df, stratumCol, idCol, weights, seed)
  }

  /** Keep at most `k` rows per stratum (host/domain/source) in a total
    * deterministic order — the "no single domain dominates the corpus"
    * composition rule every web pipeline applies between dedup and mixing.
    *
    * Scale shape: a `row_number() <= k` filter over a partitioned window is
    * the form Spark's WindowGroupLimit rewrite recognizes — each map task
    * keeps only its local top-k per stratum BEFORE the exchange, so the
    * shuffle carries at most k rows per (stratum, input partition) instead
    * of the whole corpus, and no global sort exists (the same pre-exchange
    * group-limit the ANN top-k path rides). `order` must be a total order
    * (include a unique id as the last key) or retries could keep a
    * different k-subset. */
  def capPerStratum(df: DataFrame, stratumCol: String, k: Int, order: Column*): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    require(order.nonEmpty, "capPerStratum needs a deterministic order")
    val w = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Pack documents into fixed-budget training sequences, GPT-style
    * concat-then-chunk: within a shard, documents concatenate in id order
    * into one token stream that is cut every `budget` tokens; a document
    * starts in sequence floor(tokens_before / budget) at offset
    * tokens_before % budget (documents may straddle a cut — the consumer
    * reads `n_tokens` forward from there, exactly how GPT-style loaders
    * slice packed shards).
    *
    * Scale: the only wide operation is a per-shard running sum — an
    * in-partition sort + prefix scan. Shards are the parallelism unit:
    * at 100 TB use O(cluster cores) × O(100) shards so each window
    * partition is a few hundred MB; no global order exists or is needed
    * (packing only requires SOME deterministic order per shard).
    * `nShards` here uses doc_id % nShards for oracle parity; production
    * sharding would hash the id first (ids can be skewed), which is the
    * same operator with `pmod(xxhash64(id), n)` as the shard column. */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokens: Column,
      budget: Int,
      nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0)
    val shard = pmod(col(idCol), lit(nShards)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), shard.as("shard"), nTokens.cast("long").as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        (col("tokens_before") / budget).cast("long").as("seq_id"),
        pmod(col("tokens_before"), lit(budget.toLong)).as("seq_offset"))
  }
}
