package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitor: Jensen–Shannon divergence between two corpora's
  * token distributions over a FIXED 256-bucket hashed feature space — the
  * "did this month's crawl shift under me" alarm a continuously-ingesting
  * pipeline needs before mixing ratios and quality thresholds silently
  * rot. Fixed buckets (vs raw vocab) make the statistic bounded and
  * comparable across corpora of any size, the same argument as
  * [[Dsir]]'s hashed feature space.
  *
  * Scale shape: explode tokens → md5-prefix bucket → ONE map-side-combined
  * groupBy onto 256 keys (both corpora in one pass via a side tag); the
  * divergence arithmetic runs on the 256-row count table. Token text never
  * shuffles — the exchange carries ≤ 256 rows per map task.
  *
  * Exactness discipline (shared with [[NaiveBayes]]/[[Dsir]]/[[NgramLm]]):
  * per-bucket contributions are computed in PURE double arithmetic over
  * the same integers in the same left-associative shapes both engines
  * parse, quantized to integer micro-nats per bucket, then integer-summed
  * — no float summation order to disagree on, so the DuckDB oracle matches
  * bit-for-bit. The headline `js2_micro` is 2·JS in micro-nats (the ÷2
  * stays un-taken to keep the output integral); 0 = identical
  * distributions, 2·ln 2·10⁶ ≈ 1,386,294 = disjoint.
  *
  * Resolution note (honest limit, asserted in DriftSpec): hashing smooths
  * VOCAB novelty — two large corpora with disjoint vocabularies still
  * spread hash-uniform mass over the same 256 buckets and read well below
  * the 2·ln 2 bound. The statistic detects MASS shifts (language mix,
  * domain mix, template floods, length-profile changes); per-token novelty
  * is [[TextAnalysis]]'s novelty signal / [[Kmv]]'s overlap estimate.
  *
  * Reference anchor: the reference re-sizes its duplicate groups every
  * scan rather than trusting a stale model
  * (`ViewModels/MainViewModel.cs:586-596`); this is that freshness
  * discipline applied to the corpus distribution itself.
  */
object Drift {

  /** Fixed bucket space: first 2 hex chars of md5(token) → 256 buckets. */
  val Buckets = 256

  /** (key, bucket, side) stream for one corpus slice; `key` is a constant
    * for the corpus-grain report. */
  private def sideBuckets(
      df: DataFrame, key: Column, textCol: String, side: String) =
    df.select(key.as("key"), explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("key"), substring(md5(col("tok")), 1, 2).as("bucket"),
        lit(side).as("side"))

  /** One-row drift report between corpora A and B: `n_tokens_a,
    * n_tokens_b, buckets_active, kl_ab_micro, kl_ba_micro, js2_micro`
    * (all BIGINT; kl_* are the two KL(·‖M) halves, js2 their sum = 2·JS).
    *
    * Identities (per bucket i, with totals ta/tb and da = a_i as double):
    * p_i/m_i = 2·da·dtb / (da·dtb + db·dta) — the totals-scaled form that
    * never materializes p_i, q_i and stays in int64-exact double products
    * at any corpus size (counts ≤ 2^53 stay exact; beyond that the
    * products round identically in both engines). */
  /** Corpus-grain report. If EITHER side contributes zero tokens the row
    * still arrives (that is precisely when the drift alarm matters — an
    * ingest failure), with the token counts telling which side died and
    * the divergence columns NULL (a divergence between a distribution and
    * nothing is undefined, not zero). Only when BOTH corpora are empty is
    * there nothing to report and the frame is empty. */
  def report(dfA: DataFrame, dfB: DataFrame, textCol: String = "text"): DataFrame =
    keyedDrift(dfA, dfB, lit(""), textCol, dropOneSided = false).drop("key")

  /** Per-key drift — `reportBy(snapA, snapB, "host")` answers "WHICH hosts
    * changed most between crawls", the triage view over [[report]]'s
    * single alarm bit. Same single bounded-key pass with the key joined
    * in (the groupBy key becomes (key, bucket): ≤ 256 rows per key
    * through the exchange). Keys present in only one corpus are DROPPED —
    * drift is defined between two non-empty distributions; appeared/
    * vanished hosts are [[SnapshotDelta]]'s report, not a divergence. */
  def reportBy(
      dfA: DataFrame, dfB: DataFrame,
      keyCol: String, textCol: String = "text"): DataFrame =
    keyedDrift(dfA, dfB, col(keyCol), textCol, dropOneSided = true)
      .withColumnRenamed("key", keyCol)

  private def keyedDrift(
      dfA: DataFrame, dfB: DataFrame,
      key: Column, textCol: String, dropOneSided: Boolean): DataFrame = {
    val cnts = sideBuckets(dfA, key, textCol, "a")
      .unionByName(sideBuckets(dfB, key, textCol, "b"))
      .groupBy(col("key"), col("bucket"))
      .agg(
        sum(when(col("side") === "a", 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("b"))
    val tot0 = cnts.groupBy(col("key"))
      .agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    val tot =
      if (dropOneSided) tot0.where(col("ta") > 0 && col("tb") > 0) else tot0
    val bothLive = col("ta") > 0 && col("tb") > 0
    val da = col("a").cast("double"); val db = col("b").cast("double")
    val dta = col("ta").cast("double"); val dtb = col("tb").cast("double")
    val den = da * dtb + db * dta
    val mp = when(bothLive && col("a") > 0,
      round(da / dta * log(lit(2.0) * da * dtb / den) * lit(1000000.0))
        .cast("long"))
      .when(bothLive, 0L)
      .otherwise(lit(null).cast("long"))
    val mq = when(bothLive && col("b") > 0,
      round(db / dtb * log(lit(2.0) * db * dta / den) * lit(1000000.0))
        .cast("long"))
      .when(bothLive, 0L)
      .otherwise(lit(null).cast("long"))
    cnts.join(tot, "key")
      .select(col("key"), col("ta"), col("tb"), mp.as("mp"), mq.as("mq"))
      .groupBy(col("key"), col("ta"), col("tb"))
      .agg(
        count(lit(1)).as("buckets_active"),
        sum(col("mp")).as("kl_ab_micro"),
        sum(col("mq")).as("kl_ba_micro"))
      .select(
        col("key"),
        col("ta").as("n_tokens_a"), col("tb").as("n_tokens_b"),
        col("buckets_active"),
        col("kl_ab_micro"), col("kl_ba_micro"),
        (col("kl_ab_micro") + col("kl_ba_micro")).as("js2_micro"))
  }
}
