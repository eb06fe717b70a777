package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leak-free train/valid/test assignment, grouped by registered domain —
  * the split discipline every web-corpus training pipeline needs: pages
  * from one site share boilerplate, templates, and near-duplicate bodies,
  * so a page-level random split leaks test content into train. Grouping
  * the draw by registered domain puts EVERY page of a site on the same
  * side by construction.
  *
  * The draw reuses [[Mixing.sampleKey]]'s portable md5-hex scheme: the
  * split is a pure function of (domain, seed) — no RNG state, identical
  * under retries and on any engine with md5() (the DuckDB oracle
  * reproduces it bit-for-bit). Whole pipeline is one codegen'd
  * projection: no shuffle, no model state, nothing to skew — it composes
  * with a 100 TB scan for free.
  *
  * Reference anchor: the reference scopes dedup decisions by folder so
  * related files move together (`ViewModels/MainViewModel.cs:694-781`);
  * this is the same "group correlated rows, then decide per group" rule
  * applied to the train/test boundary.
  */
object Splits {

  /** Host of an absolute URL: the authority between `scheme://` and the
    * first `/`, `?` or `#`. RE2-portable (no lookarounds), mirrored
    * verbatim by the DuckDB oracle. */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** Registered domain of the host, public-suffix aware: consult the
    * embedded [[PublicSuffix]] snapshot for multi-label TLDs FIRST, then
    * fall back to the last two dot-labels.
    *
    *   - `news.bbc.co.uk` → `bbc.co.uk` (co.uk is a 2-label suffix: keep
    *     THREE labels — `bbc.co.uk` and `argos.co.uk` stay distinct
    *     sites instead of fusing into one `co.uk` pseudo-domain);
    *   - `district.school.k12.ca.us` → `school.k12.ca.us` (3-label
    *     suffix: keep FOUR);
    *   - a BARE public suffix (`co.uk`, `k12.ca.us`) is nobody's
    *     registered domain → NULL (callers that must never see NULL —
    *     the blocklist/quality gates — already coalesce to '');
    *   - everything else: `www.news.example` → `news.example`, hosts
    *     with ≤ 2 labels pass through unchanged.
    *
    * Membership is an `InSet` hash probe on the lowercased suffix inside
    * the same codegen'd projection — still no join, no shuffle. The SQL
    * mirror is [[PublicSuffix.registeredDomainCaseSql]], interpolating
    * the SAME snapshot. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", slice(parts, -2, 2))
    val last3 = concat_ws(".", slice(parts, -3, 3))
    val last4 = concat_ws(".", slice(parts, -4, 4))
    val inS3 = lower(last3).isInCollection(PublicSuffix.threeLabel)
    val inS2 = lower(last2).isInCollection(PublicSuffix.twoLabel)
    when(n >= 4 && inS3, last4)
      .when(n === 3 && inS3, lit(null).cast("string"))
      .when(n >= 3 && inS2, last3)
      .when(n === 2 && inS2, lit(null).cast("string"))
      .when(n <= 2, h)
      .otherwise(last2)
  }

  /** Adds `domain` and `split` ∈ {train, valid, test} columns. Fractions
    * are over DOMAINS (uniform in the hash key), not pages — a giant
    * domain moves whole, which is the point. Thresholds compare the
    * 8-hex-char key lexicographically ([[Mixing.hexThreshold]]), so the
    * assignment is reproducible anywhere md5 exists. */
  def domainSplit(
      df: DataFrame,
      urlCol: String = "url",
      fTrain: Double = 0.8,
      fValid: Double = 0.1,
      seed: Long = 7L): DataFrame = {
    require(fTrain >= 0 && fValid >= 0 && fTrain + fValid <= 1.0,
      s"bad split fractions: train=$fTrain valid=$fValid")
    val dom = registeredDomain(col(urlCol))
    val key = Mixing.sampleKey(dom, seed)
    df.withColumn("domain", dom)
      .withColumn("split",
        when(key < lit(Mixing.hexThreshold(fTrain)), lit("train"))
          .when(key < lit(Mixing.hexThreshold(fTrain + fValid)), lit("valid"))
          .otherwise(lit("test")))
  }
}
