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

  /** Registered domain = last two dot-labels of the host (`www.news
    * .example` → `news.example`); hosts with ≤ 2 labels pass through.
    * A public-suffix list would refine multi-label TLDs (`co.uk`) — at
    * this fixture's `.example` universe two labels are exact, and the
    * seam is this one function. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val parts = split(h, "\\.")
    when(size(parts) <= 2, h)
      .otherwise(concat_ws(".", slice(parts, -2, 2)))
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
