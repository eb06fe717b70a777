package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** EXACT frequent-item mining without a full-cardinality groupBy: a
  * Misra–Gries sketch pass certifies a ≤ cap candidate superset, an exact
  * recount pass scores only those candidates — output is EXACTLY "every
  * item with count ≥ minCount", with the certification checked at run
  * time rather than assumed.
  *
  * The 100 TB question this answers: "which lines / tokens / hosts repeat
  * at least θ·N times across the corpus?" — the boilerplate-discovery
  * primitive behind [[LineDedup]]-style strips. A groupBy answers it by
  * shuffling the FULL distinct cardinality (at web scale, ~one key per
  * input line) to produce a tiny output. Here instead:
  *
  *   - pass A (sketch): `misra_gries(item, cap)` is a
  *     `TypedImperativeAggregate`, so each input partition ships ONE
  *     ≤ cap-entry summary through a single-row exchange. The merged
  *     sketch's `max_err` is its exact cumulative decrement — every
  *     item's true count is within max_err above its sketch count, so
  *     any item with true count > max_err is guaranteed IN the sketch
  *     (zero-miss superset). `frequentItems` REQUIRES minCount > max_err:
  *     when the data defeats the sketch (near-uniform distribution at the
  *     asked threshold) the call fails loudly instead of silently
  *     undercounting — the caller raises `cap` or falls back to groupBy.
  *   - pass B (recount): re-scan with an `isin(candidates)` filter (a
  *     broadcast-sized literal set, ≤ cap strings) and groupBy only the
  *     surviving rows — the aggregation keys on ≤ cap distinct values,
  *     so the exchange carries ≤ cap × partitions rows.
  *
  * Two scans instead of one wide shuffle is the deliberate trade: at
  * corpus scale the scan is cheap (columnar, pushed filter) and the
  * full-cardinality exchange is the bottleneck. The driver-side collect
  * is ONE row of ≤ cap entries — bounded by construction, like the
  * mixing solver's O(strata) collect.
  *
  * Reference anchor: the reference's per-block counting is its hash
  * group-by (`ViewModels/MainViewModel.cs:1085-1130`); this is that
  * count restricted to provably-frequent keys, with the restriction
  * itself proven by the sketch.
  */
object HeavyHitters {

  /** The merged corpus sketch: one local Row
    * `(items: Seq[(item, lowerCnt)], total, maxErr)`. */
  def sketch(items: DataFrame, itemCol: String, cap: Int): (Seq[(String, Long)], Long, Long) = {
    val r = items.agg(gf.misra_gries(col(itemCol), cap).as("sk"))
      .select(col("sk.items"), col("sk.total"), col("sk.max_err"))
      .head()
    val entries = r.getSeq[Row](0).map(e => (e.getString(0), e.getLong(1)))
    (entries, r.getLong(1), r.getLong(2))
  }

  /** (item, cnt) for EVERY item with exact count ≥ minCount in
    * `items(itemCol)`. Throws when the sketch cannot certify the
    * threshold (minCount ≤ max_err) — raise `cap` or use a groupBy. */
  def frequentItems(
      items: DataFrame,
      itemCol: String,
      cap: Int,
      minCount: Long): DataFrame = {
    require(minCount > 0, s"minCount must be positive: $minCount")
    val (cands, total, maxErr) = sketch(items, itemCol, cap)
    require(minCount > maxErr,
      s"misra_gries(cap=$cap) cannot certify minCount=$minCount over " +
        s"$total items: max undercount is $maxErr — raise cap")
    items
      .where(col(itemCol).isin(cands.map(_._1): _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
