package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Final per-document labeling and the state-scoped statistics.
  *
  * State machine (the batch-immutable analog of the reference's mutable
  * 10-state machine, `ViewModels/FileEntryViewModel.cs:13-25`):
  *   ignored — `length(text) < minLen` (strict `<`, matching the code not
  *             the UI text of the reference: `MainViewModel.cs:603` vs
  *             `:145`); excluded from all comparison
  *   unique  — cluster of size 1
  *   keep    — the cluster's natural-sort-min member (first in scan order
  *             wins: `MainViewModel.cs:877-882, 1226-1240`)
  *   delete  — every other cluster member
  *
  * The engine never destroys input (the reference's recycle-bin soft delete,
  * `FileEntryViewModel.cs:209-214`, becomes a decisions table): downstream
  * consumers either read the decisions or anti-join `delete` urls away.
  */
object Decisions {

  /** docs must carry url, len; labels carry url, cluster_url (absent rows =
    * never clustered). minLen rows are ignored regardless of clustering.
    *
    * `dissolveSingleScope`: for Different*-scope modes (duplicates only
    * count across scope values, `ViewModels/MainViewModel.cs:653-686`) pass
    * the scope column name (host/dir). Clusters whose members all share one
    * scope value have no valid cross-scope duplicate pair, so they dissolve
    * — every member reverts to its own singleton cluster (`unique`).
    * Clusters spanning ≥ 2 scope values stand whole: each member there has
    * a cross-scope partner (documented over-delete for the minority of
    * same-scope member pairs inside a mixed cluster — conservative in the
    * training-data-dedup direction, and complete for pair recall). */
  def decide(
      docs: DataFrame,
      labels: DataFrame,
      minLen: Int,
      dissolveSingleScope: Option[String] = None): DataFrame = {
    val withLbl = docs.join(labels, Seq("url"), "left")
      .withColumn("cluster", coalesce(col("cluster_url"), col("url")))
    // groupBy + join rather than a window: partial aggregation keeps a
    // mega-cluster (boilerplate repeated millions of times) off a single
    // task, and AQE's skew-join handles the join side.
    val sizes = dissolveSingleScope match {
      case None =>
        withLbl.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      case Some(sc) =>
        withLbl.groupBy(col("cluster")).agg(
          count(lit(1)).as("cluster_size"),
          countDistinct(col(sc)).as("n_scopes"))
    }
    val sized = withLbl.join(sizes, "cluster")
    val resolved = dissolveSingleScope match {
      case None => sized
      case Some(_) =>
        sized
          .withColumn(
            "cluster",
            when(col("n_scopes") === 1, col("url")).otherwise(col("cluster")))
          .withColumn(
            "cluster_size",
            when(col("n_scopes") === 1, lit(1L)).otherwise(col("cluster_size")))
          .drop("n_scopes")
    }
    resolved.withColumn(
      "state",
      when(col("len") < minLen, "ignored")
        .when(col("cluster_size") === 1, "unique")
        .when(col("url") === col("cluster"), "keep")
        .otherwise("delete"))
  }

  /** Manual label overrides (O17) — the reference's post-scan keep↔delete
    * toggle (`Views/MainWindow.xaml.cs:15-38`, toggle at `:19-26`) as a
    * batch operator: a small user-supplied `(url, state)` table is
    * broadcast-joined over the decisions.
    *
    * Policy (documented; the reference re-elects on toggle):
    *   - an override applies only when both the current and the override
    *     state are in {keep, delete} — `unique`/`ignored` rows are not
    *     result rows in the reference UI and cannot be toggled;
    *   - keep→delete: if the override leaves a duplicate cluster with no
    *     keep, the natural-order minimum among its NON-overridden delete
    *     members is re-elected keep (first in scan order wins, matching the
    *     original election). If every member was explicitly overridden to
    *     delete, the user's word stands — no keep remains;
    *   - delete→keep: the overridden row becomes keep and the existing keep
    *     coexists (toggling one row never touches another row, as in the
    *     reference UI).
    *
    * `sourcePriority` MUST match the `DedupConfig.sourcePriority` of the run
    * that produced the decisions (VERDICT r2 §wrong.2): re-election uses the
    * same ordering key as the original election, so under a priority run the
    * re-elected keep is the priority-ordered minimum, not the plain
    * natural-order one.
    */
  def applyOverrides(
      decisions: DataFrame,
      overrides: DataFrame,
      sourcePriority: Seq[String] = Nil): DataFrame = {
    val ov = overrides
      .select(col("url"), col("state").as("ov_state"))
      .where(col("ov_state").isin("keep", "delete"))
    val j = decisions.join(broadcast(ov), Seq("url"), "left")
      .withColumn(
        "eff",
        when(col("ov_state").isNotNull && col("state").isin("keep", "delete"),
          col("ov_state")).otherwise(col("state")))
    val nk =
      if (sourcePriority.isEmpty) graft.functions.gf.natural_sort_key(col("url"))
      else graft.functions.NaturalKey.sourcePriorityKey(col("url"), sourcePriority)
    // per-cluster summary via groupBy + broadcast-back join, NOT a window:
    // an unordered whole-partition window frame buffers every row of the
    // partition on one task — a mega-cluster (boilerplate repeated millions
    // of times) would pin task memory, while groupBy aggregates map-side
    val summary = j.groupBy(col("cluster")).agg(
      max(when(col("eff") === "keep", 1).otherwise(0)).as("has_keep"),
      max(when(col("eff").isin("keep", "delete"), 1).otherwise(0)).as("had_dup"),
      min(when(col("eff") === "delete" && col("ov_state").isNull,
        struct(nk.as("nk"), col("url").as("url")))).as("reelect"))
    // plain equi-join (AQE picks broadcast when the summary is small; at
    // web scale one-row-per-cluster is NOT broadcastable and shuffles on
    // the same key the aggregation just produced)
    j.join(summary, Seq("cluster"))
      .withColumn(
        "state",
        when(
          col("had_dup") === 1 && col("has_keep") === 0 &&
            col("url") === col("reelect.url"), "keep")
          .otherwise(col("eff")))
      .drop("ov_state", "eff", "has_keep", "had_dup", "reelect")
  }

  /** Per-state totals — the reference's stats panel
    * (`ViewModels/MainViewModel.cs:289-316`) as one aggregation instead of
    * O(n) rescans per state change. */
  def stats(decisions: DataFrame): DataFrame = {
    val total = decisions.agg(
      count(lit(1)).as("docs"),
      sum(col("len")).as("bytes"))
    decisions
      .groupBy(col("state"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("len")).as("bytes"))
      .crossJoin(total.select(
        col("docs").as("total_docs"), col("bytes").as("total_bytes")))
      .withColumn("doc_ratio", col("docs") / col("total_docs"))
      .withColumn("byte_ratio", col("bytes") / col("total_bytes"))
  }
}
