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
    * never clustered). minLen rows are ignored regardless of clustering. */
  def decide(docs: DataFrame, labels: DataFrame, minLen: Int): DataFrame = {
    val withLbl = docs.join(labels, Seq("url"), "left")
      .withColumn("cluster", coalesce(col("cluster_url"), col("url")))
    // groupBy + join rather than a window: partial aggregation keeps a
    // mega-cluster (boilerplate repeated millions of times) off a single
    // task, and AQE's skew-join handles the join side.
    val sizes = withLbl.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
    val sized = withLbl.join(sizes, "cluster")
    sized.withColumn(
      "state",
      when(col("len") < minLen, "ignored")
        .when(col("cluster_size") === 1, "unique")
        .when(col("url") === col("cluster"), "keep")
        .otherwise("delete"))
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
