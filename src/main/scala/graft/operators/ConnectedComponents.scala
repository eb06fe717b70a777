package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative connected components over the duplicate-pair edge list —
  * the distributed analog of the reference's greedy sequential cluster
  * resolution (`ViewModels/MainViewModel.cs:694-781, 1226-1240`): where the
  * reference scans rows in natural order and the first unlabeled row wins
  * its cluster, we propagate the minimum natural-sort label to a fixpoint,
  * which elects exactly the same representative (the natural-order minimum)
  * without any order-dependent sequential state.
  *
  * Algorithm: min-label propagation + pointer jumping over undirected edges.
  *   labels ← (url, own natural key)
  *   repeat: label(u) ← min(label(u), min over neighbors v of label(v));
  *           label(u) ← min(label(u), label(label(u).url))   // compression
  * Convergence is O(log diameter) rounds. Dedup cluster topology is mostly
  * star/clique-shaped (exact stars, LSH clique edges); the compression step
  * keeps pathological substring-transitivity chains cheap too. Determinism
  * comes from the label *values* (natural keys), never from partition order.
  *
  * Scale notes: each iteration is two shuffles (edges ⋈ labels on src;
  * re-agg by dst). Lineage is truncated every iteration with
  * `localCheckpoint` so plans don't grow; the converged check is a single
  * count of changed labels. For graphs with huge diameters the
  * large-star/small-star algorithm (or BTS, ICDE 2024 — see PAPERS.md)
  * halves iteration counts; dedup graphs don't need it and it would double
  * the shuffle volume per round.
  */
object ConnectedComponents {

  /** @param nodes (url, nk) — one row per node (nk = natural-sort key)
    * @param edges (src, dst) — undirected pairs, endpoints ⊆ nodes
    * @return (url, cluster) where cluster = min nk in the component,
    *         paired with the winning member's url as `cluster_url`. */
  def run(
      spark: SparkSession,
      nodes: DataFrame,
      edges: DataFrame,
      maxIter: Int = 25): DataFrame = {

    // symmetric closure once; reused by every iteration
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // label = struct(nk, url): min is by nk with url as deterministic tiebreak
    var labels = nodes
      .select(col("url"), struct(col("nk"), col("url")).as("lbl"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // 1. propagate labels one hop over the edge list
      val msgs = und
        .join(labels.withColumnRenamed("url", "src"), "src")
        .select(col("dst").as("url"), col("lbl"))
      val prop = labels.unionByName(msgs)
        .groupBy(col("url"))
        .agg(min(col("lbl")).as("lbl"))
      // 2. pointer jumping: follow the label's own label (path compression),
      //    turning O(diameter) convergence into O(log diameter) — long
      //    chains (substring-dup transitivity) stay cheap at scale
      val next = prop.alias("a")
        .join(
          prop.select(col("url").as("curl"), col("lbl").as("plbl")).alias("p"),
          col("a.lbl.url") === col("curl"), "left")
        .select(
          col("a.url").as("url"),
          when(col("plbl").isNotNull, least(col("plbl"), col("a.lbl")))
            .otherwise(col("a.lbl")).as("lbl"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("o"), "url")
        .where(col("n.lbl") =!= col("o.lbl"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    und.unpersist(blocking = false)
    labels.select(
      col("url"),
      col("lbl.nk").as("cluster_key"),
      col("lbl.url").as("cluster_url"))
  }
}
