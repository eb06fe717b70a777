package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-host mirror detection: host pairs whose page content overlaps
  * heavily — the crawl pathology where one site republishes another
  * (mirrors, CDNs under vanity domains, template/content farms, scraper
  * sites). Host-grain dedup feedback reads this table to retire whole
  * hosts instead of fighting their pages one digest at a time, which is
  * how the big crawl curations (C4's host dedup, RefinedWeb's site-level
  * pruning) actually spend their dedup budget at 100 TB.
  *
  * Semantics: a page contributes its exact content digest once per host
  * (url multiplicity within a host is collapsed first); a digest shared
  * by more hosts than `maxHostsPerDigest` is dropped from PAIR COUNTING
  * (a boilerplate 404 page shared by half the web says nothing about
  * mirroring and would explode quadratically) but still counts toward
  * each host's size. `overlap_permille = ⌊1000·n_shared / min(n_a,n_b)⌋`
  * is a containment ratio — a small mirror of a big site still reads
  * ≈1000 — in pure integer arithmetic so the oracle replays it exactly.
  *
  * Scale shape: one (digest, host)-distinct aggregation; a digest-grain
  * fan-out count that gates the self-join (the ONLY quadratic step, and
  * it is quadratic per digest in |hosts-sharing-digest| ≤ cap, with the
  * drop documented by the cap); the pair groupBy is host-pair grain —
  * O(|mirrored site pairs|), tiny; host sizes broadcast back onto it.
  * Page text never moves: only 32-byte digests and host strings shuffle.
  *
  * Reference anchor: the reference's cross-folder duplicate view is this
  * exact question at folder grain — which SOURCES hold the same bytes
  * (`ViewModels/MainViewModel.cs:586-596`, the per-folder blocking
  * indexes feeding the shared-group report).
  */
object Mirrors {

  /** @param pages (hostCol, textCol) page rows, any multiplicity
    * @return (host_a, host_b, n_shared, n_a, n_b, overlap_permille) for
    *         host pairs sharing ≥ minShared countable digests,
    *         host_a < host_b, deterministic */
  def hostOverlap(
      pages: DataFrame,
      hostCol: String = "host",
      textCol: String = "text",
      maxHostsPerDigest: Int = 32,
      minShared: Long = 1L): DataFrame = {
    require(maxHostsPerDigest >= 2,
      s"maxHostsPerDigest must allow pairs: $maxHostsPerDigest")
    require(minShared >= 1L, s"minShared must be positive: $minShared")
    // null text/host rows carry no mirror evidence (and a null digest
    // can never join) — drop them up front so host sizes count only
    // comparable pages
    // three consumers (sizes, fan gate, kept pairs): pin the narrow
    // (digest, host) frame so the page scan + sha2 + distinct runs once
    val dh = pages
      .where(col(textCol).isNotNull && col(hostCol).isNotNull)
      .select(sha2(col(textCol), 256).as("__h"), col(hostCol).as("__host"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = dh.groupBy(col("__host"))
      .agg(count(lit(1)).as("__n"))
    val fan = dh.groupBy(col("__h")).agg(count(lit(1)).as("__nh"))
    val kept = dh.join(
      fan.where(col("__nh") <= maxHostsPerDigest).select(col("__h")), "__h")
    val a = kept.select(col("__h"), col("__host").as("host_a"))
    val b = kept.select(col("__h"), col("__host").as("host_b"))
    a.join(b, "__h")
      .where(col("host_a") < col("host_b"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .join(sizes.select(col("__host").as("host_a"), col("__n").as("n_a")),
        "host_a")
      .join(sizes.select(col("__host").as("host_b"), col("__n").as("n_b")),
        "host_b")
      .withColumn("overlap_permille",
        expr("(n_shared * 1000) div least(n_a, n_b)"))
      .select(col("host_a"), col("host_b"), col("n_shared"),
        col("n_a"), col("n_b"), col("overlap_permille"))
  }

  /** The action half: per-host retirement verdicts from the overlap
    * pairs — the reference's keep/delete election
    * (`ViewModels/MainViewModel.cs:1226-1240`) lifted to HOST grain. A
    * host retires iff it LOSES any pair at `minPermille`+ containment:
    * the loser is the side with fewer distinct documents (the mirror is
    * almost always smaller than the origin); an exact size tie retires
    * the lexicographically larger host — deterministic, like every other
    * election in the engine. One-shot greedy rule, documented: a chain
    * A⊃B⊃C retires both B and C against their respective winners (no
    * transitive re-election pass — at crawl scale mirror chains are
    * rare and a second pass over the host-grain table is cheap if one
    * shows up).
    *
    * Output: one row per host seen in `pages` — (host, n_docs, retired).
    * Scale shape: [[hostOverlap]]'s plan + one host-grain distinct-digest
    * count + a broadcast-sized anti-join on the loser set (|losers| ≤
    * |mirrored pairs|). */
  def retireMirrors(
      pages: DataFrame,
      hostCol: String = "host",
      textCol: String = "text",
      maxHostsPerDigest: Int = 32,
      minShared: Long = 2L,
      minPermille: Long = 800L): DataFrame = {
    require(minPermille >= 1L && minPermille <= 1000L,
      s"minPermille must be in [1, 1000]: $minPermille")
    val losers = hostOverlap(pages, hostCol, textCol,
        maxHostsPerDigest, minShared)
      .where(col("overlap_permille") >= minPermille)
      .select(
        when(col("n_b") < col("n_a"), col("host_b"))
          .when(col("n_a") < col("n_b"), col("host_a"))
          .otherwise(greatest(col("host_a"), col("host_b"))).as("__loser"))
      .distinct()
    pages
      .where(col(textCol).isNotNull && col(hostCol).isNotNull)
      .select(sha2(col(textCol), 256).as("__h"), col(hostCol).as("host"))
      .distinct()
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"))
      .join(losers.withColumn("__r", lit(true)),
        col("host") === col("__loser"), "left")
      .select(col("host"), col("n_docs"),
        coalesce(col("__r"), lit(false)).as("retired"))
  }
}
