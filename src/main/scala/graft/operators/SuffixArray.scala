package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.gf

/** Distributed suffix array over the document corpus — the literature-exact
  * long-common-substring pass (Manber & Myers, SIAM J. Comput. 1990 prefix
  * doubling; Lee et al., ACL 2022 build the same structure single-machine
  * for span dedup; Flick & Aluru, SC 2015 for distributed construction).
  *
  * [[SubstringDup]] is the engine's economical default: winnowed
  * fingerprint anchoring never materializes the O(total-text) suffix
  * structure and reuses the bounded-bucket LSH machinery. This operator is
  * the exact-structure alternative the reference's byte-by-byte content
  * comparison (`ViewModels/MainViewModel.cs:1093-1146`) scales to when
  * probabilistic anchoring is off the table: it computes global
  * lexicographic ranks for every (doc, pos) suffix, yielding (a) the full
  * suffix array with deterministic ties and (b) exact duplicated-gram
  * detection with zero hashing anywhere in the decision path. The two
  * operators answer the same oracle — two independent algorithms, one
  * truth (`q_dup_spans` / `q_sa_dup_spans`).
  *
  * Prefix doubling: rank₁(i) = the code unit at i; each round keys every
  * position by (rank_k(i), rank_k(i+k)) and re-ranks, doubling the resolved
  * prefix depth. Positions past a document's end take sentinel rank -1
  * (< every code unit), so a suffix that is a proper prefix of another
  * sorts first — the order SQL's binary-collation ORDER BY substr produces.
  * Suffixes never cross document boundaries (there is no concatenated
  * global string, hence no sentinel-character reservation).
  *
  * Scale shape: each round is one co-keyed self-join (did, pos), one
  * distinct, and one range-sort over n = total corpus characters rows of
  * four longs — O(n log depth) shuffle volume, skew-free by construction
  * (rank pairs approach uniqueness within a few rounds on natural text).
  * Rank assignment is sort → zipWithIndex → join-back: the engine's second
  * deliberate RDD touch (after the CC loop) — a contiguous global index is
  * exactly what zipWithIndex's two-job partition-offset protocol computes,
  * and no Catalyst operator produces one without a single-partition window.
  * The structure is inherently storage-heavy (4 longs per corpus char);
  * at 100 TB one runs it per shard/date-partition — duplicated-gram groups
  * within a shard — or pays ~32n bytes of shuffle per round corpus-wide.
  * That cost is intrinsic to suffix arrays, which is why winnowing is the
  * default and this pass is the audit-grade tier.
  */
object SuffixArray {

  /** Internal: doc ids (did = xxhash64(url); same convention and collision
    * odds note as SubstringDup.candidatePairs) and the depth-1 rank frame
    * (did, pos, len, rank) — pos 1-based, rank = code unit at pos. */
  private def initial(docs: DataFrame): (DataFrame, DataFrame) = {
    val did = xxhash64(col("url"), lit(0x5AF1C3L)).as("did")
    val ids = docs.select(did, col("url"))
    val r1 = docs
      .select(
        did, length(col("text")).as("len"),
        posexplode(gf.char_codes(col("text"))).as(Seq("p0", "code")))
      .select(
        col("did"), (col("p0") + 1).as("pos"), col("len"),
        col("code").cast("long").as("rank"))
    (ids, r1)
  }

  /** The rank frame handle: the (did, pos, len, rank) DataFrame plus a
    * release hook freeing the persisted RDD state behind it — DataFrame
    * `unpersist` cannot reach an RDD-level cache, so callers invoke
    * `release()` after their terminal action. */
  private final case class Ranks(df: DataFrame, release: () => Unit)

  /** Ranks doubled until depth ≥ `targetDepth` (clamped to the corpus max
    * suffix length — beyond it nothing changes) or until every rank is
    * unique (no two suffixes share a prefix at the achieved depth, so no
    * deeper round can split or merge any group).
    *
    * The loop runs at RDD level — the engine's second deliberate RDD use,
    * for the same reason the CC loop is one: each round references the
    * previous frame TWICE (itself and its k-shifted self), so a DataFrame
    * loop's logical plan doubles per round — 2^rounds plan nodes that
    * Catalyst must analyze before cache substitution can truncate anything
    * (measured: 10 rounds of the DataFrame formulation spent 12 minutes in
    * the optimizer and exhausted a 19 GB driver heap on a 12 k-char
    * corpus). RDD lineage is linear in rounds and each round's persist
    * stops recomputation. The position state is hash-partitioned ONCE;
    * the k-shifted message side shuffles into it per round (the CC loop's
    * co-partitioning discipline), and rank assignment is sortBy +
    * zipWithIndex over the (much smaller) distinct key-pair set. */
  private def rankFrame(spark: SparkSession, docs: DataFrame, targetDepth: Int): Ranks = {
    val (_, r1) = initial(docs)
    val part = new org.apache.spark.HashPartitioner(
      spark.sessionState.conf.numShufflePartitions)
    // (did, pos) → (len, rank)
    var r = r1.rdd
      .map(row => ((row.getLong(0), row.getInt(1)), (row.getInt(2), row.getLong(3))))
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val total = r.count()
    val maxLen = docs.agg(coalesce(max(length(col("text"))), lit(0)))
      .first().getInt(0)
    var k = 1
    var done = k >= math.min(targetDepth, math.max(maxLen, 1))
    while (!done) {
      val kk = k
      val shifted = r.map { case ((did, pos), (_, rank)) => ((did, pos - kk), rank) }
      val pairs = r.leftOuterJoin(shifted, part)
      val distinctKeys = pairs
        .map { case (_, ((_, ra), rb)) => (ra, rb.getOrElse(-1L)) }
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ranked = distinctKeys.sortBy(identity).zipWithIndex()
      val next = pairs
        .map { case ((did, pos), ((len, ra), rb)) =>
          ((ra, rb.getOrElse(-1L)), (did, pos, len))
        }
        .join(ranked)
        .map { case (_, ((did, pos, len), newRank)) => ((did, pos), (len, newRank)) }
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      val distinctRanks = distinctKeys.count()
      distinctKeys.unpersist(blocking = false)
      r.unpersist(blocking = false)
      r = next
      k *= 2
      done = k >= math.min(targetDepth, maxLen) || distinctRanks == total
    }
    val state = r
    val df = spark
      .createDataFrame(
        state.map { case ((did, pos), (len, rank)) => (did, pos, len, rank) })
      .toDF("did", "pos", "len", "rank")
    Ranks(df, () => { state.unpersist(blocking = false); () })
  }

  /** The full suffix array: (url, pos, sa_rank) with sa_rank the 1-based
    * global lexicographic position of the suffix text[pos..], ties between
    * identical cross-document suffixes broken by (url, pos) — byte-for-byte
    * `row_number() OVER (ORDER BY substr(text, pos), url, pos)`. Ranks are
    * doubled to full resolution (identical cross-doc suffixes never
    * separate, hence the explicit tie-break), then one final sorted
    * zipWithIndex assigns row numbers. The result is persisted (its
    * lineage crosses two RDD sorts) and the rank frame released. */
  def suffixArray(spark: SparkSession, docs: DataFrame): DataFrame = {
    val (ids, _) = initial(docs)
    val ranks = rankFrame(spark, docs, targetDepth = Int.MaxValue)
    val out = spark
      .createDataFrame(
        ranks.df.join(ids, "did")
          .select(col("rank"), col("url"), col("pos"))
          .orderBy(col("rank"), col("url"), col("pos"))
          .rdd.zipWithIndex()
          .map { case (row, i) => (row.getString(1), row.getInt(2).toLong, i + 1L) })
      .toDF("url", "pos", "sa_rank")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranks.release()
    out
  }

  /** Exact duplicated-span detection through the rank structure: merged
    * per-doc [s, e) spans of every position whose L-gram occurs verbatim at
    * another url — the same truth [[SubstringDup.dupSpans]] answers through
    * winnowing + kernel verification and the exhaustive gram-table oracle
    * recomputes in SQL.
    *
    * Uses the sparse-table windowing identity: with k the largest power of
    * two ≤ L (so 2k ≥ L), positions i, j carry identical L-grams iff
    * rank_k(i) = rank_k(j) AND rank_k(i+L-k) = rank_k(j+L-k) — the two
    * depth-k windows overlap-cover [i, i+L). Only ⌈log₂ L⌉ doubling rounds
    * run, not full resolution. Grouping by that key pair and keeping keys
    * spanning ≥ 2 distinct docs is a partial-aggregable count-distinct plus
    * a semi-join — a viral passage makes a large GROUP, never a large
    * buffered row, so the skew bomb the LSH bucket caps guard against does
    * not arise here. */
  def dupSpans(spark: SparkSession, docs: DataFrame, minSubstr: Int): DataFrame = {
    val (ids, keyed, ranks) = keyedPositions(spark, docs, minSubstr)
    val dupKeys = keyed
      .groupBy(col("ra"), col("rb"))
      .agg(count_distinct(col("did")).as("nd"))
      .where(col("nd") >= 2)
      .select("ra", "rb")
    val spanRows = keyed
      .join(dupKeys, Seq("ra", "rb"), "left_semi")
      .join(ids, "did")
      .select(
        col("url"),
        col("pos").cast("long").as("s"),
        (col("pos") + minSubstr).cast("long").as("e"))
    finish(spanRows, ranks)
  }

  /** Keep-one-copy variant through the rank structure: a position's L-gram
    * is cut iff the SAME gram occurs in a (nk, url)-STRICTLY-EARLIER
    * document, so every duplicated passage survives exactly once, in its
    * order-minimal doc — the semantics of [[SubstringDup.dupSpansKeepOne]]
    * (which orients per candidate pair) answered corpus-globally: a
    * position's doc is later than SOME same-gram doc iff it is not the
    * group's (nk, url)-minimal doc. `docs` must carry (url, nk, text). */
  def dupSpansKeepOne(spark: SparkSession, docs: DataFrame, minSubstr: Int): DataFrame = {
    val (ids, keyed, ranks) = keyedPositions(spark, docs, minSubstr)
    val mins = keyed
      .join(
        docs.select(
          xxhash64(col("url"), lit(0x5AF1C3L)).as("did"), col("url"), col("nk")),
        "did")
      .groupBy(col("ra"), col("rb"))
      .agg(
        min(struct(col("nk"), col("url"), col("did"))).as("mn"),
        count_distinct(col("did")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("ra"), col("rb"), col("mn").getField("did").as("min_did"))
    val spanRows = keyed
      .join(mins, Seq("ra", "rb"))
      .where(col("did") =!= col("min_did"))
      .join(ids, "did")
      .select(
        col("url"),
        col("pos").cast("long").as("s"),
        (col("pos") + minSubstr).cast("long").as("e"))
    finish(spanRows, ranks)
  }

  /** Shared tail: merge spans, persist across the caller's terminal action,
    * release the rank frame. */
  private def finish(spanRows: DataFrame, ranks: Ranks): DataFrame = {
    val out = SubstringDup.mergeSpans(spanRows).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranks.release()
    out
  }

  /** L-gram equality keys for every gram-hosting position: (did, pos, ra,
    * rb) where (ra, rb) equality ⟺ exact L-gram equality (the sparse-table
    * windowing identity — see [[dupSpans]]). Returns (ids, keyed, rank
    * handle); the caller releases the handle after its terminal action. */
  private def keyedPositions(
      spark: SparkSession, docs: DataFrame, minSubstr: Int): (DataFrame, DataFrame, Ranks) = {
    require(minSubstr >= 1, s"minSubstr must be >= 1, got $minSubstr")
    val L = minSubstr
    val k = Integer.highestOneBit(L)
    val (ids, _) = initial(docs)
    val ranks = rankFrame(spark, docs, targetDepth = k)
    val r = ranks.df
    val a = r.select(col("did"), col("pos"), col("len"), col("rank").as("ra"))
    val keyed = (
      if (L == k) a.withColumn("rb", col("ra"))
      else
        a.join(
          r.select(col("did"), (col("pos") - (L - k)).as("pos"), col("rank").as("rb")),
          Seq("did", "pos"))
    ).where(col("pos") <= col("len") - L + 1)
    (ids, keyed, ranks)
  }
}
