package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family: Bayardo et al. 2007, Xiao et al. 2008) — finds every
  * pair of items whose token-set Jaccard ≥ τ, with NO probabilistic miss.
  * This is the deterministic complement to the MinHash/LSH tier
  * ([[Lsh]]): LSH trades recall for throughput; prefix filtering keeps
  * recall 1.0 and prunes with algebra instead of chance, which is what a
  * paragraph-granularity fuzzy dedup needs when the contract is "every
  * τ-duplicate found".
  *
  * The prefix-filter lemma: order every item's tokens by ONE global total
  * order; if J(A,B) ≥ τ, then A and B share a token inside their first
  * (|s| − ⌈τ·|s|⌉ + 1) tokens. So candidate generation explodes only that
  * prefix, joins on the token, and exact verification runs only on
  * candidates.
  *
  * Scale notes:
  *   - the global order is DOCUMENT-FREQUENCY ASCENDING (ties by token),
  *     the AllPairs trick: prefixes then hold each item's RAREST tokens,
  *     so the candidate join's key distribution is the inverse of the
  *     corpus skew — "the" never enters a prefix at τ-interesting sizes;
  *   - prefix size is ≤ (1−τ)·|s| + 1 tokens per item (τ=0.8 → 1/5th of
  *     the explode an all-token join would pay);
  *   - the length filter least ≥ ⌈τ·greatest⌉ drops cross-size pairs in
  *     the join condition, before the exchange materialises them;
  *   - verification joins token arrays back only for surviving
  *     candidates; everything else moves (id, len, token) rows.
  *   - PPJoin's positional filter rides in the join condition too: each
  *     prefix token carries its rank, and a pair whose best positional
  *     overlap bound cannot reach the τ-implied minimum overlap drops
  *     before the distinct and the verification join (see
  *     [[positionalBound]] for the exactness argument);
  *   - remaining production seam: PPJoin+'s suffix bound (a second
  *     binary-search refinement per candidate) — cheaper verification,
  *     same exchange shape.
  *
  * Reference anchor: the reference's candidate stage is its block
  * self-join (`ViewModels/MainViewModel.cs:1085-1130`); prefix tokens
  * play the block key, with an exactness guarantee the hash block lacks.
  */
object SetSimJoin {

  /** Portable tokenisation shared with the oracle: lowercase, explicit
    * whitespace class, distinct. */
  def tokenSet(text: Column): Column =
    array_distinct(filter(split(lower(text), "[ \\t\\n\\f\\r]+"), w => w =!= ""))

  /** Raw (multiset) tokenisation — same split, duplicates KEPT; feeds
    * [[multisetItems]]. */
  def tokenBag(text: Column): Column =
    filter(split(lower(text), "[ \\t\\n\\f\\r]+"), w => w =!= "")

  /** Rewrites `items(id, toks)` token BAGS into occurrence-indexed token
    * SETS (`word ++ \u0000 ++ occurrenceIndex`), turning every set
    * operator downstream into its MULTISET counterpart: for occurrence
    * sets OA, OB of bags A, B,
    *   |OA ∩ OB| = Σ_w min(cntA(w), cntB(w))  and  |OA ∪ OB| = Σ_w max,
    * so set-Jaccard over occurrence tokens IS the weighted (tf) Jaccard —
    * [[similarPairs]] composed with this helper is an EXACT weighted
    * set-similarity join, where plain token sets are blind to repetition
    * (a doc and its tokens-repeated-twice twin have set-J 1.0 but
    * weighted J 0.5 — exactly the near-dup boilerplate signal repetition
    * carries).
    *
    * Scale shape: posexplode → occurrence rank over (id, word) — a
    * window whose partitions are single-word-within-one-doc sized, never
    * hot — → re-collect per id. Linear in corpus tokens, two narrow
    * exchanges, text never shuffles (only (id, word) rows). */
  def multisetItems(
      items: DataFrame,
      id: String = "item_id",
      toks: String = "toks"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pid"), col("w")).orderBy(col("p"))
    items
      .select(col(id).as("pid"), posexplode(col(toks)).as(Seq("p", "w")))
      .withColumn("occ", row_number().over(w) - 1)
      .groupBy(col("pid"))
      .agg(collect_list(
        concat(col("w"), lit("\u0000"), col("occ").cast("string"))).as(toks))
      .withColumnRenamed("pid", id)
  }

  // ⌈τ·n⌉ in exact integer arithmetic (τ as parts-per-million): a bare
  // ceil(n * τ) is an IEEE trap — 5 * 0.8 = 4.000000000000000222, whose
  // ceil is 5, silently shrinking the prefix and BREAKING the exactness
  // guarantee. Numerators stay < 2^53 so the double division is safe
  // to floor.
  private def ceilTauFn(tau: Double): Column => Column = {
    val tauNum = math.round(tau * 1000000L)
    n => floor((n.cast("long") * tauNum + (1000000L - 1)) / 1000000.0).cast("int")
  }

  // exact integer ⌈a/b⌉ for a ≥ 0, b > 0: a − pmod(a,b) is an exact
  // multiple of b, so its double division is exact (quotient ≤ 2^53) —
  // no rounding-boundary risk on either side
  private def ceilDiv(a: Column, b: Column): Column = {
    val r = pmod(a, b)
    ((a - r) / b).cast("long") + when(r > lit(0L), lit(1L)).otherwise(lit(0L))
  }

  /** PPJoin's minimum-overlap threshold for Jaccard τ over item sizes
    * (la, lb): J(A,B) ≥ τ ⇔ |A∩B| ≥ τ/(1+τ)·(|A|+|B|), so
    * α = ⌈τ·(la+lb) / (1+τ)⌉ in the same ppm arithmetic. */
  private def alphaFn(tau: Double): (Column, Column) => Column = {
    val tauNum = math.round(tau * 1000000L)
    (la, lb) =>
      ceilDiv((la.cast("long") + lb.cast("long")) * tauNum, lit(1000000L + tauNum))
  }

  /** PPJoin positional filter (Xiao et al. 2008 §3.2): a join row
    * matches token w at 0-based rank pa of A's ordered tokens and pb of
    * B's. For the pair's FIRST shared token no earlier token is shared,
    * so total overlap ≤ 1 + min(la−pa−1, lb−pb−1); a pair whose every
    * shared-prefix row fails `that bound ≥ minOverlap` cannot reach the
    * threshold and drops BEFORE the distinct + verification join. Rows
    * where the matched token is not the first shared one carry an
    * invalid (too-high) bound — harmless: they can only KEEP the pair,
    * and the first-shared row is always present for a true pair, so
    * exactness is untouched while typical candidate volume drops
    * substantially at high τ. */
  private def positionalBound(
      aLen: Column, aPos: Column, bLen: Column, bPos: Column): Column =
    lit(1) + least(aLen - aPos - lit(1), bLen - bPos - lit(1))

  /** (w, df) document frequencies over a (pid, ts) items frame. */
  private def freqOf(base: DataFrame): DataFrame =
    base.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("df"))

  /** (pid, ots, len) with each item's distinct tokens in the canonical
    * rare-first order: (document frequency, token) ascending — the
    * AllPairs trick that keeps corpus stopwords out of every prefix.
    * `freq` supplies the total order (LEFT join: tokens absent from it
    * take df 0 — rarest); the self-join paths pass `freqOf(base)` itself,
    * the cross-table path passes the corpus-side table so both sides rank
    * under ONE order. This is the exactness-critical construction — keep
    * it single-sourced. */
  private def rareFirst(base: DataFrame, freq: DataFrame): DataFrame = {
    val tok = base.select(col("pid"), explode(col("ts")).as("w"))
    tok
      .join(freq, Seq("w"), "left")
      .select(col("pid"), col("w"), coalesce(col("df"), lit(0L)).as("df"))
      .groupBy(col("pid"))
      .agg(array_sort(collect_list(struct(col("df"), col("w")))).as("sw"))
      .select(
        col("pid"),
        transform(col("sw"), s => s.getField("w")).as("ots"),
        size(col("sw")).as("len"))
  }

  /** Prefix tokens with their 0-based rank in the item's ordered token
    * list: (pid, len, p, w). The rank feeds the positional filter. */
  private def prefixed(ordered: DataFrame, ceilTau: Column => Column): DataFrame =
    ordered.select(
      col("pid"), col("len"),
      posexplode(slice(col("ots"), lit(1),
        greatest(lit(1), col("len") - ceilTau(col("len")) + 1))).as(Seq("p", "w")))

  /** Deduped self-join candidate pairs before verification — exposed
    * package-side so the spec and the PLAN 15 audit can measure the
    * positional filter's tightening against the same inputs with it
    * off. */
  private[graft] def selfCandidates(
      items: DataFrame,
      tau: Double,
      id: String = "item_id",
      toks: String = "toks",
      positional: Boolean = true): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau out of (0,1]: $tau")
    val ceilTau = ceilTauFn(tau)
    val alpha = alphaFn(tau)
    val base = items
      .select(col(id).as("pid"), array_distinct(col(toks)).as("ts"))
      .where(size(col("ts")) > 0)
    val pref = prefixed(rareFirst(base, freqOf(base)), ceilTau)
    val lengthOk =
      least(col("a.len"), col("b.len")) >=
        ceilTau(greatest(col("a.len"), col("b.len")))
    val posOk =
      positionalBound(col("a.len"), col("a.p"), col("b.len"), col("b.p")) >=
        alpha(col("a.len"), col("b.len"))
    pref.as("a")
      .join(pref.as("b"),
        col("a.w") === col("b.w") && col("a.pid") < col("b.pid") &&
          lengthOk && (if (positional) posOk else lit(true)))
      .select(col("a.pid").as("id1"), col("b.pid").as("id2"))
      .distinct()
  }

  /** All pairs (id1 < id2, jac) with round(Jaccard, 6) ≥ τ over
    * `items(id, toks)`. Exact — the DuckDB oracle recomputes the same
    * pair set from an exhaustive token join. Candidates are pruned by
    * the length filter AND the PPJoin positional filter, both inside
    * the join condition (before the exchange materialises them). */
  def similarPairs(
      items: DataFrame,
      tau: Double,
      id: String = "item_id",
      toks: String = "toks"): DataFrame = {
    val base = items
      .select(col(id).as("pid"), array_distinct(col(toks)).as("ts"))
      .where(size(col("ts")) > 0)
    val cand = selfCandidates(items, tau, id, toks)
    cand
      .join(base.select(col("pid").as("id1"), col("ts").as("ta")), Seq("id1"))
      .join(base.select(col("pid").as("id2"), col("ts").as("tb")), Seq("id2"))
      .withColumn("__o", size(array_intersect(col("ta"), col("tb"))))
      .select(
        col("id1"), col("id2"),
        round(col("__o").cast("double") /
          (size(col("ta")) + size(col("tb")) - col("__o")), 6).as("jac"))
      .where(col("jac") >= tau)
  }

  /** Directional CONTAINMENT join: all ordered pairs (id_sub, id_sup,
    * cont) with round(|sub ∩ sup| / |sub|, 6) ≥ τ — "sub is mostly inside
    * sup", the quote / partial-copy / subsumed-page detector that Jaccard
    * misses by construction (a 10-token quote inside a 500-token page has
    * J ≈ 0.02 but containment 1.0). Exact, no probabilistic miss.
    *
    * Prefix lemma, containment form: if C(A,B) ≥ τ then fewer than
    * |A| − ⌈τ·|A|⌉ + 1 of A's tokens miss B, so A's first
    * (|A| − ⌈τ·|A|⌉ + 1) tokens (ANY fixed order) must hit B. The join is
    * therefore asymmetric: the contained side explodes only its prefix
    * (rare-first, so stopwords stay out), the containing side indexes ALL
    * its tokens; `sup.len ≥ ⌈τ·sub.len⌉` (from |A∩B| ≤ |B|) prunes in the
    * join condition. The full-side explode is the price of directional
    * exactness — linear in corpus tokens, same as the df count already
    * taken, never quadratic. */
  def containmentPairs(
      items: DataFrame,
      tau: Double,
      id: String = "item_id",
      toks: String = "toks"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau out of (0,1]: $tau")
    val ceilTau = ceilTauFn(tau)
    val base = items
      .select(col(id).as("pid"), array_distinct(col(toks)).as("ts"))
      .where(size(col("ts")) > 0)
    val ordered = rareFirst(base, freqOf(base))
    val aPref = prefixed(ordered, ceilTau)
    val bAll = ordered.select(
      col("pid"), col("len"), posexplode(col("ots")).as(Seq("p", "w")))
    // containment's minimum overlap is ⌈τ·|A|⌉ outright; the positional
    // bound argument is unchanged (both sides rank under ONE order, and
    // a true pair's first shared token carries a valid bound)
    val cand = aPref.as("a")
      .join(bAll.as("b"),
        col("a.w") === col("b.w") && col("a.pid") =!= col("b.pid") &&
          col("b.len") >= ceilTau(col("a.len")) &&
          positionalBound(col("a.len"), col("a.p"), col("b.len"), col("b.p")) >=
            ceilTau(col("a.len")))
      .select(col("a.pid").as("id_sub"), col("b.pid").as("id_sup"))
      .distinct()
    cand
      .join(base.select(col("pid").as("id_sub"), col("ts").as("ta")), Seq("id_sub"))
      .join(base.select(col("pid").as("id_sup"), col("ts").as("tb")), Seq("id_sup"))
      .select(
        col("id_sub"), col("id_sup"),
        round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(col("ta")), 6).as("cont"))
      .where(col("cont") >= tau)
  }

  /** Cross-table (R-S) exact set-similarity join: every pair
    * (probe item, corpus item) with token-set Jaccard ≥ τ — the FUZZY
    * analog of [[IncrementalDedup.newDocs]]'s exact-digest anti-join, for
    * the ingest question "is this new crawl batch a near-duplicate of
    * anything already in the corpus?" with recall 1.0 (LSH answers it
    * probabilistically; this answers it exactly).
    *
    * The prefix lemma survives the R-S form unchanged provided BOTH sides
    * rank their tokens under ONE shared total order: the smallest shared
    * token of any τ-similar pair must sit inside both prefixes. The order
    * here is (corpus document frequency, token) ascending — a pure
    * function of the CORPUS alone, so at production scale the per-epoch
    * artifacts are persistable exactly like [[IncrementalDedup.saveShaTable]]:
    *   - the corpus df table and the corpus prefix index (pid, len, w),
    *     bucketed by `w`, are built ONCE per corpus epoch and read in
    *     place by every batch — only the (small) batch side tokenises,
    *     ranks and explodes per ingest;
    *   - probe tokens unseen in the corpus take df 0 (rarest — they head
    *     the probe prefix); any fixed convention keeps the order total,
    *     and unseen tokens can never be shared, so exactness holds;
    *   - the candidate join keys on the rarest tokens (corpus skew
    *     inverted, as in [[similarPairs]]), the in-condition length filter
    *     prunes cross-size pairs before the exchange, and a small batch's
    *     prefix side broadcasts under AQE;
    *   - verification re-joins token arrays only for surviving candidates.
    *
    * Returns (probe_id, corpus_id, jac) with round(jac, 6) ≥ τ. */
  def similarPairsAcross(
      probe: DataFrame,
      corpus: DataFrame,
      tau: Double,
      id: String = "item_id",
      toks: String = "toks"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau out of (0,1]: $tau")
    val ceilTau = ceilTauFn(tau)
    def baseOf(df: DataFrame) = df
      .select(col(id).as("pid"), array_distinct(col(toks)).as("ts"))
      .where(size(col("ts")) > 0)
    val pBase = baseOf(probe)
    val cBase = baseOf(corpus)
    // the shared total order: corpus df ascending, token tie-break
    val freq = freqOf(cBase)
    val alpha = alphaFn(tau)
    def prefOf(b: DataFrame) = prefixed(rareFirst(b, freq), ceilTau)
    val cand = prefOf(pBase).as("a")
      .join(prefOf(cBase).as("b"),
        col("a.w") === col("b.w") &&
          least(col("a.len"), col("b.len")) >=
            ceilTau(greatest(col("a.len"), col("b.len"))) &&
          positionalBound(col("a.len"), col("a.p"), col("b.len"), col("b.p")) >=
            alpha(col("a.len"), col("b.len")))
      .select(col("a.pid").as("probe_id"), col("b.pid").as("corpus_id"))
      .distinct()
    cand
      .join(pBase.select(col("pid").as("probe_id"), col("ts").as("ta")),
        Seq("probe_id"))
      .join(cBase.select(col("pid").as("corpus_id"), col("ts").as("tb")),
        Seq("corpus_id"))
      .withColumn("__o", size(array_intersect(col("ta"), col("tb"))))
      .select(
        col("probe_id"), col("corpus_id"),
        round(col("__o").cast("double") /
          (size(col("ta")) + size(col("tb")) - col("__o")), 6).as("jac"))
      .where(col("jac") >= tau)
  }

  /** Novelty verdicts over an [[similarPairsAcross]] pair set: probe item
    * KEPT iff NO τ-similar corpus item exists — the fuzzy ingest gate
    * (exact-digest novelty is [[IncrementalDedup.newDocs]]). Anti-
    * membership only, so directly SQL-mirrorable. */
  def keepNovel(
      probe: DataFrame,
      pairs: DataFrame,
      id: String = "item_id"): DataFrame = {
    val hit = pairs.select(col("probe_id").as(id)).distinct()
      .withColumn("__hit", lit(true))
    probe.select(col(id))
      .join(hit, Seq(id), "left")
      .select(col(id), (coalesce(col("__hit"), lit(false)) === false).as("kept"))
  }

  /** Greedy-by-order fuzzy dedup verdicts: item KEPT iff no τ-similar
    * item with a strictly smaller id exists (the [[SubstringDup]]
    * keep-one ordering applied to whole items). Pure anti-membership on
    * the pair set — no connected components, so the rule is directly
    * SQL-mirrorable and order-deterministic. */
  def keepEarliest(
      items: DataFrame,
      pairs: DataFrame,
      id: String = "item_id"): DataFrame = {
    val dropped = pairs.select(col("id2").as(id)).distinct()
      .withColumn("__dropped", lit(true))
    items.select(col(id))
      .join(dropped, Seq(id), "left")
      .select(col(id), coalesce(col("__dropped"), lit(false)) === false)
      .toDF(id, "kept")
  }
}
