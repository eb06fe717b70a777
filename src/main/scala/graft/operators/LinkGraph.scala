package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-graph centrality for crawl-quality weighting (Page et al. 1999;
  * the role harmonic/PageRank centrality plays in Common-Crawl-derived
  * corpora: rank the HOST graph once per crawl, then weight or gate pages
  * by their host's score — the cheapest strong prior on page quality that
  * needs no text model at all).
  *
  * Exactness discipline (shared with [[NaiveBayes]]/[[Dsir]]): ranks are
  * integer nano-units (Σ ranks ≈ [[Scale]]) and every round is pure
  * integer arithmetic — `div` truncating division, order-independent
  * integer sums — so the DuckDB oracle replays all `rounds` power-
  * iteration rounds bit-for-bit as chained CTEs. No IEEE accumulation
  * order can leak in. Floor division sheds < 1 unit per edge per round;
  * at nano scale that bias is ≤ |E|·rounds·10⁻⁹ of total mass —
  * irrelevant for ranking, and the oracle sees the identical loss.
  *
  * Per synchronous round, with damping d/100 over N nodes:
  * {{{
  *   contrib(u→v) = rank(u) div outdeg(u)
  *   dangling     = Σ rank(u) over nodes with outdeg 0
  *   rank'(v)     = ((100−d)·Scale div 100) div N
  *                + (d · (Σ contrib(·→v) + dangling div N)) div 100
  * }}}
  *
  * Scale shape: the graph lives at HOST grain (~10⁸ rows for a full
  * crawl, not 10¹² pages), so each round is one shuffle join
  * (edges ⋈ ranks on src — edges can be pre-bucketed by src so only the
  * slim ranks side exchanges) plus one map-side-combined groupBy(dst).
  * Mega-host in-degree skew collapses in the partial aggregation —
  * contributions are longs, never strings. The rank vector is
  * `localCheckpoint`ed every round: power iteration is the textbook case
  * where lineage must be truncated (10 rounds of join+agg otherwise
  * nests the full plan 10 deep), the same justification as the
  * [[ConnectedComponents]] loop; at cluster scale the per-round vector
  * would land in the [[graft.plans.CheckpointIO]] manifest instead, and
  * the loop resumes mid-run like every other stage.
  *
  * Reference anchor: the reference ranks duplicate-cluster members by a
  * fixed source-priority list to elect the keep
  * (`ViewModels/MainViewModel.cs:877-882`); host centrality is the
  * corpus-side generalization — a data-derived priority over sources.
  */
object LinkGraph {

  /** Rank fixed-point scale: 10⁹ nano-units of total mass. */
  val Scale: Long = 1000000000L

  /** Directed-edge cleanup: distinct (src, dst) pairs, nulls dropped.
    * Self-loops are kept — a host linking to itself is a valid vote and
    * the recurrence handles it like any other edge. */
  def cleanEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()

  /** Exact integer PageRank after `rounds` synchronous rounds.
    *
    * Edges whose endpoints are missing from `nodes` shed their mass:
    * a src outside `nodes` never holds rank (contributes nothing), and
    * contributions into a dst outside `nodes` are dropped by the final
    * node-anchored join. Derive `nodes` from the edge list (union of
    * endpoints) when full conservation matters.
    *
    * @param nodes one string column `host` (distinct, non-null)
    * @param edges columns `src`, `dst` (deduped via [[cleanEdges]])
    * @return (host, rank_nano) — one row per node, Σ ≈ [[Scale]]
    */
  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      rounds: Int = 10,
      dampingPct: Int = 85,
      checkpointRounds: Boolean = true): DataFrame = {
    require(rounds >= 0 && rounds <= 64, s"rounds out of range: $rounds")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct: $dampingPct")

    val e = cleanEdges(edges)
    // outdeg is exact (post-distinct) and bounded by the node count; it is
    // reused every round, so materialize it once.
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    val n = nodes.select(col("host")).distinct().count()
    require(n > 0, "pageRank needs at least one node")
    val base = ((100L - dampingPct) * Scale / 100L) / n

    var ranks = nodes.select(col("host")).distinct()
      .select(col("host"), lit(Scale / n).as("rank_nano"))

    for (_ <- 1 to rounds) {
      val inflow = e
        .join(ranks, e("src") === ranks("host"))
        .join(deg, "src")
        .select(col("dst").as("host"),
          expr("rank_nano div deg").as("c"))
        .groupBy(col("host"))
        .agg(sum(col("c")).as("inflow"))
      // dangling mass: nodes with no out-edges spray uniformly
      val dangling = ranks
        .join(deg.select(col("src").as("host")), Seq("host"), "left_anti")
        .agg(coalesce(sum(col("rank_nano")), lit(0L)).as("dang"))
      val next = ranks.select(col("host"))
        .join(inflow, Seq("host"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("host"),
          (lit(base) + expr(
            s"($dampingPct * (coalesce(inflow, 0L) + dang div ${n}L)) div 100"))
            .as("rank_nano"))
      // checkpointRounds=false keeps the round composition lazy — for
      // plan audits and few-round small graphs only; production keeps
      // the eager per-round truncation (see scaladoc)
      ranks = if (checkpointRounds) next.localCheckpoint() else next
    }
    deg.unpersist()
    ranks
  }

  /** All quoted href values in an html string — the pragmatic regex tier
    * (the reference's extractor is regex-shaped too); a DOM parse belongs
    * in [[graft.functions.TextExtract]]'s lane, but link DISCOVERY only
    * needs the attribute values. Codegen'd, no UDF. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("href=[\"']([^\"']+)[\"']"), lit(1))

  /** Host part of an absolute URL ('' for relative/malformed — filtered
    * by [[hostEdges]]). */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)

  /** Crawl-frontier discovery — the loop closure a crawler runs every
    * cycle: absolute hrefs discovered in the crawled pages, canonicalized
    * ([[WebNormalize.canonUrl]]: fragment/utm drop, case-folded
    * authority), deduplicated within the batch, then anti-joined against
    * the already-crawled url set (canonicalized the same way). Returns
    * (url, n_refs) — the candidate frontier with its in-batch citation
    * count, the natural fetch-priority signal (ties broken by the
    * scheduler downstream).
    *
    * Scale shape: one explode over hrefs + a map-side-combined groupBy on
    * the canonical url + one LEFT ANTI join against the seen set. The
    * seen-set side is the standing per-epoch table (the sha-digest-table
    * argument, PLAN 21): persisted bucketed by url, read in place — per
    * cycle only the discovered-link side exchanges. Relative links are
    * out of the regex tier's scope and drop (documented; resolution
    * against a base url is a per-row string rewrite that slots in front
    * of canonUrl when needed). */
  def frontier(
      pages: DataFrame,
      seenUrls: DataFrame,
      urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val discovered = pages
      .select(explode(extractLinks(col(htmlCol))).as("u"))
      .where(col("u").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"))
      .select(WebNormalize.canonUrl(col("u")).as("url"))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_refs"))
    val seen = seenUrls
      .select(WebNormalize.canonUrl(col(urlCol)).as("url"))
      .distinct()
    discovered.join(seen, Seq("url"), "left_anti")
  }

  /** Host-grain edge list straight from raw pages: (page host → linked
    * host), relative links dropped, deduped. Feed [[pageRank]] with this
    * and the distinct-host node table for centrality end-to-end from the
    * crawl. Linear explode per page; edges dedup in the same exchange
    * the groupBy(deg) needs anyway. */
  def hostEdges(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame =
    pages.select(hostOf(col(urlCol)).as("src"),
        explode(extractLinks(col(htmlCol))).as("u2"))
      .select(col("src"), hostOf(col("u2")).as("dst"))
      .where(col("src") =!= "" && col("dst") =!= "")
      .distinct()

  /** The `<a href>` pair pattern shared by [[anchorEdges]] and its oracle:
    * group 1 = the quoted href value, group 2 = the tag's immediate text
    * (up to the first `<` — nested markup inside an anchor is out of the
    * regex tier's scope, documented). `[^>]`/`[^<]` classes keep Java and
    * RE2 byte-agreed (no backtracking divergence). */
  val AnchorPat = "<a [^>]*href=[\"']([^\"']+)[\"'][^>]*>([^<]*)</a>"

  /** Normalized anchor text: lowercase, whitespace collapsed (explicit
    * class — Java `\s` ≠ RE2 `\s` on VT), trimmed. */
  def normAnchor(c: Column): Column =
    trim(regexp_replace(lower(c), "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Host-grain anchor-text edges from raw pages: (src, dst, anchor) for
    * every absolute-target anchor tag with non-empty text. The anchor-text
    * corpus is the classic web-scale byproduct (every search engine and
    * the early web-LM corpora mined it): what OTHER pages call a url is a
    * high-precision description of it, and at host grain it is the
    * cheapest queryable summary of a site's role in the crawl.
    *
    * Scale shape: one linear explode per page (two `regexp_extract_all`
    * passes zip positionally — same match set by construction, same
    * pattern), relative targets and empty anchors drop before anything
    * shuffles. No exchange of its own; downstream rollups group on
    * (dst, anchor) — narrow strings, payload html never leaves the scan. */
  def anchorEdges(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame =
    pages.select(hostOf(col(urlCol)).as("src"),
        explode(arrays_zip(
          regexp_extract_all(col(htmlCol), lit(AnchorPat), lit(1)).as("u2"),
          regexp_extract_all(col(htmlCol), lit(AnchorPat), lit(2)).as("t2")))
          .as("p"))
      .select(col("src"), hostOf(col("p.u2")).as("dst"),
        normAnchor(col("p.t2")).as("anchor"))
      .where(col("src") =!= "" && col("dst") =!= "" && col("anchor") =!= "")

  /** Per-target anchor rollup: total references, distinct anchor texts,
    * and the plurality anchor (most frequent; ties broken by lexicographic
    * max — `max(struct(cnt, anchor))`, deterministic). Two map-side-
    * combined groupBys on (dst, anchor) then dst; the biggest target host
    * collapses in the partial aggregation, so mega-host in-link skew never
    * concentrates rows on one reducer. */
  def anchorSummary(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("dst"))
      .agg(sum(col("cnt")).as("n_refs"),
        count(lit(1)).as("n_anchors"),
        max(struct(col("cnt"), col("anchor"))).as("top"))
      .select(col("dst"), col("n_refs"), col("n_anchors"),
        col("top.anchor").as("top_anchor"), col("top.cnt").as("top_cnt"))

  /** Per-host link reciprocity: of a host's distinct out-neighbors, how
    * many link back — the classic link-farm signal (organic links are
    * mostly one-way; mutual-admiration rings reciprocate almost fully,
    * cf. the link-spam literature around TrustRank, Gyöngyi et al. 2004).
    * Integer counts only (`n_out`, `n_recip`) so thresholding is the
    * caller's policy and the oracle replays exactly. Self-loops are
    * excluded (trivially reciprocal, pure noise for the signal).
    *
    * Scale shape: the edge list joins its own reverse on (src, dst) —
    * one semi-join at host grain (the graph is ~10⁸ edges for a full
    * crawl, far below page grain) — then two map-side-combined groupBys.
    * Nothing here touches page payloads. */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = cleanEdges(edges).where(col("src") =!= col("dst"))
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val recip = e.join(rev, Seq("src", "dst"), "left_semi")
    e.groupBy(col("src")).agg(count(lit(1)).as("n_out"))
      .join(recip.groupBy(col("src")).agg(count(lit(1)).as("n_recip")),
        Seq("src"), "left")
      .select(col("src").as("host"), col("n_out"),
        coalesce(col("n_recip"), lit(0L)).as("n_recip"))
  }

  /** Page-grain quality weight: join every page's host against the rank
    * table (broadcast when it fits — host tables usually do at per-crawl
    * grain after a quality cut). Pages on unranked hosts get rank 0. */
  def pageWeights(
      pages: DataFrame,
      ranks: DataFrame,
      hostCol: String = "host"): DataFrame =
    pages.join(ranks.withColumnRenamed("host", hostCol), Seq(hostCol), "left")
      .withColumn("rank_nano", coalesce(col("rank_nano"), lit(0L)))
}
