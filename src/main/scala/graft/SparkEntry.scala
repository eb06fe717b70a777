package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators._

/** Driver contract (see SURVEY.md §2 for the operator inventory each query
  * exercises). Every SQL-expressible query has a DuckDB oracle with
  * column-name parity; signature/CC/ANN queries are rows-only and covered
  * by the ScalaTest oracle-parity suites instead.
  */
object SparkEntry {

  /** Scale-adaptive scan parallelism (optimization guide §2.2/§6.1): a
    * table smaller than one scan split arrives as ONE task (single parquet
    * row group), serializing every explode/aggregate stage until the first
    * exchange — at 32 cores the whole per-doc kernel ran on one of them.
    * When the input is below `spark.sql.files.maxPartitionBytes`,
    * round-robin repartition to `defaultParallelism`; above the threshold
    * the scan already fans out and the plan is untouched — no repartition
    * of a large corpus.
    *
    * Round-robin, NOT hash-on-key, deliberately: a hash repartition's
    * partitioning claim propagates, and on this Spark build a union of
    * branches sharing the co-partitioned subtree let a downstream
    * groupBy(key-subset) run partition-locally without its exchange,
    * splitting each group across the union's copies (reproduced: the
    * pre-r6 gopherRepetition emitted 3 partial rows per doc through the
    * parquet-write path while count() of the same plan read 500 — the
    * column-pruned plan re-added the exchange). RoundRobinPartitioning
    * never satisfies a clustered distribution, so every downstream
    * aggregation keeps its exchange and no such claim can propagate;
    * row-to-partition assignment stays deterministic via Spark's
    * sort-before-repartition. */
  private def readAdaptive(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val small = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength <
        s.sessionState.conf.filesMaxPartitionBytes
    } catch { case _: Throwable => false }
    if (small) df.repartition(s.sparkContext.defaultParallelism)
    else df
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    readAdaptive(s, s"$dir/documents.parquet")
  // the relational tables run row-narrow scans+aggregates with no
  // per-row kernel to parallelize — an added exchange measured as a pure
  // regression there (q1_agg 0.37 s → 0.73 s), so they read as-is
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
  private def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    readAdaptive(s, s"$dir/embeddings.parquet")

  /** documents ∪ two deterministic duplicate slices: same-source copies
    * (doc_id + 1e6) and cross-source copies (doc_id + 2e6, source suffixed
    * "x"). The driver corpus contains zero duplicate texts, so without
    * planting, every exact-dup oracle row compares trivially-equal EMPTY
    * sets (VERDICT r1). Mirrored verbatim in the oracle SQL CTE
    * [[plantedCte]]; the two slices exercise both scope branches
    * (same-source groups vs cross-source groups). */
  private def docsPlanted(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    d.unionByName(
      d.where(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      .unionByName(
        d.where(col("doc_id") % 50 === 25)
          .withColumn("doc_id", col("doc_id") + lit(2000000L))
          .withColumn("source", concat(col("source"), lit("x"))))
  }

  /** Planted soft-404 shell and mojibake tail shared by the q_soft404,
    * q_crawl_budget, q_mojibake and q_web_funnel fixtures — their oracles
    * inline the SAME bytes (via chr() for the damage chars), so these
    * literals must never fork per fixture. */
  private val Soft404Shell =
    "Error 404 - page not found. The requested document is not available."
  private val MojibakeTail =
    " caf\uFFFD menu \u0001\u0002 na\u00C3\u00AFve stra\u00C3\u009Fe"

  /** The oracle-SQL mirror of [[docsPlanted]]. */
  private val plantedCte: String =
    """WITH docs AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text, lang, source || 'x', n_chars
      |  FROM documents WHERE doc_id % 50 = 25)""".stripMargin

  /** Synthetic url per document row — one definition shared by the page
    * builder and the overrides fixture; SQL mirror: [[urlSql]]. */
  private def urlCol: org.apache.spark.sql.Column =
    concat(
      lit("https://"), col("source"), lit(".example/d"),
      pmod(col("doc_id"), lit(5)), lit("/doc"), col("doc_id"), lit(".html"))

  private val urlSql: String =
    "'https://' || source || '.example/d' || CAST(doc_id % 5 AS VARCHAR)" +
      " || '/doc' || CAST(doc_id AS VARCHAR) || '.html'"

  /** Three-snapshot capture history synthesized from documents for the
    * [[SnapshotDelta]] queries — snap 1: every url; snap 2: every url
    * with %3==1 texts re-written; snap 3: even-doc urls only, %6==4
    * re-written again (note 4 ≡ 1 mod 3, so those urls changed at BOTH
    * re-crawls). SQL mirror: [[snapshotCte]]. */
  private def snapshotPages(d: DataFrame): DataFrame = {
    val base = d.select(urlCol.as("url"), col("doc_id"), col("text"))
    base.select(col("url"), lit(1L).as("ts_s"), col("text"), col("doc_id"))
      .unionByName(base.select(col("url"), lit(2L).as("ts_s"),
        when(col("doc_id") % 3 === 1, concat(lit("v2 "), col("text")))
          .otherwise(col("text")).as("text"), col("doc_id")))
      .unionByName(base.where(col("doc_id") % 2 === 0)
        .select(col("url"), lit(3L).as("ts_s"),
          when(col("doc_id") % 6 === 4, concat(lit("v3 "), col("text")))
            .when(col("doc_id") % 3 === 1, concat(lit("v2 "), col("text")))
            .otherwise(col("text")).as("text"), col("doc_id")))
      // late arrivals: urls first captured at snapshot 3 (status `new`
      // mid-history, not just at the epoch)
      .unionByName(base.where(col("doc_id") % 10 === 7)
        .select(concat(col("url"), lit("?late")).as("url"),
          lit(3L).as("ts_s"), col("text"), col("doc_id")))
      .drop("doc_id")
  }

  /** The oracle-SQL mirror of [[snapshotPages]] + lag-classify: statuses
    * via lag(text) — digest equality and text equality agree. */
  private val snapshotCte: String =
    s"""WITH caps AS (
      |  SELECT $urlSql AS url, CAST(1 AS BIGINT) AS ts_s, text FROM documents
      |  UNION ALL
      |  SELECT $urlSql AS url, CAST(2 AS BIGINT) AS ts_s,
      |    CASE WHEN doc_id % 3 = 1 THEN 'v2 ' || text ELSE text END
      |  FROM documents
      |  UNION ALL
      |  SELECT $urlSql AS url, CAST(3 AS BIGINT) AS ts_s,
      |    CASE WHEN doc_id % 6 = 4 THEN 'v3 ' || text
      |         WHEN doc_id % 3 = 1 THEN 'v2 ' || text ELSE text END
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT $urlSql || '?late' AS url, CAST(3 AS BIGINT) AS ts_s, text
      |  FROM documents WHERE doc_id % 10 = 7),
      |st AS (SELECT url, ts_s, text,
      |  CASE WHEN lag(text) OVER w IS NULL THEN 'new'
      |       WHEN lag(text) OVER w = text THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |  FROM caps WINDOW w AS (PARTITION BY url ORDER BY ts_s))""".stripMargin

  /** Shared frontier-discovery CTE chain (href extract → canon → counts →
    * seen anti-join), ending in `frontier(url, n_refs)` — the oracle
    * mirror of [[LinkGraph.frontier]] over the q_frontier fixture; reused
    * by the q_fetch_plan composition. */
  private val frontierCte: String =
    """WITH pages AS MATERIALIZED (SELECT doc_id,
      |  'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.example/p' ||
      |    CAST(doc_id AS VARCHAR) AS url,
      |  '<html><body><a href="http://h' ||
      |    CAST((doc_id + 1) % 40 AS VARCHAR) || '.example/p' ||
      |    CAST(doc_id + 1 AS VARCHAR) ||
      |    '#sec">n</a><a href=''http://H' ||
      |    CAST(((doc_id % 40) * 13 + 5) % 40 AS VARCHAR) ||
      |    '.example/new' || CAST(doc_id % 7 AS VARCHAR) ||
      |    '?utm_source=x''>u</a><a href="/rel">v</a></body></html>'
      |    AS html
      |  FROM documents),
      |raw AS (SELECT
      |  unnest(regexp_extract_all(html, 'href=["'']([^"'']+)["'']', 1))
      |    AS u FROM pages),
      |ab AS (SELECT u FROM raw
      |  WHERE regexp_matches(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://')),
      |c1 AS (SELECT regexp_replace(u, '#.*', '', 'g') AS nf FROM ab),
      |c2 AS (SELECT regexp_replace(regexp_replace(nf,
      |  '([?&])utm_[^&#]*(&utm_[^&#]*)*&', '\1', 'g'),
      |  '[?&]utm_[^&#]*(&utm_[^&#]*)*$', '', 'g') AS nu FROM c1),
      |c3 AS (SELECT
      |  lower(regexp_extract(nu, '^[a-zA-Z]+://[^/]*', 0)) ||
      |  substr(nu,
      |    length(regexp_extract(nu, '^[a-zA-Z]+://[^/]*', 0)) + 1)
      |    AS url FROM c2),
      |d AS (SELECT url, count(*) AS n_refs FROM c3 GROUP BY 1),
      |seen AS (SELECT DISTINCT url FROM pages),
      |frontier AS (SELECT d.url, d.n_refs FROM d
      |  LEFT JOIN seen ON d.url = seen.url
      |  WHERE seen.url IS NULL)""".stripMargin

  /** documents-shaped frame → input_hint-shaped pages (url, warc_ts, html,
    * text, lang); texts here are plain words so the html wrap round-trips
    * the canonical extractor exactly. */
  def pagesFrom(d: DataFrame): DataFrame =
    d.select(
      urlCol.as("url"),
      timestamp_seconds(lit(1767225600L) + col("doc_id")).as("warc_ts"),
      encode(
        concat(lit("<html><head><title></title></head><body><p>"),
          col("text"), lit("</p></body></html>")), "UTF-8").as("html"),
      col("text"),
      col("lang"))

  def pagesFromDocs(s: SparkSession, dir: String): DataFrame =
    pagesFrom(docs(s, dir))

  /** embeddings ∪ two planted near-dup slices: exact copies (vec_id + 1e6)
    * and first-coordinate-zeroed copies (vec_id + 2e6, cosine ≈ 0.99 to
    * their base). Mirrored verbatim in the q_cos_dup_pairs oracle SQL.
    * `toDouble` casts to array<double> so Spark's dot product is
    * bit-identical to DuckDB's (the LSH variant needs array<float> for
    * vec_simhash). */
  private def plantedEmbeddings(s: SparkSession, dir: String, toDouble: Boolean): DataFrame = {
    val zero = if (toDouble) lit(0.0d) else lit(0.0f)
    val e0 = embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val e = if (toDouble)
      e0.withColumn("embedding", col("embedding").cast("array<double>")) else e0
    e.unionByName(
      e.where(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000L)))
      .unionByName(
        e.where(col("vec_id") % 20 === 10)
          .withColumn("vec_id", col("vec_id") + lit(2000000L))
          .withColumn("embedding",
            concat(array(zero), slice(col("embedding"), 2, 1000000))))
  }

  /** The FULL pipeline over the three-way planted corpus (exact copies,
    * appended near-copies, boilerplate-passage sharers) — the configuration
    * whose DuckDB oracle recomputes all three edge kinds exactly. Shared by
    * `q_dedup_decisions_full` and its flagship alias `q_dedup_decisions`
    * (VERDICT r2 missing.3: the alias previously ran an un-oracled raw
    * variant and kept a permanent `no_oracle` row on the flagship surface). */
  private def fullPlantedDecisions(s: SparkSession, dir: String): DataFrame = {
    val passage = " " + ("shared boilerplate passage " * 10)
    val base = docs(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val big = base.where(length(col("text")) >= 250)
    val planted = base
      .unionByName(big.where(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      .unionByName(big.where(col("doc_id") % 25 === 7)
        .withColumn("doc_id", col("doc_id") + lit(3000000L))
        .withColumn("text", concat(col("text"), lit(" appended"))))
      .unionByName(big.where(col("doc_id") % 25 === 11)
        .withColumn("doc_id", col("doc_id") + lit(4000000L))
        .withColumn("text", concat(col("text"), lit(passage))))
    DedupPipeline.run(s, pagesFrom(planted), DedupConfig(minLen = 60), fromHtml = true)
      .decisions
      .select(col("url"), col("cluster_size"), col("state"))
  }

  /** Exact-only planted run → per-state stats; shared by
    * `q_dedup_stats_exact` and its flagship alias `q_dedup_stats`. */
  private def exactPlantedStats(s: SparkSession, dir: String): DataFrame = {
    val pages = pagesFrom(docsPlanted(s, dir))
    DedupPipeline.run(
      s, pages,
      DedupConfig(minLen = 60, enableNear = false, enableSubstr = false),
      fromHtml = true)
      .stats
      .select(
        col("state"), col("docs"), col("bytes").cast("long").as("bytes"),
        round(col("doc_ratio"), 9).as("doc_ratio"),
        round(col("byte_ratio"), 9).as("byte_ratio"))
  }

  /** Flagship: full dedup pipeline (extract → exact → LSH → substring → CC →
    * decisions) over sf0.001 pages. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = pagesFromDocs(spark, "/root/testdata/sf0.001")
    DedupPipeline.run(spark, pages, DedupConfig(), fromHtml = true).decisions
  }

  // block key used by the exact-dup demo queries (md5: DuckDB-expressible)
  private def block: org.apache.spark.sql.Column = md5(col("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup surface (O5/O7/O8/O12/O16/O18) ----
    "q_exact_dup_groups" -> ((s, dir) =>
      docsPlanted(s, dir).groupBy(block.as("h"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("rep_id"))
        .where(col("cnt") > 1)),

    "q_dup_states" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(block)
      docsPlanted(s, dir)
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("min_id", min(col("doc_id")).over(w))
        .select(
          col("doc_id"),
          when(length(col("text")) < 60, "ignored")
            .when(col("cnt") === 1, "unique")
            .when(col("doc_id") === col("min_id"), "keep")
            .otherwise("delete").as("state"))
    }),

    "q_state_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(block)
      docsPlanted(s, dir)
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("min_id", min(col("doc_id")).over(w))
        .withColumn(
          "state",
          when(length(col("text")) < 60, "ignored")
            .when(col("cnt") === 1, "unique")
            .when(col("doc_id") === col("min_id"), "keep")
            .otherwise("delete"))
        .groupBy(col("state"))
        .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"))
    }),

    "q_scope_same_source_singletons" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(block, col("source"))
      docsPlanted(s, dir)
        .withColumn("cnt", count(lit(1)).over(w))
        .where(col("cnt") === 1)
        .select(col("doc_id"))
    }),

    "q_scope_different_source_unique" -> ((s, dir) => {
      val g = docsPlanted(s, dir).groupBy(block.as("h"))
        .agg(countDistinct(col("source")).as("nsrc"))
      docsPlanted(s, dir).withColumn("h", block)
        .join(g, "h").where(col("nsrc") === 1)
        .select(col("doc_id"))
    }),

    "q_length_filter" -> ((s, dir) =>
      docs(s, dir).where(length(col("text")) < 200)
        .select(col("doc_id"), length(col("text")).cast("long").as("len"))),

    "q_candidate_pairs_exact" -> ((s, dir) => {
      val d = docsPlanted(s, dir).select(block.as("h"), col("doc_id"))
      val a = d.select(col("h"), col("doc_id").as("a_id"))
      val b = d.select(col("h"), col("doc_id").as("b_id"))
      a.join(b, "h").where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
    }),

    // ---- flagship pipeline, exact-only, driver-verifiable (O16/O12/O4) ----
    // Emitted BY the DedupPipeline/Decisions code path (not a hand-inlined
    // window): extract → minLen 60 → sha blocking → CC over star edges →
    // rep election → states. Planted groups are constructed so the natural
    // -sort-min member is also the min-doc_id member, which the SQL oracle
    // can express (same shape as q_dup_states but produced by the engine).
    "q_dedup_decisions_exact" -> ((s, dir) => {
      val pages = pagesFrom(docsPlanted(s, dir))
      DedupPipeline.run(
        s, pages,
        DedupConfig(minLen = 60, enableNear = false, enableSubstr = false),
        fromHtml = true)
        .decisions
        .select(col("url"), col("cluster_size"), col("state"))
    }),

    // ---- state-scoped stats (O18/O19), engine-emitted, exact-only ----
    "q_dedup_stats_exact" -> (exactPlantedStats _),

    // ---- near-dup LSH → verify → CC clustering, driver-verifiable ----
    // The near-dup path's END-TO-END driver oracle: MinHash → banding →
    // bounded buckets → prefilter → exact shingle Jaccard → connected
    // components, compared against DuckDB computing the same k-shingle
    // Jaccard exhaustively over ALL pairs and closing components with a
    // recursive CTE (the oracle is O(n²) — driver scale only, never the
    // engine path). Corpus = documents with length ≥ 200 plus planted
    // one-word-appended copies (J = m/(m+1) ≈ 0.97+); the documents table
    // also contains NATURAL near-dup pairs (J ≈ 0.94–0.99), so both sides
    // must recover identical component SETS. Cluster comparison (not edge
    // comparison) is deliberate: same-signature members star-link to one
    // center, so the engine emits a connected COVER of each component, not
    // every ≥τ pair. The emitted label is the component's plain string-min
    // url — the engine's natural-order election is not SQL-expressible,
    // and identical sets ⇒ identical min labels.
    "q_near_dup_clusters" -> ((s, dir) => nearDupClusterLabels(s, dir)._1),

    // ---- dup-pair recall scoreboard (the north-rule acceptance metric) ----
    // The planted base↔copy pairs ARE the ground truth, so the pipeline can
    // grade itself: join each truth pair against the LSH→verify→CC labels
    // and report (n_truth, n_hit, n_cluster_pairs, recall_permille) as ONE
    // row. n_cluster_pairs (Σ C(n,2) over clusters) is the denominator a
    // precision read uses — together the two numbers say "found everything,
    // invented nothing". Integer permille, so the oracle replays it exactly;
    // the oracle's clusters come from the exhaustive-Jaccard recursive-CTE
    // truth, so a recall_permille match PROVES the engine's recall is the
    // exact graph's recall (=1000 at fixture scale). At 100 TB this runs
    // over any labeled audit slice: two broadcastable joins on the tiny
    // truth table + one label-grain groupBy — the corpus never re-shuffles.
    "q_dup_recall" -> ((s, dir) => {
      val (labels, _) = nearDupClusterLabels(s, dir)
      val planted = docs(s, dir)
        .where(length(col("text")) >= 200 && col("doc_id") % 25 === 7)
        .withColumn("cid", col("doc_id") + lit(3000000L))
      val truth = planted.select(
        urlCol.as("a"),
        concat(lit("https://"), col("source"), lit(".example/d"),
          pmod(col("cid"), lit(5)), lit("/doc"), col("cid"),
          lit(".html")).as("b"))
      val la = labels.select(col("url").as("a"), col("cluster").as("ca"))
      val lb = labels.select(col("url").as("b"), col("cluster").as("cb"))
      val hits = truth.join(la, "a").join(lb, "b")
        .where(col("ca") === col("cb"))
      val pairMass = labels.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("(n * (n - 1)) div 2")), lit(0L))
          .as("n_cluster_pairs"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(pairMass)
        .withColumn("recall_permille", expr("(n_hit * 1000) div n_truth"))
    }),

    // ---- keep-best copy per NEAR-dup cluster (FineWeb keep policy) ----
    // The bestPerKey election applied to LSH→verify→CC clusters instead
    // of exact-digest groups: per cluster keep the copy with the MOST
    // whitespace tokens (ties toward the min url). Oracle = the
    // q_near_dup_clusters recursive-CTE cluster truth + a rank window.
    "q_cluster_keep_best" -> ((s, dir) => {
      val (labels, d) = nearDupClusterLabels(s, dir)
      val scored = labels.join(
        d.select(col("url"),
          size(split(col("text"), " ")).as("score")), Seq("url"))
      val kept = operators.ExactDedup
        .bestPerKey(scored, key = "cluster", score = "score", tieBreak = "url")
      scored.select(col("url"))
        .join(kept.select(col("url")).withColumn("__k", lit(true)),
          Seq("url"), "left")
        .select(col("url"), coalesce(col("__k"), lit(false)).as("kept"))
    }),

    // ---- paragraph-granularity near-dup (same machinery, sub-doc unit) ----
    // docs < 40 chunk into 24-word paragraphs (≥ 8 words kept); %7==2 docs
    // get their first paragraph re-planted with one appended word
    // (J = 21/22 ≈ 0.95). The WHOLE doc-level LSH→verify→CC pipeline runs
    // unchanged over paragraph rows — near-dup granularity is a projection
    // choice, not new machinery — vs the same exhaustive-Jaccard +
    // recursive-CTE truth at paragraph grain.
    "q_paragraph_near_dup" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val paras = docs(s, dir).where(col("doc_id") < 40)
        .select(col("doc_id"), col("text"))
        .withColumn("paras", transform(
          sequence(lit(0), ceil(size(ws) / lit(24.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(24) + 1, lit(24)), " ")))
        .select(col("doc_id"), posexplode(col("paras")).as(Seq("pidx", "ptext")))
        .where(size(split(col("ptext"), " ")) >= 8)
      val planted = paras.unionByName(
        paras.where(col("doc_id") % 7 === 2 && col("pidx") === 0)
          .withColumn("doc_id", col("doc_id") + lit(7000000L))
          .withColumn("ptext", concat(col("ptext"), lit(" tailword"))))
      val d = planted.select(
        concat(col("doc_id").cast("string"), lit("_"),
          col("pidx").cast("string")).as("url"),
        col("ptext").as("text"))
        .withColumn("nk", gf.natural_sort_key(col("url")))
      val cfg = operators.Lsh.Config()
      val sigs = operators.Lsh.withSignatures(d, cfg)
      val cands = operators.Lsh.candidatePairs(s, sigs, cfg)
      val edges = operators.Lsh.verifiedEdges(cands, d, cfg, tau = 0.8)
      val labels = operators.ConnectedComponents.run(
        s, d.select(col("url"), col("nk")), edges.select(col("src"), col("dst")))
      labels
        .withColumn(
          "cluster",
          min(col("url")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_url"))))
        .select(col("url"), col("cluster"))
    }),

    // ---- web-corpus normalization operators (all driver-oracled; every
    // regex stays in the Java-regex ∩ RE2 portable subset) ----
    // Normalized exact dedup: case/punct/spacing-insensitive blocking key;
    // planted upper-cased copies must collide with their originals.
    "q_normalized_dups" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val d = base.unionByName(
        base.where(col("doc_id") % 40 === 3)
          .withColumn("doc_id", col("doc_id") + lit(5000000L))
          .withColumn("text", upper(col("text"))))
      d.select(col("doc_id"), operators.WebNormalize.normalSha(col("text")).as("h"))
        .withColumn(
          "n",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
    }),

    // PII scrub: planted emails/phones become typed tokens.
    "q_pii_scrub" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn(
          "t",
          when(
            col("doc_id") % 10 === 1,
            concat(col("text"), lit(" contact bob@example.com or 555-123-4567 asap")))
            .otherwise(col("text")))
      d.select(col("doc_id"), operators.WebNormalize.scrubPii(col("t")).as("scrubbed"))
    }),

    // Repetition signal (Gopher rule): top word-bigram occurrence
    // fraction; planted machine-repetitive docs must score ≈ 0.5.
    "q_repetition" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val d = base.unionByName(
        base.where(col("doc_id") % 100 === 9)
          .withColumn("doc_id", col("doc_id") + lit(6000000L))
          .withColumn("text", rtrim(repeat(lit("buy now "), 60))))
      operators.TextAnalysis.topBigramFraction(d)
    }),

    // ---- corpus vocabulary head (tokenizer-prep statistics) ----
    "q_vocab_topk" -> ((s, dir) =>
      operators.TextAnalysis.vocabTopK(docs(s, dir), k = 50)),

    // ---- vocabulary coverage curve (tokenizer-budget statistic) ----
    "q_vocab_coverage" -> ((s, dir) =>
      operators.TextAnalysis.vocabCoverage(docs(s, dir), k = 50)),

    // ---- per-doc n-gram novelty (inverse of duplicated mass) ----
    // planted exact copies (%31==4, id+9000000) must read novel_frac 0 on
    // BOTH sides of the pair; engine matches on xxhash64(gram), oracle on
    // the gram string (the q_decontaminate argument)
    "q_novelty" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 31 === 4)
          .withColumn("doc_id", col("doc_id") + lit(9000000L)))
      operators.TextAnalysis.noveltyFrac(planted, n = 8)
    }),

    // ---- FULL Gopher repetition suite (Rae et al. 2021 §A1.1), driver-
    // verifiable ---- docs chunk into 8-word lines → 2-line paragraphs;
    // planted: a repeated first paragraph (%5=0 → dup paragraph + its
    // lines), a repeated first line as its own paragraph (%7=3 → dup line,
    // no dup paragraph), a machine-repetition tail (%11=2 → top/dup n-gram
    // signals) — every output column fires non-vacuously.
    "q_gopher_repetition" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val chunked = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("lines0", transform(
          sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
        .withColumn("paras0", transform(
          sequence(lit(0), ceil(size(col("lines0")) / lit(2.0)).cast("int") - 1),
          i => array_join(slice(col("lines0"), i * lit(2) + 1, lit(2)), "\n")))
      val planted = chunked
        .withColumn("paras",
          when(col("doc_id") % 5 === 0,
            concat(col("paras0"), slice(col("paras0"), 1, 1)))
            .otherwise(col("paras0")))
        .withColumn("paras",
          when(col("doc_id") % 7 === 3,
            concat(col("paras"), slice(col("lines0"), 1, 1)))
            .otherwise(col("paras")))
        .withColumn("paras",
          when(col("doc_id") % 11 === 2,
            concat(col("paras"), array(rtrim(repeat(lit("buy now "), 20)))))
            .otherwise(col("paras")))
        .select(col("doc_id"), array_join(col("paras"), "\n\n").as("text"))
      TextAnalysis.gopherRepetition(planted)
    }),

    // ---- CCNet-style perplexity quality bucket, driver-verifiable ----
    // char-trigram LM trained on the doc_id%10=7 slice, every doc scored
    // as -mean log P(trigram), exact (rank-based) tercile buckets.
    "q_perplexity_bucket" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val train = d.where(col("doc_id") % 10 === 7)
      val tri = Perplexity.trainTrigrams(train)
      Perplexity.bucketExact(Perplexity.score(
        d, tri, Perplexity.contextCounts(tri), Perplexity.alphabetSize(train)))
    }),

    // URL canonicalization over deliberately messy variants.
    "q_url_canon" -> ((s, dir) => {
      val messy0 = concat(
        urlCol,
        when(col("doc_id") % 3 === 0, lit("?utm_source=feed&ref=1#top"))
          .when(col("doc_id") % 3 === 1, lit("#section-2"))
          .otherwise(lit("?a=1&utm_campaign=x")))
      val messy = when(col("doc_id") % 7 === 0, upper(messy0)).otherwise(messy0)
      docs(s, dir).select(col("doc_id"), col("source"))
        .select(col("doc_id"), operators.WebNormalize.canonUrl(messy).as("canon"))
    }),

    // ---- FLAGSHIP full pipeline (exact ∪ near ∪ substring → CC →
    // keep/delete), driver-verifiable ----
    // The complete DedupPipeline with every stage on, against a DuckDB
    // oracle that recomputes all three edge kinds exactly (md5 groups;
    // exhaustive k-shingle Jaccard ≥ 0.8; exhaustive shared-200-gram),
    // closes components with a recursive CTE, and re-elects
    // representatives. Natural-order election is expressible here because
    // the synthetic urls make natural order ≡ (source number, doc_id % 5,
    // doc_id). Planted: exact copies (+1e6), one-word-appended near copies
    // (+3e6), and boilerplate-passage sharers (+4e6) — three dup kinds
    // interacting in shared clusters, plus the corpus's natural near-dups.
    "q_dedup_decisions_full" -> (fullPlantedDecisions _),

    // deterministic per-state audit sample: the human-QA workflow ("show
    // me 3 examples of what you deleted / kept / ignored") as a md5-drawn
    // reproducible draw — re-runs and the oracle pick the SAME rows
    "q_audit_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("state"))
        .orderBy(md5(col("url")), col("url"))
      fullPlantedDecisions(s, dir)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("state"), col("rk").cast("long").as("rk"),
          col("url"), col("cluster_size"))
    }),

    // ---- Manku SimHash-table retrieval (Hamming-defined near-dup) ----
    // Rows-only (signature internals): corpus simhashes ∪ planted ≤3-bit
    // flips; retrieval is PURELY by permuted-table key equality (Manku
    // WWW'07) — complete for Hamming ≤ tableBlocks - tableKeep = 3 by
    // pigeonhole (SimhashTablesSpec proves completeness on planted flips).
    "q_simhash_tables" -> ((s, dir) => {
      val sh0 = docs(s, dir).select(
        col("doc_id"), gf.simhash64(col("text"), 5, 42L).as("sh"))
      val mask = expr(
        "shiftleft(cast(1 as bigint), cast(doc_id % 64 as int)) | " +
          "shiftleft(cast(1 as bigint), cast((doc_id * 7 + 11) % 64 as int)) | " +
          "shiftleft(cast(1 as bigint), cast((doc_id * 13 + 29) % 64 as int))")
      val planted = sh0.unionByName(
        sh0.where(col("doc_id") % 10 === 4)
          .withColumn("sh", col("sh").bitwiseXOR(mask))
          .withColumn("doc_id", col("doc_id") + lit(7000000L)))
      val keys = planted.select(
        col("doc_id"), col("sh"),
        explode(gf.simhash_table_keys(col("sh"), 6, 3)).as("tk"))
      keys.alias("a")
        .join(
          keys.alias("b"),
          col("a.tk") === col("b.tk") && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          gf.hamming_dist(col("a.sh"), col("b.sh")).as("ham"))
        .distinct()
        .where(col("ham") <= 3)
    }),

    // ---- line-level dedup (CCNet-style), driver-verifiable ----
    // Docs are chunked into 8-word lines (the corpus has no newlines);
    // boilerplate lines planted into 1/3 and 1/4 of docs must strip, unique
    // prose must survive in order. Oracle mirrors the chunking + df + strip
    // + reassembly exactly (it groups by line TEXT where the engine groups
    // by xxhash64(line) — identical at any collision-free scale).
    "q_line_dedup" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val chunked = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn(
          "lines0",
          transform(
            sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
            i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
      val planted = chunked
        .withColumn(
          "lines",
          when(col("doc_id") % 3 === 0,
            concat(col("lines0"), array(lit("subscribe to our newsletter today"))))
            .otherwise(col("lines0")))
        .withColumn(
          "lines",
          when(col("doc_id") % 4 === 1,
            concat(col("lines"), array(lit("cookie policy accepted"))))
            .otherwise(col("lines")))
        .select(
          col("doc_id").cast("string").as("url"),
          array_join(col("lines"), "\n").as("text"))
      operators.LineDedup.stripFrequentLines(planted, maxDf = 10)
        .select(col("url"), col("kept_text"), col("n_lines"), col("n_stripped"))
    }),

    // ---- incremental (batch-vs-corpus) dedup, driver-verifiable ----
    // corpus = even doc_ids (digest table only), batch = doc_id%3 slice ∪ a
    // re-urled doc_id%9 copy slice — exercises batch-internal election,
    // corpus-overlap drop (%6) and new-content retention in one query.
    "q_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val corpusShas = d.where(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("sha"))
      val batch = d.where(col("doc_id") % 3 === 0)
        .select(concat(lit("b"), col("doc_id")).as("url"), col("text"))
        .unionByName(
          d.where(col("doc_id") % 9 === 0)
            .select(concat(lit("x"), col("doc_id")).as("url"), col("text")))
      IncrementalDedup.newDocs(batch, corpusShas, algo = "md5")
        .select(col("url"), col("sha"))
    }),

    // same inputs and output through the Bloom-gated path: the corpus-side
    // filter (built once per epoch at scale) short-circuits definite-new
    // rows before the authoritative anti-join; bloom negatives are
    // definitive, so the oracle is q_incremental_dedup's verbatim
    "q_incremental_dedup_bloom" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val corpusShas = d.where(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("sha"))
      val batch = d.where(col("doc_id") % 3 === 0)
        .select(concat(lit("b"), col("doc_id")).as("url"), col("text"))
        .unionByName(
          d.where(col("doc_id") % 9 === 0)
            .select(concat(lit("x"), col("doc_id")).as("url"), col("text")))
      val bloom = IncrementalDedup.corpusBloom(
        corpusShas, expectedItems = 4096, fpp = 0.01)
      IncrementalDedup.newDocsBloomGated(batch, corpusShas, bloom, algo = "md5")
        .select(col("url"), col("sha"))
    }),

    "q_ingest_stats" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val corpusShas = d.where(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("sha"))
      val batch = d.where(col("doc_id") % 3 === 0)
        .select(concat(lit("b"), col("doc_id")).as("url"), col("text"))
        .unionByName(
          d.where(col("doc_id") % 9 === 0)
            .select(concat(lit("x"), col("doc_id")).as("url"), col("text")))
      IncrementalDedup.ingestStats(batch, corpusShas, algo = "md5")
    }),

    // ---- paragraph-level dedup (RefinedWeb-style), driver-verifiable ----
    // same operator as q_line_dedup at "\n\n" granularity: 8-word lines
    // pair into 2-line paragraphs, a boilerplate paragraph planted into
    // every third doc must strip corpus-wide.
    "q_paragraph_dedup" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val chunked = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("lines0", transform(
          sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
        .withColumn("paras0", transform(
          sequence(lit(0), ceil(size(col("lines0")) / lit(2.0)).cast("int") - 1),
          i => array_join(slice(col("lines0"), i * lit(2) + 1, lit(2)), "\n")))
      val planted = chunked
        .withColumn("paras",
          when(col("doc_id") % 3 === 0,
            concat(col("paras0"),
              array(lit("subscribe to our newsletter\nall rights reserved"))))
            .otherwise(col("paras0")))
        .select(col("doc_id").cast("string").as("url"),
          array_join(col("paras"), "\n\n").as("text"))
      operators.LineDedup.stripFrequentLines(planted, maxDf = 10, sep = "\n\n")
        .select(col("url"), col("kept_text"),
          col("n_lines").as("n_paras"), col("n_stripped"))
    }),

    // ---- benchmark decontamination (13-gram overlap), driver-verifiable ----
    // eval set = the doc_id%37=5 texts; any training doc sharing a 13-word
    // gram with it is flagged. Engine matches on xxhash64(gram), oracle on
    // the gram STRING — identical at any collision-free scale (the same
    // argument as q_line_dedup).
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 37 === 5)
        .select(col("doc_id").as("bench_id"), col("text"))
      Decontaminate.contaminated(d, bench, n = 13)
    }),

    // same inputs and verdicts through the Bloom-gated path: the eval-gram
    // filter (built once per battery at scale) decides the clean majority
    // in-row; bloom negatives are definitively clean, maybes re-verify
    // against the exact gram table, so the oracle is q_decontaminate's
    "q_decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 37 === 5)
        .select(col("doc_id").as("bench_id"), col("text"))
      val bloom = Decontaminate.benchBloom(bench, n = 13, expectedItems = 65536)
      Decontaminate.contaminatedBloomGated(d, bench, bloom, n = 13)
    }),

    // per-benchmark attribution: two eval slices (%37==5 → evalA,
    // %41==6 → evalB); one row per (doc, bench set) sharing a 13-gram —
    // the audit view behind q_decontaminate's boolean
    "q_contamination_report" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 37 === 5)
        .select(lit("evalA").as("bench_id"), col("text"))
        .unionByName(d.where(col("doc_id") % 41 === 6)
          .select(lit("evalB").as("bench_id"), col("text")))
      Decontaminate.contaminationReport(d, bench, n = 13)
    }),

    // ---- re-crawl collapse (keep-latest per url), driver-verifiable ----
    // every doc_id%4=1 url gets a one-day-later re-crawl with changed text;
    // the collapse must keep exactly the newest row per url.
    "q_url_latest" -> ((s, dir) => {
      val d = docs(s, dir).select(
        urlCol.as("url"),
        (lit(1767225600L) + col("doc_id")).as("ts_s"),
        col("doc_id"), col("text"))
      val planted = d.unionByName(
        d.where(col("doc_id") % 4 === 1)
          .withColumn("ts_s", col("ts_s") + lit(86400L))
          .withColumn("text", concat(lit("recrawled "), col("text"))))
      ExactDedup.latestPerKey(planted, "url", "ts_s", "doc_id")
        .select(col("url"), col("ts_s"), length(col("text")).as("len"))
    }),

    // ---- corpus mixing + sequence packing (training-run assembly) ----
    // Deterministic stratified sampling by language (the data-mixing step)
    // and GPT-style concat-then-chunk sequence packing; both pure
    // row-functions the DuckDB oracle reproduces exactly.
    "q_corpus_mix" -> ((s, dir) =>
      Mixing.stratifiedSample(
        docs(s, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "zh" -> 0.75),
        seed = 42L)),

    "q_seq_pack" -> ((s, dir) =>
      Mixing.packSequences(
        docs(s, dir).select(col("doc_id"), col("text")),
        "doc_id",
        TextAnalysis.tokenCountWs(col("text")),
        budget = 256, nShards = 8)),

    // per-source cap: ≤ 10 docs per source in doc_id order — the
    // "no domain dominates" composition rule; plans a WindowGroupLimit
    // (map-side per-stratum limit before the exchange)
    "q_source_cap" -> ((s, dir) =>
      Mixing.capPerStratum(
        docs(s, dir).select(col("doc_id"), col("source")),
        "source", k = 10, col("doc_id"))),

    // ---- end-to-end curation funnel (FineWeb-shaped composition) ----
    // langid → quality gate → exact dedup → per-source cap, one plan.
    // Planting makes every stage non-vacuous: %10==1 → German text
    // (language drop), %10==2 → two words (quality drop), %10==4 → one
    // shared boilerplate page (dedup collapse); the cap binds on what
    // remains. The oracle recomputes the whole chain as nested CTEs.
    "q_curation_chain" -> ((s, dir) =>
      Curation.curate(curationPlanted(docs(s, dir)))),

    "q_curation_funnel" -> ((s, dir) =>
      Curation.funnelStats(curationPlanted(docs(s, dir)))),

    // ---- normalized curation chain (NFC + within-doc strip fused) ----
    // %10==5 docs gain a duplicated line + a COMPOSED café line; their
    // +9M twins carry an extra dup line + the DECOMPOSED café form. Raw
    // shas all differ; after the fused normalize stage the twin pairs
    // hash identically and dedup collapses them.
    "q_curation_norm" -> ((s, dir) =>
      Curation.curateNormalized(curationNormPlanted(docs(s, dir)))),

    // ---- span-level dedup (Lee et al. 2022), driver-verifiable ----
    // Winnowed candidates → per-pair shared-gram span kernel → per-doc
    // interval union, vs DuckDB recomputing duplicated spans from the
    // exhaustive 200-gram position table and merging them with a
    // gaps-and-islands window. Same planted passage clique as
    // q_substring_pairs_oracle.
    "q_dup_spans" -> ((s, dir) => {
      val passage = " " + ("shared boilerplate passage " * 10)
      val base = docs(s, dir).where(length(col("text")) >= 250)
        .select(col("doc_id"), col("text"), col("source"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 25 === 11)
          .withColumn("doc_id", col("doc_id") + lit(4000000L))
          .withColumn("text", concat(col("text"), lit(passage))))
      val d = planted
        .select(urlCol.as("url"), col("text"))
        .withColumn("nk", gf.natural_sort_key(col("url")))
      operators.SubstringDup.dupSpans(s, d, operators.SubstringDup.Config())
        .select(col("url"), col("s"), col("e"))
    }),

    // ---- duplicate-mass document filter (RefinedWeb composition rule) ----
    // same planted clique as q_dup_spans; a copy shares its whole base
    // prefix with the original, so clique members read dup_frac near 1
    // (dropped) while untouched docs read exactly 0 (kept)
    "q_dup_mass" -> ((s, dir) => {
      val passage = " " + ("shared boilerplate passage " * 10)
      val base = docs(s, dir).where(length(col("text")) >= 250)
        .select(col("doc_id"), col("text"), col("source"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 25 === 11)
          .withColumn("doc_id", col("doc_id") + lit(4000000L))
          .withColumn("text", concat(col("text"), lit(passage))))
      val d = planted
        .select(urlCol.as("url"), col("text"))
        .withColumn("nk", gf.natural_sort_key(col("url")))
      val spans = operators.SubstringDup
        .dupSpans(s, d, operators.SubstringDup.Config())
        .select(col("url"), col("s"), col("e"))
      operators.SubstringDup.dupMassFilter(
        d.select(col("url"), col("text")), spans, theta = 0.5)
    }),

    // ---- distributed suffix array (Manber-Myers prefix doubling) ----
    // Full-array parity: the global lexicographic rank of every suffix with
    // deterministic (url, pos) ties, vs DuckDB's row_number over
    // ORDER BY substr(text, pos) — binary collation on both engines.
    "q_suffix_array" -> ((s, dir) => {
      val d = docs(s, dir).where(col("doc_id") < 40)
        .select(urlCol.as("url"), col("text"))
      operators.SuffixArray.suffixArray(s, d)
        .select(col("url"), col("pos"), col("sa_rank"))
    }),

    // Same planted clique and the SAME oracle SQL as q_dup_spans, answered
    // through the suffix-array rank structure instead of winnowing — two
    // independent algorithms cross-validated against one gram-table truth.
    "q_sa_dup_spans" -> ((s, dir) => {
      val passage = " " + ("shared boilerplate passage " * 10)
      val base = docs(s, dir).where(length(col("text")) >= 250)
        .select(col("doc_id"), col("text"), col("source"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 25 === 11)
          .withColumn("doc_id", col("doc_id") + lit(4000000L))
          .withColumn("text", concat(col("text"), lit(passage))))
      operators.SuffixArray.dupSpans(
        s, planted.select(urlCol.as("url"), col("text")), minSubstr = 200)
        .select(col("url"), col("s"), col("e"))
    }),

    // Same corpus and the SAME oracle SQL as q_span_dedup_keep, answered
    // through the suffix-array rank structure (corpus-global group-min
    // orientation instead of per-pair) — cross-validated against one truth.
    "q_sa_span_keep" -> ((s, dir) => {
      val passage = " " + ("shared boilerplate passage " * 10)
      val base = docs(s, dir).where(length(col("text")) >= 250)
        .select(col("doc_id"), col("text"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 25 === 11)
          .withColumn("doc_id", col("doc_id") + lit(4000000L))
          .withColumn("text", concat(col("text"), lit(passage))))
      val d = planted
        .select(col("doc_id").cast("string").as("url"), col("text"))
        .withColumn("nk", gf.natural_sort_key(col("url")))
      operators.SuffixArray.dupSpansKeepOne(s, d, minSubstr = 200)
        .select(col("url"), col("s"), col("e"))
    }),

    // ---- keep-one-copy span dedup (Lee et al. 2022 standard variant) ----
    // Same planted clique as q_dup_spans, but spans are cut only from the
    // (nk, url)-LATER side of each pair, so every duplicated passage
    // survives exactly once (in its order-minimal doc). Urls are numeric
    // doc_id strings, whose natural order IS doc_id order — so DuckDB
    // orients the exhaustive 200-gram truth by y.doc_id < x.doc_id.
    "q_span_dedup_keep" -> ((s, dir) => {
      val passage = " " + ("shared boilerplate passage " * 10)
      val base = docs(s, dir).where(length(col("text")) >= 250)
        .select(col("doc_id"), col("text"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 25 === 11)
          .withColumn("doc_id", col("doc_id") + lit(4000000L))
          .withColumn("text", concat(col("text"), lit(passage))))
      val d = planted
        .select(col("doc_id").cast("string").as("url"), col("text"))
        .withColumn("nk", gf.natural_sort_key(col("url")))
      operators.SubstringDup.dupSpansKeepOne(s, d, operators.SubstringDup.Config())
        .select(col("url"), col("s"), col("e"))
    }),

    // ---- substring-dup pass (O15), driver-verifiable ----
    // Winnowed anchors → bounded fingerprint buckets → exact ≥L-char
    // common-substring verify, against the EXACT SQL truth: two docs share
    // a ≥200-char substring iff they share some 200-gram, which DuckDB
    // enumerates exhaustively (O(total chars) grams — driver scale only).
    // Parity therefore proves the winnowing guarantee end to end (every
    // true pair anchors into ≥1 shared fingerprint) with zero false
    // positives. Planted: a fixed 270-char boilerplate passage appended to
    // every doc_id % 25 = 11 doc (length ≥ 250) — a clique of passage
    // sharers plus each base↔planted pair via the base text itself.
    "q_substring_pairs_oracle" -> ((s, dir) => {
      val passage = " " + ("shared boilerplate passage " * 10)
      val base = docs(s, dir).where(length(col("text")) >= 250)
        .select(col("doc_id"), col("text"), col("source"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 25 === 11)
          .withColumn("doc_id", col("doc_id") + lit(4000000L))
          .withColumn("text", concat(col("text"), lit(passage))))
      val d = planted
        .select(urlCol.as("url"), col("text"))
        .withColumn("nk", gf.natural_sort_key(col("url")))
      val cfg = operators.SubstringDup.Config()
      val cands = operators.SubstringDup.candidatePairs(s, d, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      operators.SubstringDup.verifiedEdges(cands, d, cfg)
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
    }),

    // ---- deduped-corpus sink (O22/O23 analog), exact-only ----
    // The copy-unique surface: pages minus engine-decided deletes
    // (DedupPipeline.dedupedCorpus's anti-join), driver-verified against a
    // pure-SQL restatement of the same election.
    "q_deduped_corpus_exact" -> ((s, dir) => {
      val pages = pagesFrom(docsPlanted(s, dir))
      val r = DedupPipeline.run(
        s, pages,
        DedupConfig(minLen = 60, enableNear = false, enableSubstr = false),
        fromHtml = true)
      DedupPipeline.dedupedCorpus(pages, r.decisions)
        .select(col("url"), length(col("text")).as("len"))
    }),

    // ---- manual overrides (O17) on top of the exact decisions ----
    // keep→delete on every planted same-source keep (forces re-election of
    // the surviving copy); delete→keep on half the cross-source planted
    // copies (coexisting keep, no re-election).
    "q_overrides" -> ((s, dir) => {
      val planted = docsPlanted(s, dir)
      val dec = DedupPipeline.run(
        s, pagesFrom(planted),
        DedupConfig(minLen = 60, enableNear = false, enableSubstr = false),
        fromHtml = true).decisions
      val urls = planted.select(col("doc_id"), urlCol.as("url"))
      val ov = urls
        .where(col("doc_id") % 50 === 0 && col("doc_id") < 1000000)
        .select(col("url"), lit("delete").as("state"))
        .unionByName(
          urls.where(col("doc_id") >= 2000000 && col("doc_id") % 100 === 25)
            .select(col("url"), lit("keep").as("state")))
      Decisions.applyOverrides(dec, ov).select(col("url"), col("state"))
    }),

    // ---- text analysis (training-data ops) ----
    "q_token_count" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))),

    // token count under LEARNED BPE merges (12 training rounds over the
    // same corpus — the statistic a token-budget solver consumes); the
    // oracle re-trains the merges itself as unrolled SQL rounds and
    // applies them with the same marker-string replace chain
    "q_token_count_bpe" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Bpe.trainMerges(d, rounds = 12)
      d.select(
        col("doc_id"),
        Bpe.tokenCountUnderMerges(col("text"), merges).as("n_bpe"))
    }),

    // the learned merge table itself: (round, lhs, rhs, pair_count) —
    // every round's argmax pair under the (count desc, lhs, rhs)
    // tie-break, replayed round-for-round by the oracle
    "q_bpe_merges" -> ((s, dir) =>
      Bpe.mergesDF(s, Bpe.trainMerges(docs(s, dir), rounds = 12))),

    "q_lang_stats" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("total_chars"))),

    "q_doc_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"), TextAnalysis.fingerprintHex(col("text")).as("fp"))),

    "q_quality" -> ((s, dir) =>
      TextAnalysis.withQuality(docs(s, dir), col("text"))
        .select(
          col("doc_id"),
          col("q_words").cast("long").as("n_words"),
          round(col("q_punct_ratio"), 6).as("punct_ratio"))),

    "q_langid" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))),

    // ---- trigram-profile language id (~25 languages), driver-verifiable --
    // one held-out sentence per language planted on doc_id%26=i (i<25),
    // the %26=25 stratum keeps its original text; DuckDB re-derives the
    // trigram profiles from the same embedded fixture strings and replays
    // the script rules + coverage vote exactly.
    "q_langid_trigram" -> ((s, dir) => {
      val planted = operators.LangProfiles.heldOut.zipWithIndex
        .foldLeft(when(lit(false), lit(""))) { case (acc, ((_, t), i)) =>
          acc.when(col("doc_id") % 26 === i, lit(t))
        }.otherwise(col("text"))
      operators.LangId.langIdTrigram(
        docs(s, dir).select(col("doc_id"), planted.as("text")))
    }),

    // ---- Gopher quality rules (Rae et al. 2021), driver-verifiable ----
    // Docs chunked into 8-word lines; rule-violating slices planted so
    // every rule fires non-vacuously: all-bullet lines (doc_id%7=0),
    // ellipsis line endings (%7=1), symbol spam (%7=2); the 50-word floor
    // and stop-word floor fire naturally on short / stopword-free docs.
    "q_gopher_quality" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val chunked = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("lines0", transform(
          sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
      val planted = chunked
        .withColumn("lines",
          when(col("doc_id") % 7 === 0,
            transform(col("lines0"), l => concat(lit("- "), l)))
            .otherwise(col("lines0")))
        .withColumn("lines",
          when(col("doc_id") % 7 === 1,
            transform(col("lines"), l => concat(l, lit("..."))))
            .otherwise(col("lines")))
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 2,
            concat(array_join(col("lines"), "\n"),
              lit("\n# # # # # # # # # # # # # # # #")))
            .otherwise(array_join(col("lines"), "\n")).as("text"))
      QualityFilters.gopherQuality(planted)
    }),

    // ---- C4 line cleaning (Raffel et al. 2020), driver-verifiable ----
    // Even-indexed lines get terminal periods (C4 keeps them), a
    // javascript notice planted on %5=0, a brace line on %5=1, a lorem-
    // ipsum line on %11=3 (kept as a LINE but kills the DOC) — every rule
    // branch produces rows.
    "q_c4_clean" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val chunked = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("lines0", transform(
          sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
      val planted = chunked
        .withColumn("lines", transform(col("lines0"), (l, i) =>
          when(i % 2 === 0, concat(l, lit("."))).otherwise(l)))
        .withColumn("lines",
          when(col("doc_id") % 5 === 0,
            concat(col("lines"),
              array(lit("please enable JavaScript to view this page."))))
            .otherwise(col("lines")))
        .withColumn("lines",
          when(col("doc_id") % 5 === 1,
            concat(col("lines"), array(lit("window.config = { foo: 1 };"))))
            .otherwise(col("lines")))
        .withColumn("lines",
          when(col("doc_id") % 11 === 3,
            concat(col("lines"),
              array(lit("standard lorem ipsum placeholder text here."))))
            .otherwise(col("lines")))
        .select(col("doc_id"), array_join(col("lines"), "\n").as("text"))
      QualityFilters.c4Clean(planted)
    }),

    // ---- relational surface (O3/O18 analogs on TPC-H-ish tables) ----
    "q1_agg" -> ((s, dir) =>
      lineitem(s, dir).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          count(lit(1)).as("n"))),

    "q_orders_priority" -> ((s, dir) =>
      orders(s, dir).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))),

    "q_events_by_type" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))),

    // planted duplicate slice (event_id % 100) — the driver events table
    // has no duplicate timestamps, so the unplanted oracle matched on an
    // empty set (VERDICT r1); mirrored in the oracle SQL
    "q_ts_dups" -> ((s, dir) => {
      val e = events(s, dir)
      e.unionByName(
        e.where(col("event_id") % 100 === 0)
          .withColumn("event_id", col("event_id") + lit(10000000L)))
        .groupBy(unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .agg(count(lit(1)).as("cnt")).where(col("cnt") > 1)
    }),

    "q_events_top_per_user" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      events(s, dir).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("top_event"))
    }),

    // ---- reporting surface (O20/O21/O27) ----
    "q_tri_state" -> ((s, dir) =>
      Reporting.triState(docs(s, dir), col("source"), col("n_chars") > 250)),

    "q_visibility" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(block)
      val states = docs(s, dir)
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("min_id", min(col("doc_id")).over(w))
        .withColumn(
          "state",
          when(length(col("text")) < 20, "ignored")
            .when(col("cnt") === 1, "unique")
            .when(col("doc_id") === col("min_id"), "keep")
            .otherwise("delete"))
      Reporting.visibleStates(states, Seq("keep", "unique")).select(col("doc_id"))
    }),

    "q_human_bytes" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"), Reporting.humanBytes(col("n_chars")).as("size_h"))),

    // ---- natural sort (O3; rows-only: comparator is not SQL-expressible) ----
    "q_natural_sort_topk" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("u", concat(col("source"), lit("/doc"), col("doc_id"), lit(".txt")))
        .orderBy(gf.natural_sort_key(col("u")))
        .limit(50)
        .select(col("doc_id"), col("u"))),

    // ---- signatures / near-dup surface (rows-only; ScalaTest oracles) ----
    "q_minhash_sigs" -> ((s, dir) =>
      Lsh.withSignatures(
        docs(s, dir).select(col("doc_id"), col("text")), Lsh.Config())
        .select(col("doc_id"), col("sigd"), col("simhash"))),

    "q_lsh_buckets" -> ((s, dir) => {
      val cfg = Lsh.Config()
      Lsh.withSignatures(docs(s, dir).select(col("doc_id"), col("text")), cfg)
        .select(
          col("doc_id"),
          posexplode(gf.band_buckets(col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed))
            .as(Seq("band", "bucket")))
    }),

    // the LSH parameter planner: every (bands, rows) factorisation of a
    // 128-permutation budget with its S-curve midpoint — the table a user
    // reads to pick Lsh.Config for a target Jaccard threshold; DuckDB
    // recomputes the closed form over the same divisor pairs
    "q_lsh_plan" -> ((s, _) => LshPlanner.planTable(s, nPerm = 128)),

    // the LSH bucket-cap aggregate itself (O13), driver-verifiable: the
    // bounded map-side top-k must return bit-identically what a window
    // rank over the same (nkp, id) order returns — 16 synthetic buckets,
    // cap 5, total counts every member seen including dropped ones
    "q_bounded_topk" -> ((s, dir) => {
      val d = docs(s, dir).select(
        (col("doc_id") % 16).as("bkey"),
        col("n_chars").as("nkp"),
        col("doc_id").as("id"),
        (col("doc_id") * 31).as("sim"))
      d.groupBy(col("bkey"))
        .agg(gf.bounded_topk(col("nkp"), col("id"), col("sim"), 5).as("tk"))
        .select(col("bkey"), explode(col("tk.ms")).as("m"), col("tk.total").as("total"))
        .select(col("bkey"), col("m.id").as("id"), col("m.simhash").as("sim"), col("total"))
    }),

    "q_near_dup_pairs" -> ((s, dir) => {
      val cfg = Lsh.Config()
      val d = Lsh.withSignatures(
        docs(s, dir).selectExpr("cast(doc_id as string) as url", "text"), cfg)
        .withColumn("nk", gf.natural_sort_key(col("url")))
      // two consumers inside verifiedEdges (touched-url scan + pair melt):
      // pin the narrow candidate frame, as the pipeline's near stage does
      val cands = Lsh.candidatePairs(s, d, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Lsh.verifiedEdges(cands, d, cfg, tau = 0.8)
        .select(col("src"), col("dst"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // driver-oracled since r3: exhaustive 100-gram truth over the RAW corpus
    // (no planting — the natural near-dup pairs share ≥100-char runs)
    "q_substring_pairs" -> ((s, dir) => {
      val cfg = SubstringDup.Config(minSubstr = 100, anchorK = 30)
      val d = docs(s, dir)
        .selectExpr("cast(doc_id as string) as url", "text")
        .withColumn("nk", gf.natural_sort_key(col("url")))
      // pin the two-consumer candidate frame (same shape as q_near_dup_pairs)
      val cands = SubstringDup.candidatePairs(s, d, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      SubstringDup.verifiedEdges(cands, d, cfg)
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
    }),

    // flagship aliases: the SAME oracled planted configurations as the
    // `_full`/`_exact` variants (the former raw un-oracled runs kept two
    // permanent no_oracle rows on the flagship surface — VERDICT r2)
    "q_dedup_decisions" -> (fullPlantedDecisions _),

    // ---- soft-delete sink (O22) driver signal ----
    // the decisions table round-trips through the ACTUAL sink
    // (Sinks.writeDecisions: parquet partitioned by state) and reads
    // back pruned to the delete partition — so the driver oracles the
    // sink write+scan path, not just the upstream decision logic
    "q_deletions" -> ((s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_deletions_").toString
      Sinks.writeDecisions(fullPlantedDecisions(s, dir), out)
      s.read.parquet(out)
        .where(col("state") === "delete")
        .select(col("url"), col("cluster_size"), col("state"))
    }),

    "q_dedup_stats" -> (exactPlantedStats _),

    // ---- similarity search (rows-only; ScalaTest oracle vs brute force) ----
    "q_ann_topk" -> ((s, dir) => {
      val corpus = embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val queries = corpus.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      Similarity.bruteForceTopK(corpus, queries, k = 5)
    }),

    "q_ann_ivf" -> ((s, dir) => {
      val corpus = embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val queries = corpus.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      Similarity.ivfTopK(corpus, queries, nCentroids = 32, nProbe = 4, k = 5)
    }),

    "q_ann_lsh_buckets" -> ((s, dir) =>
      Similarity.lshBuckets(
        embeddings(s, dir).select(col("vec_id"), col("embedding")), bits = 16, seed = 42L)
        .select(col("vec_id"), col("bucket"))),

    // ---- embedding-cosine near-dup (dedup family; planted copies — the
    // raw embeddings' max natural cosine is ~0.51 at both SFs, so τ=0.8
    // admits exactly the planted pairs with no borderline-float risk).
    // Exact variant is DuckDB-oracled (double arrays on both sides for
    // bit-identical dot products); the LSH-bucketed variant is the scale
    // path (rows-only; SimilaritySpec pins its recall vs the exact tier).
    "q_cos_dup_pairs" -> ((s, dir) =>
      Similarity.cosDupPairsExact(plantedEmbeddings(s, dir, toDouble = true), tau = 0.8)),

    "q_cos_dup_pairs_lsh" -> ((s, dir) =>
      Similarity.cosDupPairs(plantedEmbeddings(s, dir, toDouble = false), tau = 0.8)
        .select(col("a_id"), col("b_id"), col("cos"))),

    // ---- SemDeDup (Abbas et al. 2023), driver-verifiable ----
    // Deterministic centroids (k lowest ids) make the whole cluster-then-
    // dedup pass SQL-expressible: same planted copies as q_cos_dup_pairs,
    // double arrays on both sides for bit-identical dot products.
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDedup(plantedEmbeddings(s, dir, toDouble = true), k = 8, tau = 0.8)),

    // ---- SemDeDup end-to-end from RAW TEXT (no embeddings fixture) ----
    // planted exact-copy docs (%20==0, +1000000) embed identically
    // (hashing trick is a pure function of text) -> cosine 1 -> the
    // higher id of each pair deletes; the oracle recomputes embedding,
    // assignment, and deletion rule from the documents table alone
    "q_semdedup_text" -> ((s, dir) => {
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val d = d0.unionByName(d0.where(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      val emb = TextEmbed.hashedEmbedding(d, dim = 64, seed = 7L)
        .select(col("doc_id").as("vec_id"), col("embedding"))
      Similarity.semDedup(emb, k = 8, tau = 0.95)
    }),

    // ---- text -> embedding (hashing trick), exploded for the oracle ----
    // signed md5-bucketed token counts: the projection that lets the
    // ANN/SemDeDup/cosine tier run end-to-end from raw pages; doubles
    // are exact small integers so the compare is bit-stable
    "q_text_embed" -> ((s, dir) =>
      TextEmbed.hashedEmbedding(docs(s, dir), dim = 64, seed = 7L)
        .select(col("doc_id"), posexplode(col("embedding")).as(Seq("i", "v")))),

    // ---- leak-free domain-grouped split ----
    // every page of a registered domain lands on ONE side of the
    // train/valid/test boundary; doc_id%7==3 pages get a `www.` host so
    // the ≥3-label → registered-domain collapse is exercised
    // (www.SRC.example must split WITH SRC.example), and %7∈{1,5} pages
    // live under co.uk — www.SRC.co.uk must split WITH SRC.co.uk via the
    // public-suffix table, NOT fuse into one 'co.uk' pseudo-domain. One
    // md5 projection — DuckDB replays the draw bit-for-bit.
    "q_domain_split" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("source"))
      val u = when(col("doc_id") % 7 === 3,
        concat(lit("https://www."), col("source"), lit(".example/d"),
          pmod(col("doc_id"), lit(5)), lit("/doc"), col("doc_id"), lit(".html")))
        .when(col("doc_id") % 7 === 5,
          concat(lit("https://www."), col("source"), lit(".co.uk/doc"),
            col("doc_id"), lit(".html")))
        .when(col("doc_id") % 7 === 1,
          concat(lit("https://"), col("source"), lit(".co.uk/doc"),
            col("doc_id"), lit(".html")))
        .otherwise(urlCol)
      Splits.domainSplit(base.withColumn("url", u))
        .select(col("doc_id"), col("domain"), col("split"))
    }),

    // ---- UT1-style domain blocklist ----
    // per-doc subdomains (h<id%97>.) under 13 registered domains
    // (site<id%13>.example); three domains listed — every subdomain of a
    // listed site must flag — plus one HOST-level entry
    // (h40.site1.example) that must flag exactly doc 40 while the rest of
    // site1.example passes. %11==6 docs live under co.uk shops
    // (h<k>.shop<m>.co.uk): the listed 'shop4.co.uk' must flag exactly
    // shop4's subdomains — possible only with the public-suffix table
    // (the two-label cut collapsed every UK site into 'co.uk')
    "q_domain_blocklist" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(11)) === 6,
          concat(lit("https://h"), pmod(col("doc_id"), lit(97)),
            lit(".shop"), pmod(col("doc_id"), lit(13)),
            lit(".co.uk/p"), col("doc_id")))
          .otherwise(concat(lit("https://h"), pmod(col("doc_id"), lit(97)),
            lit(".site"), pmod(col("doc_id"), lit(13)),
            lit(".example/p"), col("doc_id"))).as("url"))
      val blocked = Seq("site2.example", "site5.example", "site11.example",
        "h40.site1.example", "shop4.co.uk").toDF("domain")
      QualityFilters.flagBlockedDomains(d, blocked)
        .select(col("doc_id"), col("domain"), col("blocked"))
    }),

    // ---- domain-level quality gate ----
    // same subdomain construction; docs on site3/site6 domains truncate
    // to 20 words, dragging those DOMAINS' mean token count under the
    // threshold — a content farm drops whole while a good site keeps its
    // occasional short page. Integral scores keep the mean exact. The
    // two farm sites live under co.uk: the public-suffix table keeps
    // site3.co.uk and site6.co.uk as SEPARATE pooled means (the old
    // two-label cut would have fused them — and every other UK site —
    // into one 'co.uk' pseudo-domain mean).
    "q_domain_quality" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val d = docs(s, dir).select(
        col("doc_id"),
        concat(lit("https://h"), pmod(col("doc_id"), lit(97)),
          lit(".site"), pmod(col("doc_id"), lit(13)),
          when(pmod(col("doc_id"), lit(13)).isin(3, 6), lit(".co.uk/p"))
            .otherwise(lit(".example/p")), col("doc_id")).as("url"),
        when(pmod(col("doc_id"), lit(13)).isin(3, 6),
          array_join(slice(ws, 1, 20), " ")).otherwise(col("text")).as("text"))
        .withColumn("score", size(split(col("text"), " ")))
      QualityFilters.domainQualityFlag(d, minMean = 60.0)
        .select(col("doc_id"), col("domain"), col("domain_mean"),
          col("low_quality_domain"))
    }),

    // ---- C4 blocklist filter ----
    // planted hits (%11==4) and word-boundary NON-hits ("casinos",
    // "viagras": %11==7) — boundaries are explicit [^a-z0-9]-or-edge
    // alternatives, identical under Java regex and RE2
    "q_blocklist" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 11 === 4,
          concat(col("text"), lit(" win the casino lottery now")))
          .when(col("doc_id") % 11 === 7,
            concat(col("text"), lit(" casinos and viagras are words")))
          .otherwise(col("text")).as("text"))
      QualityFilters.blocklistFlag(planted)
    }),

    // ---- in-engine Naive Bayes quality gate ----
    // %5==3 docs become spam fixtures; EVEN doc_ids train (so the label-0
    // class trains on the id≡8 (mod 10) spam and the id≡3 spam is held
    // out), everything scores. Scoring sums integer micro-llrs, so the
    // DuckDB oracle retrains and rescores bit-identically.
    "q_nb_quality" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 5 === 3, lit(nbSpamFix))
          .otherwise(col("text")).as("text"))
      val labeled = planted.where(col("doc_id") % 2 === 0)
        .withColumn("label", (col("doc_id") % 5 =!= 3).cast("int"))
      NaiveBayes.score(planted, NaiveBayes.train(labeled))
    }),

    // ---- host-scoped boilerplate strip (CCNet deployment granularity) ----
    // every doc gets a per-host footer (host-frequent → strips) and every
    // %10==0 doc a corpus-wide quote that is RARE within each host — it
    // must survive, the semantic the global stripper cannot express.
    "q_host_boilerplate" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val chunked = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
        .withColumn("lines0", transform(
          sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
      val planted = chunked
        .withColumn("lines", concat(col("lines0"),
          array(concat(lit("all rights reserved by "), col("source")))))
        .withColumn("lines",
          when(col("doc_id") % 10 === 0,
            concat(col("lines"), array(lit("a famous quote cited everywhere"))))
            .otherwise(col("lines")))
        .select(col("source").as("host"),
          col("doc_id").cast("string").as("url"),
          array_join(col("lines"), "\n").as("text"))
      operators.LineDedup.stripFrequentLinesPerScope(planted, "host", maxDf = 10)
        .select(col("url"), col("kept_text"), col("n_lines"), col("n_stripped"))
    }),

    // ---- epoch-weighted mixing (upsampling) ----
    // weights > 1 repeat strata (en ×2.5, zh ×3), the standard LLM mix
    // spec stratifiedSample cannot express; es absent → dropped.
    "q_epoch_mix" -> ((s, dir) =>
      Mixing.epochSample(
        docs(s, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Map("en" -> 2.5, "de" -> 1.0, "fr" -> 0.25, "zh" -> 3.0),
        seed = 11L)),

    // ---- corpus datacard (composition report) ----
    "q_datacard" -> ((s, dir) =>
      Datacard.composition(
        docs(s, dir).select(col("lang"), col("source"), col("text")))),

    // ---- token-budget mixture solver ----
    // n_chars as the per-doc token mass; zh targeted far above its
    // availability so the maxEpochs cap fires at sf0.001
    "q_mix_solve" -> ((s, dir) =>
      Mixing.solveEpochWeights(
        docs(s, dir).select(col("lang"), col("n_chars")),
        "lang", col("n_chars"),
        Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2),
        budgetTokens = 1000000L, maxEpochs = 4.0)),

    // ---- score-weighted (soft-quality) sampling ----
    // keep probability = min(1, n_chars/1000): long docs certain, short
    // docs proportionally — the md5 draw replayed bit-for-bit in SQL
    "q_quality_sample" -> ((s, dir) =>
      Mixing.sampleByProb(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id",
        least(lit(1.0), col("n_chars") / lit(1000.0)),
        seed = 17L)),

    // ---- budgeted mix end-to-end (solver → epoch sample) ----
    // the q_mix_solve weights drive the actual upsample; DuckDB re-derives
    // the weights AND replays the md5 epoch draw bit-for-bit
    "q_budget_mix" -> ((s, dir) =>
      Mixing.epochSampleByBudget(
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "doc_id", col("n_chars"),
        Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2),
        budgetTokens = 1000000L, maxEpochs = 4.0, seed = 13L)),

    // ---- within-document repeated-line strip ----
    // plant: re-append each doc's FIRST 8-word line at the end — every
    // doc has at least one intra-doc repeat, cut by first-occurrence rule
    "q_within_doc_dedup" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val planted = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("lines0", transform(
          sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
          i => array_join(slice(ws, i * lit(8) + 1, lit(8)), " ")))
        .select(col("doc_id").cast("string").as("url"),
          array_join(concat(col("lines0"), slice(col("lines0"), 1, 1)), "\n")
            .as("text"))
      operators.LineDedup.stripRepeatedLinesWithinDoc(planted)
    }),

    // ---- containment join (quote / subsumed-page detection) ----
    // %20==0 docs plant a "quote" item from their first 10 words: fully
    // contained in the source (cont = 1.0) while Jaccard vs the full page
    // is tiny — the directional semantics the symmetric join cannot see
    "q_containment" -> ((s, dir) => {
      val base = docs(s, dir).where(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("item_id"),
          SetSimJoin.tokenSet(col("text")).as("toks"))
      val quotes = docs(s, dir).where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 8000000L).as("item_id"),
          SetSimJoin.tokenSet(
            array_join(slice(split(col("text"), " "), 1, 10), " ")).as("toks"))
      SetSimJoin.containmentPairs(base.unionByName(quotes), tau = 0.8)
    }),

    // ---- unicode NFC normalization (pre-hash canonicalization) ----
    // even doc_ids get a DECOMPOSED suffix (e + U+0301, i + U+0308) that
    // NFC composes (changed=true); odd get the composed twin (changed=
    // false). norm_sha shows the two halves dedup together post-NFC.
    "q_unicode_dedup" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" café naïve"))
            .otherwise(lit(" café naïve"))).as("text"))
      planted.select(col("doc_id"),
        functions.gf.unicode_norm(col("text"), "NFC").as("norm_text"),
        (functions.gf.unicode_norm(col("text"), "NFC") =!= col("text")).as("changed"),
        sha2(functions.gf.unicode_norm(col("text"), "NFC"), 256).as("norm_sha"))
    }),

    // ---- DSIR importance weighting (Xie et al. 2023) ----
    // target slice = %9==2 (planted with target-domain vocab); %9==5 docs
    // carry the SAME vocab but sit outside the slice — the held-out
    // lookalikes the weight must surface. raw model = the scored corpus.
    // Integer micro-weights: the oracle retrains both bucket models and
    // rescores bit-identically.
    "q_dsir" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 9 === 2 || col("doc_id") % 9 === 5,
          concat(lit(dsirTargetFix), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      val target = planted.where(col("doc_id") % 9 === 2)
      Dsir.score(planted, Dsir.weights(target, planted))
    }),

    // ---- keep-best-copy election ----
    // same planted dup groups as q_exact_dup_groups, but the survivor is
    // the max-quality member (q = (doc_id*31)%101, differing across
    // copies), not the natural-order min — the FineWeb keep policy.
    "q_keep_best" -> ((s, dir) => {
      val d = docsPlanted(s, dir).select(
        col("doc_id"),
        ((col("doc_id") * 31) % 101).as("q"),
        md5(col("text")).as("sha"))
      ExactDedup.bestPerKey(d, "sha", "q", "doc_id")
        .select(col("doc_id"), col("sha"), col("q"))
    }),

    // ---- exact set-similarity self-join (prefix filtering) ----
    // τ=0.8 over whole-doc token sets (doc_id%4==0 slice); %16==0 items
    // get a two-junk-token copy (J = n/(n+2) ≥ 0.8 at n ≥ 8 distinct
    // tokens). The oracle is the EXHAUSTIVE pairwise Jaccard — zero-miss
    // exactness is the contract under test.
    "q_setsim_pairs" -> ((s, dir) =>
      SetSimJoin.similarPairs(setsimItems(docs(s, dir)), tau = 0.8)),

    "q_setsim_keep" -> ((s, dir) => {
      val items = setsimItems(docs(s, dir))
      SetSimJoin.keepEarliest(items, SetSimJoin.similarPairs(items, tau = 0.8))
    }),

    // ---- cross-table (batch-vs-corpus) exact fuzzy-ingest tier ----
    // corpus = %4==0 token sets; probe batch = near-copies (%16==0 + two
    // corpus-unseen junk tokens, id+7000000) ∪ the %4==1 slice. Oracle:
    // exhaustive CROSS Jaccard — the R-S prefix filter must lose nothing.
    "q_setsim_across" -> ((s, dir) => {
      val (p, c) = setsimAcrossTables(docs(s, dir))
      SetSimJoin.similarPairsAcross(p, c, tau = 0.8)
    }),

    "q_novel_docs" -> ((s, dir) => {
      val (p, c) = setsimAcrossTables(docs(s, dir))
      SetSimJoin.keepNovel(p, SetSimJoin.similarPairsAcross(p, c, tau = 0.8))
    }),

    // ---- exact edit-distance join (Ed-Join-style q-gram prefix filter) ----
    // k=2 over synthetic urls ∪ three planted edit slices (sub/del/2×ins);
    // the natural truth is urls differing in one or two doc_id digits. The
    // oracle is the EXHAUSTIVE length-filtered levenshtein self-join —
    // zero-miss exactness is the contract under test.
    "q_edit_pairs" -> ((s, dir) =>
      EditSimJoin.editPairs(editItems(docs(s, dir)), k = 2)),

    "q_edit_keep" -> ((s, dir) => {
      val items = editItems(docs(s, dir))
      SetSimJoin.keepEarliest(items, EditSimJoin.editPairs(items, k = 2))
    }),

    // ---- WEIGHTED (tf) Jaccard set-similarity join ----
    // τ=0.8 over whole-doc token BAGS (doc_id%4==2 slice); %16==2 items
    // get a copy with its first two tokens REPEATED — set-Jaccard calls
    // the twins identical (J=1.0), only the multiset semantics scores
    // them n/(n+2). Oracle: exhaustive pairwise Σmin/Σmax.
    "q_setsim_weighted" -> ((s, dir) =>
      SetSimJoin.similarPairs(
        SetSimJoin.multisetItems(setsimWeightedItems(docs(s, dir))), tau = 0.8)),

    // ---- heavy hitters: Misra–Gries sketch pass + exact recount ----
    // items = tokens, with the %5!=0 slice suffixed per-doc into a
    // unique tail growing with the corpus (so the sketch genuinely
    // compresses at every SF). cap=4096 certifies minCount=120 at any
    // corpus this driver runs: worst-case max_err ≤ N/(cap+1) — 66 even
    // at the sf0.1 bench corpus (N=271k), 7 at the sf0.01 gate. The
    // recount makes the output EXACT, so the oracle is a plain
    // GROUP BY ... HAVING.
    "q_heavy_hitters" -> ((s, dir) => {
      val items = docs(s, dir)
        .select(col("doc_id"),
          explode(SetSimJoin.tokenBag(col("text"))).as("tok"))
        .select(when(col("doc_id") % 5 === 0, col("tok"))
          .otherwise(concat(col("tok"), lit("#"), col("doc_id").cast("string")))
          .as("item"))
      HeavyHitters.frequentItems(items, "item", cap = 4096, minCount = 120)
    }),

    // ---- host-graph centrality: exact integer PageRank ----
    // hosts = doc_id % 40 residues; edges per residue r < 37 (h37..h39
    // are dangling sinks): r→(7r+3)%40, r→(13r+5)%40, plus a hub edge
    // r→h0 when r%4==0 (in-degree skew). 10 synchronous rounds of the
    // pure-integer recurrence; the oracle replays every round as a CTE.
    "q_pagerank" -> ((s, dir) => {
      val res = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
      def h(c: org.apache.spark.sql.Column) =
        concat(lit("h"), c.cast("string"))
      val nodes = res.select(h(col("r")).as("host"))
      val live = res.where(col("r") < 37)
      val edges = live.select(h(col("r")).as("src"),
          h((col("r") * 7 + 3) % 40).as("dst"))
        .union(live.select(h(col("r")).as("src"),
          h((col("r") * 13 + 5) % 40).as("dst")))
        .union(live.where(col("r") % 4 === 0)
          .select(h(col("r")).as("src"), lit("h0").as("dst")))
      LinkGraph.pageRank(nodes, edges, rounds = 10)
    }),

    // ---- Stupid Backoff word-trigram LM (Brants et al. 2007) ----
    // train slice = %11==4 (planted with the target phrase); %11==8 docs
    // carry the SAME phrase outside the slice — their trigrams hit the
    // model and they must outscore their unplanted peers. Integer
    // micro-nat sums: the oracle retrains and rescores bit-identically.
    "q_ngram_lm" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 11 === 4 || col("doc_id") % 11 === 8,
          concat(lit(dsirTargetFix), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      NgramLm.score(planted,
        NgramLm.train(planted.where(col("doc_id") % 11 === 4)))
    }),

    // ---- link discovery from raw html (host-grain edge list) ----
    // pages synthesized deterministically from documents: every page at
    // host h(r) links to h((7r+3)%40) (double-quoted href), h((13r+5)%40)
    // (single-quoted), and one relative link that must be dropped
    "q_linkgraph_html" -> ((s, dir) => {
      val r = col("doc_id") % 40
      val pages = docs(s, dir).select(
        concat(lit("http://h"), r.cast("string"), lit(".example/p"),
          col("doc_id").cast("string")).as("url"),
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><a href=\"http://h"), ((r * 7 + 3) % 40).cast("string"),
          lit(".example/x\">t</a><a href='http://h"),
          ((r * 13 + 5) % 40).cast("string"),
          lit(".example/y'>u</a><a href=\"/rel\">v</a></body></html>"))
          .as("html"))
      LinkGraph.hostEdges(pages)
    }),

    // ---- crawl-frontier discovery (the crawl-loop closure) ----
    // every page links to its successor page (#fragment to strip; crawled
    // unless it is the max id), an uncrawled /new page behind an
    // uppercase host + utm param (canonicalization must fold both), and
    // a relative link (drops); seen set = the crawled urls themselves
    "q_frontier" -> ((s, dir) => {
      val r = col("doc_id") % 40
      val next = col("doc_id") + 1
      val pages = docs(s, dir).select(
        concat(lit("http://h"), r.cast("string"), lit(".example/p"),
          col("doc_id").cast("string")).as("url"),
        concat(lit("<html><body><a href=\"http://h"),
          (next % 40).cast("string"), lit(".example/p"),
          next.cast("string"),
          lit("#sec\">n</a><a href='http://H"),
          ((r * 13 + 5) % 40).cast("string"), lit(".example/new"),
          (col("doc_id") % 7).cast("string"),
          lit("?utm_source=x'>u</a><a href=\"/rel\">v</a></body></html>"))
          .as("html"))
      LinkGraph.frontier(pages, pages.select(col("url")))
    }),

    // ---- crawl-loop capstone: discover → robots-filter → budget ----
    // frontier candidates gated by RFC 9309 rules (even-numbered hosts
    // disallow /new), then the per-host fetch cap: top-2 by in-degree —
    // the next-fetch list a polite crawler hands its fetchers
    "q_fetch_plan" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val r = col("doc_id") % 40
      val next = col("doc_id") + 1
      val pages = docs(s, dir).select(
        concat(lit("http://h"), r.cast("string"), lit(".example/p"),
          col("doc_id").cast("string")).as("url"),
        concat(lit("<html><body><a href=\"http://h"),
          (next % 40).cast("string"), lit(".example/p"),
          next.cast("string"),
          lit("#sec\">n</a><a href='http://H"),
          ((r * 13 + 5) % 40).cast("string"), lit(".example/new"),
          (col("doc_id") % 7).cast("string"),
          lit("?utm_source=x'>u</a><a href=\"/rel\">v</a></body></html>"))
          .as("html"))
      val hosts = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
      val robots = hosts.where(col("r") % 2 === 0).select(
        concat(lit("h"), col("r").cast("string"), lit(".example")).as("host"),
        lit("User-agent: *\nDisallow: /new").as("robots_txt"))
      val allowed = RobotsTxt.gate(
        LinkGraph.frontier(pages, pages.select(col("url"))),
        RobotsTxt.rules(robots))
        .where(!col("blocked"))
        .withColumn("host", Splits.host(col("url")))
      val w = Window.partitionBy(col("host"))
        .orderBy(col("n_refs").desc, col("url"))
      allowed.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 2)
        .select(col("host"), col("url"), col("n_refs"),
          col("rank").cast("long").as("rank"))
    }),

    // ---- anchor-text corpus (per-target rollup from raw html) ----
    // pages synthesized from documents: one anchor whose text varies by
    // doc_id%3 (with case/space mess the normalizer must collapse), one
    // host-indexed anchor, one relative link (drops), one empty-text
    // anchor (drops)
    "q_anchor_text" -> ((s, dir) => {
      val r = col("doc_id") % 40
      val anchor = when(col("doc_id") % 3 === 0, lit(" Read  More "))
        .when(col("doc_id") % 3 === 1, lit("Click HERE"))
        .otherwise(lit("details"))
      val pages = docs(s, dir).select(
        concat(lit("http://h"), r.cast("string"), lit(".example/p"),
          col("doc_id").cast("string")).as("url"),
        concat(lit("<html><p>x</p><a href=\"http://h"),
          ((r * 7 + 3) % 40).cast("string"), lit(".example/x\">"), anchor,
          lit("</a><a href='http://h"), ((r * 13 + 5) % 40).cast("string"),
          lit(".example/y'>site "), r.cast("string"),
          lit("</a><a href=\"/rel\">v</a><a href=\"http://h"),
          ((r + 1) % 40).cast("string"), lit(".example/z\">  </a></html>"))
          .as("html"))
      LinkGraph.anchorSummary(LinkGraph.anchorEdges(pages))
    }),

    // ---- meta-robots noindex gate (crawl politeness) ----
    // %7==2 name-first noindex, %7==5 content-first UPPERCASE noindex,
    // %7==3 nofollow only (no gate), %7==1 "noindex" under another meta
    // name (no gate)
    "q_noindex" -> ((s, dir) => {
      val meta = when(col("doc_id") % 7 === 2,
        lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .when(col("doc_id") % 7 === 5,
          lit("<meta content='NOINDEX' name='robots'>"))
        .when(col("doc_id") % 7 === 3,
          lit("<meta name=\"robots\" content=\"nofollow\">"))
        .when(col("doc_id") % 7 === 1,
          lit("<meta name=\"keywords\" content=\"noindex discussion\">"))
        .otherwise(lit(""))
      docs(s, dir).select(
        urlCol.as("url"),
        concat(lit("<html><head>"), meta, lit("</head><body>"),
          col("text"), lit("</body></html>")).as("html"))
        .select(col("url"),
          WebNormalize.noindexFlag(col("html")).as("noindex"))
    }),

    // ---- host-grain crawl datacard (Datacard.byKey) ----
    "q_host_datacard" -> ((s, dir) =>
      Datacard.byKey(
        docs(s, dir).select(
          concat(lit("h"), (col("doc_id") % 40).cast("string"),
            lit(".example")).as("host"),
          col("text")),
        Seq("host"))),

    // ---- cross-host mirror detection (Mirrors.hostOverlap) ----
    // hosts h{r}.example carry the docs; every %9==5 doc is re-planted on
    // a dedicated mirror host m{r}.example, so (h{r}, m{r}) pairs must
    // surface with near-1000 containment; natural cross-host exact dups
    // add organic pairs; digests on > 8 hosts are cap-dropped (mirrored
    // in the oracle)
    "q_mirror_hosts" -> ((s, dir) =>
      Mirrors.hostOverlap(mirrorPages(s, dir),
        maxHostsPerDigest = 8, minShared = 2)),

    // ---- encoding-damage (mojibake) gate ----
    // %11==3 docs get a damaged tail: one U+FFFD, two C0 controls, two
    // UTF-8-as-Latin-1 pairs (Ã¯, Ã�) = 5 damage chars; the 2-permille
    // rule then flags exactly the short planted docs (len < 2500), so the
    // fixture exercises both verdicts
    "q_mojibake" -> ((s, dir) => {
      val tail = MojibakeTail
      QualityFilters.mojibake(
        docs(s, dir).select(col("doc_id"),
          when(col("doc_id") % 11 === 3, concat(col("text"), lit(tail)))
            .otherwise(col("text")).as("text")))
    }),

    // ---- title-blocking dedup (syndication pre-filter) ----
    // pages carry a <title> built from the text's first five words; %13==6
    // docs are re-planted with an APPENDED body (different digest, same
    // title), so (source, normalized-title) blocks surface the syndicated
    // copies that exact dedup misses; natural first-5-word collisions in
    // the prose join them — the oracle replays both
    "q_title_dedup" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
      val planted = base.unionByName(
        base.where(col("doc_id") % 13 === 6)
          .withColumn("doc_id", col("doc_id") + lit(8000000L))
          .withColumn("text", concat(col("text"), lit(" republished today"))))
      val pages = planted.select(col("doc_id"), col("source"),
        concat(lit("<html><head><title> "),
          array_join(slice(split(col("text"), " "), 1, 5), " "),
          lit(" </title></head><body>"), col("text"),
          lit("</body></html>")).as("html"))
      pages
        .select(col("doc_id"), col("source"),
          WebNormalize.titleOf(col("html")).as("title"))
        .withColumn("tkey", WebNormalize.normalText(col("title")))
        .groupBy(col("source"), col("tkey"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep_id"))
        .where(col("n") > 1)
    }),

    // ---- soft-404 gate (error shells served as HTTP 200) ----
    // %17==5 docs BECOME short error shells (flagged); %17==6 docs merely
    // DISCUSS a 404 at full length (pattern hits, word floor saves them);
    // everything else is clean prose
    "q_soft404" -> ((s, dir) => {
      val t = when(col("doc_id") % 17 === 5,
          lit(Soft404Shell))
        .when(col("doc_id") % 17 === 6,
          concat(lit("404 discussion: "), col("text")))
        .otherwise(col("text"))
      docs(s, dir).select(col("doc_id"),
        WebNormalize.soft404Flag(t).as("soft404"))
    }),

    // ---- crawl-trap families (calendar/pagination url explosions) ----
    // every doc keeps its normal template url; %6==2 docs add a calendar
    // url with year/month/item/fragment digits — both families collapse
    // onto digit-free trap keys whose member counts the groupBy reports
    "q_crawl_traps" -> ((s, dir) => {
      val cal = docs(s, dir).where(col("doc_id") % 6 === 2).select(
        concat(lit("https://"), col("source"), lit(".example/cal/"),
          (lit(2000) + col("doc_id") % 5).cast("string"), lit("/"),
          (col("doc_id") % 12).cast("string"), lit("/item"),
          col("doc_id").cast("string"), lit("#frag"),
          col("doc_id").cast("string")).as("url"))
      docs(s, dir).select(urlCol.as("url")).unionByName(cal)
        .withColumn("trap_key", WebNormalize.urlTrapKey(col("url")))
        .groupBy(col("trap_key"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("url")).as("n_distinct"))
        .where(col("n_urls") >= 5)
    }),

    // ---- host language purity (mixed-language site detection) ----
    // doc_id%40 hosts × the fixture's 5 langs: the majority-language share
    // per host, deterministic majority election (count DESC, lang ASC).
    // Low purity flags hosts whose langid labels disagree — usually a
    // mis-crawled or machine-translated site a lang-filtered corpus wants
    // reviewed at host grain, not page grain
    "q_host_lang_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cell = docs(s, dir)
        .select(concat(lit("h"), (col("doc_id") % 40).cast("string"),
          lit(".example")).as("host"), col("lang"))
        .groupBy(col("host"), col("lang"))
        .agg(count(lit(1)).as("n"))
      cell
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("host"))
            .orderBy(col("n").desc, col("lang"))))
        .withColumn("n_docs",
          sum(col("n")).over(Window.partitionBy(col("host"))))
        .where(col("rk") === 1)
        .withColumn("purity_permille", expr("(n * 1000) div n_docs"))
        .select(col("host"), col("lang").as("major_lang"),
          col("n").as("n_major"), col("n_docs"), col("purity_permille"))
    }),

    // ---- end-to-end web-politeness + hygiene funnel ----
    // the crawl-side twin of q_curation_chain: pages over docsPlanted get
    // noindex metas (%31==6), soft-404 shells (%17==5), mojibake tails
    // (%11==3), robots-gated paths (doc_id%3 over the q_robots_gate host
    // classes) and titles from the text's first five words (exact-dup
    // plants share titles → title_dup verdicts); ONE verdict per page
    // from the ordered chain
    "q_web_funnel" -> ((s, dir) => {
      val (pages, robots) = webFunnelPages(s, dir)
      WebFunnel.verdicts(pages, RobotsTxt.rules(robots))
    }),
    "q_web_funnel_stats" -> ((s, dir) => {
      val (pages, robots) = webFunnelPages(s, dir)
      WebFunnel.stats(pages, RobotsTxt.rules(robots))
    }),

    // ---- incremental NEAR-dup (batch vs corpus LSH probe) ----
    // corpus = the %4==0 long-doc slice; batch = the %4==1 slice (mostly
    // novel, minus natural cross-slice near-dups) + one-word-appended
    // copies of every %16==0 corpus doc (J ≈ 0.97). Engine: band-bucket
    // probe against the corpus index + exact-Jaccard verify + best-match
    // election; oracle: EXHAUSTIVE batch×corpus shingle Jaccard — the
    // banding recall argument (1 − 5·10⁻⁸ at J ≥ 0.8) is what makes them
    // equal
    "q_incremental_near" -> ((s, dir) => {
      val base = docs(s, dir).where(length(col("text")) >= 200)
      val corpus = base.where(col("doc_id") % 4 === 0)
        .select(concat(lit("c"), col("doc_id").cast("string")).as("url"),
          col("text"))
      val batch = base.where(col("doc_id") % 4 === 1)
        .select(concat(lit("b"), col("doc_id").cast("string")).as("url"),
          col("text"))
        .unionByName(
          base.where(col("doc_id") % 16 === 0)
            .select(
              concat(lit("b"),
                (col("doc_id") + lit(7100000L)).cast("string")).as("url"),
              concat(col("text"), lit(" appended")).as("text")))
      IncrementalNear.vsCorpus(batch, corpus)
    }),

    // ---- NEAR-dup decontamination (paraphrase-grade leakage) ----
    // the 13-gram decontaminate catches verbatim leaks; this catches the
    // near-verbatim tier by probing TRAIN docs against the benchmark as
    // the [[IncrementalNear]] corpus. benchmark = the %37==3 long-doc
    // slice; train = the rest + planted one-word-appended benchmark
    // copies (J ≈ 0.97 — "paraphrased" leaks) that MUST flag; natural
    // train↔benchmark near-dups flag too (both sides replay them)
    "q_near_decontaminate" -> ((s, dir) => {
      val base = docs(s, dir).where(length(col("text")) >= 200)
      val bench = base.where(col("doc_id") % 37 === 3)
        .select(concat(lit("bm"), col("doc_id").cast("string")).as("url"),
          col("text"))
      val train = base.where(col("doc_id") % 37 =!= 3)
        .select(concat(lit("tr"), col("doc_id").cast("string")).as("url"),
          col("text"))
        .unionByName(base.where(col("doc_id") % 37 === 3)
          .select(
            concat(lit("tr"),
              (col("doc_id") + lit(7300000L)).cast("string")).as("url"),
            concat(col("text"), lit(" paraphrased")).as("text")))
      IncrementalNear.vsCorpus(train, bench)
        .select(col("url"), col("dup_of").as("leaks_benchmark"),
          col("jaccard"), (!col("is_novel")).as("contaminated"))
    }),

    // ---- dedup cluster-size histogram (run-audit report) ----
    // Engine-emitted: the exact-only DedupPipeline decisions rolled up to
    // (cluster_size → n_clusters, n_docs) over live docs — the first
    // chart a dedup run report shows (how much mass sits in big clusters)
    "q_cluster_histogram" -> ((s, dir) => {
      val pages = pagesFrom(docsPlanted(s, dir))
      DedupPipeline.run(
        s, pages,
        DedupConfig(minLen = 60, enableNear = false, enableSubstr = false),
        fromHtml = true)
        .decisions
        .where(col("state") =!= "ignored")
        .groupBy(col("cluster_size").cast("long").as("cluster_size"))
        .agg(countDistinct(col("cluster")).as("n_clusters"),
          count(lit(1)).as("n_docs"))
    }),

    // ---- host crawl-budget scoreboard (crawler feedback composition) ----
    // per host: docs, distinct content, soft-404 shells → integer
    // unique/soft404 permilles and a priority = unique − soft404. The
    // planted exact dups (+1M/+2M ids ≡ 0 mod 40 → SAME host) depress
    // unique_permille; the %17==5 error shells depress priority — the
    // table a crawl scheduler reads to spend its next epoch's fetches
    "q_crawl_budget" -> ((s, dir) => {
      val withShells = docsPlanted(s, dir).select(
        concat(lit("h"), (col("doc_id") % 40).cast("string"),
          lit(".example")).as("host"),
        when(col("doc_id") % 17 === 5,
          lit(Soft404Shell))
          .otherwise(col("text")).as("text"))
      withShells.groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct"),
          sum(when(WebNormalize.soft404Flag(col("text")), 1L)
            .otherwise(0L)).as("n_soft404"))
        .withColumn("unique_permille", expr("(n_distinct * 1000) div n_docs"))
        .withColumn("soft404_permille", expr("(n_soft404 * 1000) div n_docs"))
        .withColumn("priority_permille",
          col("unique_permille") - col("soft404_permille"))
    }),

    // ---- mirror retirement verdicts (the action half) ----
    // same plant as q_mirror_hosts; every m{r}.example mirror host must
    // retire against its h{r}.example origin (strictly smaller), origins
    // and unmirrored hosts stay
    "q_mirror_retire" -> ((s, dir) =>
      Mirrors.retireMirrors(mirrorPages(s, dir),
        maxHostsPerDigest = 8, minShared = 2, minPermille = 800L)),

    // ---- link reciprocity (link-farm signal) ----
    // deterministic host graph: r → (7r+3)%40 and (13r+5)%40; the %5==0
    // slice plants reverse edges so reciprocated pairs exist
    "q_reciprocity" -> ((s, dir) => {
      def h(c: org.apache.spark.sql.Column) =
        concat(lit("h"), c.cast("string"))
      val base = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
      val edges = base
        .select(h(col("r")).as("src"), h((col("r") * 7 + 3) % 40).as("dst"))
        .unionByName(base.select(h(col("r")).as("src"),
          h((col("r") * 13 + 5) % 40).as("dst")))
        .unionByName(base.where(col("r") % 5 === 0)
          .select(h((col("r") * 7 + 3) % 40).as("src"), h(col("r")).as("dst")))
      LinkGraph.reciprocity(edges)
    }),

    // ---- jusText-style paragraph link density from raw html ----
    // par 0: the doc text (content, link-free); par 1: anchor length
    // varies by doc_id%2 so the 50% flag flips across docs; par 2: pure
    // nav chrome (always boiler)
    "q_link_density" -> ((s, dir) => {
      val anchor = when(col("doc_id") % 2 === 0, lit("ok"))
        .otherwise(lit("a much longer anchor text segment"))
      val pages = docs(s, dir).select(
        urlCol.as("url"),
        concat(lit("<html><p>"), col("text"),
          lit("</p><p>see <a href=\"/x\">"), anchor,
          lit("</a> tail words</p><p class=\"nav\"><a href=\"/a\">Home</a>"),
          lit("<a href=\"/b\">About</a></p></html>")).as("html"))
      QualityFilters.paragraphLinkDensity(pages)
    }),

    // ---- robots.txt exclusion gate (RFC 9309 star-agent subset) ----
    // hosts h{r}: r%4==0 star group Disallow /private + Allow
    // /private/pub carve-out (+ a bot-only group that must not leak),
    // r%4==1 bot-only (nothing applies), r%4==2 multi-UA group naming *,
    // r%4==3 no robots at all; page paths rotate /private, /private/pub,
    // /secret by doc_id%3 (gcd(3,40)=1, so every host class sees every
    // path — including the Allow-precedence carve-out on class-0 hosts)
    "q_robots_gate" -> ((s, dir) => {
      val r = col("doc_id") % 40
      val pages = docs(s, dir).select(
        concat(lit("http://h"), r.cast("string"), lit(".example"),
          when(col("doc_id") % 3 === 0, lit("/private/p"))
            .when(col("doc_id") % 3 === 1, lit("/private/pub/p"))
            .otherwise(lit("/secret/p")),
          col("doc_id").cast("string")).as("url"))
      val hosts = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
      val robots = hosts.where(col("r") % 4 =!= 3).select(
        concat(lit("h"), col("r").cast("string"), lit(".example")).as("host"),
        when(col("r") % 4 === 0, lit(
          "User-agent: *\nDisallow: /private\nAllow: /private/pub\n\n" +
            "User-agent: bot\nDisallow: /"))
          .when(col("r") % 4 === 1, lit("User-agent: bot\nDisallow: /"))
          .otherwise(lit(
            "User-agent: bot\nUser-agent: *\nDisallow: /secret"))
          .as("robots_txt"))
      RobotsTxt.gate(pages, RobotsTxt.rules(robots))
    }),

    // ---- robots Crawl-delay extraction (per-host rate limit) ----
    // r%4==0 hosts declare a star-group delay (r%7+1) plus a bot-only 99
    // that must NOT leak; r%4==1 is bot-only (no star delay); r%4==2 has
    // a non-numeric value (drops); r%4==3 a star group with no delay
    "q_crawl_delay" -> ((s, dir) => {
      val hosts = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
      val robots = hosts.select(
        concat(lit("h"), col("r").cast("string"), lit(".example")).as("host"),
        when(col("r") % 4 === 0,
          concat(lit("User-agent: *\nDisallow: /private\nCrawl-delay: "),
            ((col("r") % 7) + 1).cast("string"),
            lit("\n\nUser-agent: bot\nCrawl-delay: 99")))
          .when(col("r") % 4 === 1, lit("User-agent: bot\nCrawl-delay: 5"))
          .when(col("r") % 4 === 2, lit("User-agent: *\nCrawl-delay: fast"))
          .otherwise(lit("User-agent: *\nDisallow:"))
          .as("robots_txt"))
      RobotsTxt.crawlDelays(robots)
    }),

    // ---- training-sequence chunking (sliding windows, tail rule) ----
    // 40-token windows, stride 30: docs under 40 tokens stay whole, the
    // tail extends the last window's overlap instead of spawning a
    // subset window
    "q_doc_chunks" -> ((s, dir) =>
      Chunking.chunk(docsPlanted(s, dir), maxTokens = 40, stride = 30,
        urlCol = "doc_id")),

    // ---- keep-rate threshold calibration (corpus-derived gate cut) ----
    // "keep the longest 30%" over the planted corpus: threshold from the
    // exact permille machinery, actual keep rate reported next to the
    // target (ties keep — a deterministic rule cannot split them)
    "q_quality_calibrate" -> ((s, dir) =>
      Quantiles.calibrateKeep(docsPlanted(s, dir), "n_chars", 300)),

    // ---- robots Sitemap discovery (standalone records, RFC 9309
    // §2.2.4) ----
    // r%4==0: one sitemap at top + one INSIDE a bot-only group (both
    // count — standalone records ignore groups); r%4==1: duplicate lines
    // collapse + a lowercase-key/uppercase-scheme variant; r%4==2:
    // relative and ftp junk (drops); r%4==3: no sitemap
    "q_sitemaps" -> ((s, dir) => {
      val hosts = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
      val robots = hosts.select(
        concat(lit("h"), col("r").cast("string"), lit(".example")).as("host"),
        when(col("r") % 4 === 0,
          concat(lit("Sitemap: https://h"), col("r").cast("string"),
            lit(".example/sm.xml\nUser-agent: bot\nDisallow: /\n" +
              "Sitemap: https://cdn.example/shared.xml")))
          .when(col("r") % 4 === 1, lit(
            "User-agent: *\nDisallow: /x\n\n" +
              "Sitemap: https://mirror.example/a.xml\n" +
              "Sitemap: https://mirror.example/a.xml\n" +
              "sitemap: HTTPS://mirror.example/b.xml"))
          .when(col("r") % 4 === 2,
            lit("Sitemap: /sitemap.xml\nSitemap: ftp://no.example/x"))
          .otherwise(lit("User-agent: *\nDisallow:"))
          .as("robots_txt"))
      RobotsTxt.sitemaps(robots)
    }),

    // ---- per-doc distinctive terms (tf·idf, integer micro-nats) ----
    "q_tfidf" -> ((s, dir) =>
      operators.TextAnalysis.tfidfTopTerms(docs(s, dir), k = 3)),

    // ---- exact distributed quantiles (integer permille ranks) ----
    // corpus-derived gate thresholds: 8 levels over n_chars, answered
    // from the value histogram, never a corpus sort
    "q_quantiles" -> ((s, dir) =>
      Quantiles.exactQuantiles(docs(s, dir), "n_chars",
        Seq(10, 100, 250, 500, 750, 900, 990, 1000))),

    // ---- KMV sketch sizing: one-pass distinct / dedup-win / overlap ----
    // forecast the exact-dedup win over the planted-duplicate corpus from
    // a k=2048 sketch (no groupBy of the corpus). At sf0.001 the corpus has
    // fewer distinct texts than k, so the sketch is under-full and the
    // forecast is EXACT (dup_rate 1/26); at sf0.01 the estimator path runs
    // with ~2.2% error — the two driver SFs exercise both branches
    "q_kmv_distinct" -> ((s, dir) =>
      Kmv.distinctReport(docsPlanted(s, dir), "text", 2048)),

    // crawl-over-crawl content overlap: snapshot 1 vs snapshot 2 text sets
    // (snap 2 rewrites every %3==1 doc, so true Jaccard ≈ 0.5)
    "q_corpus_overlap" -> ((s, dir) => {
      val snaps = snapshotPages(docs(s, dir))
      Kmv.overlap(
        snaps.where(col("ts_s") === 1),
        snaps.where(col("ts_s") === 2),
        "text", 128)
    }),

    // corpus drift alarm: JS divergence (integer micro-nats, 256 hashed
    // token buckets) between snapshot 1 and snapshot 3 — the rewrites +
    // even-docs-only retention make a real distribution shift
    "q_corpus_drift" -> ((s, dir) => {
      val snaps = snapshotPages(docs(s, dir))
      Drift.report(
        snaps.where(col("ts_s") === 1),
        snaps.where(col("ts_s") === 3))
    }),

    // per-host distinct-content estimate over the full capture history
    // (k=32: bigger hosts take the estimator branch, small ones the
    // exact under-full branch — both driver-checked in one query)
    "q_host_distinct" -> ((s, dir) => {
      val caps = snapshotPages(docs(s, dir))
        .withColumn("host", Splits.host(col("url")))
      Kmv.distinctReportBy(caps, "host", "text", 32)
    }),

    // triage view: per-host drift between snapshots 1 and 3 — which
    // hosts changed most (keys on one side only would drop; here every
    // host survives snap 3's even-doc retention)
    "q_host_drift" -> ((s, dir) => {
      val snaps = snapshotPages(docs(s, dir))
        .withColumn("host", Splits.host(col("url")))
      Drift.reportBy(
        snaps.where(col("ts_s") === 1),
        snaps.where(col("ts_s") === 3),
        "host")
    }),

    // CDX capture index over the three-snapshot history, with realistic
    // fetch-alias mess: snapshot-2 captures fetched via the www host
    // alias, snapshot-3 captures carrying a fragment — surt+canon fold
    // every capture of a page onto ONE contiguous key run
    "q_cdx_index" -> ((s, dir) => {
      val messy = snapshotPages(docs(s, dir)).select(
        concat(
          when(col("ts_s") === 2,
            regexp_replace(col("url"), "^https://", "https://www."))
            .otherwise(col("url")),
          when(col("ts_s") === 3, lit("#fetched")).otherwise(lit("")))
          .as("url"),
        col("ts_s"), col("text"))
      WebNormalize.cdxIndex(messy)
    }),

    // ---- cross-snapshot (re-crawl) delta: WARC revisit-record rule ----
    // three synthetic snapshots from documents: snap 1 = every url; snap 2
    // = every url, %3==1 texts re-written; snap 3 = even urls only, %6==4
    // re-written again. Exercises all three statuses plus urls missing
    // from later snapshots.
    "q_snapshot_delta" -> ((s, dir) =>
      SnapshotDelta.classify(snapshotPages(docs(s, dir)))),

    // revisit-record retention end-to-end: unchanged captures drop, kept
    // rows carry payload + status
    "q_recrawl_dedup" -> ((s, dir) =>
      SnapshotDelta.changedOnly(snapshotPages(docs(s, dir)))
        .select(col("url"), col("ts_s"), length(col("text")).as("len"),
          col("status"))),

    // per-snapshot churn rollup (the crawl-over-crawl datacard row)
    "q_snapshot_stats" -> ((s, dir) =>
      SnapshotDelta.deltaStats(snapshotPages(docs(s, dir)))),

    // ---- multimodal: REAL JDK decode (ImageIO / WAV-PCM); rows-only ----
    "q_media_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, docs(s, dir))
      Multimodal.extractFeatures(s, media)
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("sampleRate"), col("decodedFrames"), col("payloadBytes"))
    }))

  def oracleSql: Map[String, String] = {
    val m = oracleSqlBase
    // flagship aliases run the SAME planted configurations, so they carry
    // the same oracles (VERDICT r2 missing.3)
    m + ("q_dedup_decisions" -> m("q_dedup_decisions_full")) +
      ("q_dedup_stats" -> m("q_dedup_stats_exact")) +
      // the sink round-trip carries the full-pipeline decisions oracle
      // filtered to the delete partition
      ("q_deletions" ->
        s"""SELECT url, cluster_size, state FROM (
           |${m("q_dedup_decisions_full")}
           |) t WHERE state = 'delete'""".stripMargin) +
      // per-state md5-drawn audit sample over the same decisions truth
      ("q_audit_sample" ->
        s"""WITH d AS (
           |${m("q_dedup_decisions_full")}
           |),
           |r AS (SELECT state, url, cluster_size,
           |  row_number() OVER (PARTITION BY state
           |    ORDER BY md5(url), url) AS rk FROM d)
           |SELECT state, CAST(rk AS BIGINT) AS rk, url, cluster_size
           |FROM r WHERE rk <= 3""".stripMargin)
  }

  /** The exhaustive 200-gram span truth shared by `q_dup_spans` (winnowing
    * path) and `q_sa_dup_spans` (suffix-array path): duplicated gram
    * positions (shared with ANOTHER url) merged by a gaps-and-islands
    * window. One oracle, two independent Spark algorithms. */
  private lazy val dupSpansGramOracle: String =
    s"""WITH base AS (
      |  SELECT doc_id, text, source FROM documents WHERE length(text) >= 250),
      |d AS (
      |  SELECT doc_id, text, source FROM base
      |  UNION ALL
      |  SELECT doc_id + 4000000,
      |    text || ' ' || repeat('shared boilerplate passage ', 10), source
      |  FROM base WHERE doc_id % 25 = 11),
      |u AS (SELECT $urlSql AS url, text FROM d),
      |g AS (SELECT url, unnest(range(1, length(text) - 198)) AS i, text FROM u),
      |gg AS (SELECT url, i, substr(text, CAST(i AS INT), 200) AS gram FROM g),
      |dup AS (SELECT DISTINCT x.url, x.i FROM gg x
      |  JOIN gg y ON x.gram = y.gram AND x.url <> y.url),
      |m AS (SELECT url, i, max(i + 200) OVER (PARTITION BY url ORDER BY i
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e FROM dup),
      |isl AS (SELECT url, i, sum(CASE WHEN prev_e IS NULL OR i > prev_e
      |  THEN 1 ELSE 0 END) OVER (PARTITION BY url ORDER BY i) AS island FROM m)
      |SELECT url, min(i) AS s, max(i + 200) AS e FROM isl
      |GROUP BY url, island""".stripMargin

  /** Duplicate-mass truth: the q_dup_spans gram-table CTEs extended with a
    * per-doc coverage fraction over ALL planted docs (span-free docs read
    * 0 / 0.0 / false via the left join). */
  private lazy val dupMassGramOracle: String =
    s"""WITH base AS (
      |  SELECT doc_id, text, source FROM documents WHERE length(text) >= 250),
      |d AS (
      |  SELECT doc_id, text, source FROM base
      |  UNION ALL
      |  SELECT doc_id + 4000000,
      |    text || ' ' || repeat('shared boilerplate passage ', 10), source
      |  FROM base WHERE doc_id % 25 = 11),
      |u AS (SELECT $urlSql AS url, text FROM d),
      |g AS (SELECT url, unnest(range(1, length(text) - 198)) AS i, text FROM u),
      |gg AS (SELECT url, i, substr(text, CAST(i AS INT), 200) AS gram FROM g),
      |dup AS (SELECT DISTINCT x.url, x.i FROM gg x
      |  JOIN gg y ON x.gram = y.gram AND x.url <> y.url),
      |m AS (SELECT url, i, max(i + 200) OVER (PARTITION BY url ORDER BY i
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e FROM dup),
      |isl AS (SELECT url, i, sum(CASE WHEN prev_e IS NULL OR i > prev_e
      |  THEN 1 ELSE 0 END) OVER (PARTITION BY url ORDER BY i) AS island FROM m),
      |spans AS (SELECT url, min(i) AS s, max(i + 200) AS e FROM isl
      |  GROUP BY url, island),
      |mass AS (SELECT url, CAST(sum(e - s) AS BIGINT) AS dup_chars
      |  FROM spans GROUP BY url)
      |SELECT u.url, CAST(length(u.text) AS BIGINT) AS n_chars,
      |  coalesce(mass.dup_chars, 0) AS dup_chars,
      |  CASE WHEN length(u.text) = 0 THEN 0.0
      |    ELSE CAST(coalesce(mass.dup_chars, 0) AS DOUBLE) / length(u.text)
      |  END AS dup_frac,
      |  CAST(coalesce(mass.dup_chars, 0) AS DOUBLE) / length(u.text) >= 0.5
      |    AS dropped
      |FROM u LEFT JOIN mass ON u.url = mass.url""".stripMargin

  /** The keep-one-copy span truth shared by `q_span_dedup_keep` (pair-
    * oriented winnowing path) and `q_sa_span_keep` (group-oriented
    * suffix-array path): duplicated gram positions restricted to grams
    * shared with a STRICTLY EARLIER doc (numeric-url natural order ==
    * doc_id order), merged gaps-and-islands style. */
  private lazy val spanKeepGramOracle: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE length(text) >= 250),
      |d AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 4000000,
      |    text || ' ' || repeat('shared boilerplate passage ', 10)
      |  FROM base WHERE doc_id % 25 = 11),
      |u AS (SELECT CAST(doc_id AS VARCHAR) AS url, doc_id, text FROM d),
      |g AS (SELECT url, doc_id, unnest(range(1, length(text) - 198)) AS i,
      |  text FROM u),
      |gg AS (SELECT url, doc_id, i, substr(text, CAST(i AS INT), 200) AS gram
      |  FROM g),
      |dup AS (SELECT DISTINCT x.url, x.i FROM gg x
      |  JOIN gg y ON x.gram = y.gram AND y.doc_id < x.doc_id),
      |m AS (SELECT url, i, max(i + 200) OVER (PARTITION BY url ORDER BY i
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e FROM dup),
      |isl AS (SELECT url, i, sum(CASE WHEN prev_e IS NULL OR i > prev_e
      |  THEN 1 ELSE 0 END) OVER (PARTITION BY url ORDER BY i) AS island FROM m)
      |SELECT url, min(i) AS s, max(i + 200) AS e FROM isl
      |GROUP BY url, island""".stripMargin

  // ---- curation-funnel fixtures (shared by engine planting + oracle) ----
  // No quotes/backslashes in the fixtures — they interpolate into SQL
  // string literals verbatim.
  private val curationDeFix: String =
    Seq.fill(3)("der die das und ist nicht ein mit auf für").mkString(" ")
  private val curationShortFix: String = "the end"
  private val curationBoilerFix: String =
    "the cookie policy and the terms of service apply to the site and more"

  /** Deterministic planting for the curation funnel: %10==1 → German
    * (language stage drops it), %10==2 → two words (quality stage),
    * %10==4 → one shared boilerplate page (dedup stage collapses the
    * group to its lowest doc_id). */
  private def curationPlanted(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"), col("source"),
      when(col("doc_id") % 10 === 1, lit(curationDeFix))
        .when(col("doc_id") % 10 === 2, lit(curationShortFix))
        .when(col("doc_id") % 10 === 4, lit(curationBoilerFix))
        .otherwise(col("text"))
        .as("text"))

  /** The normalized-chain planting: the [[curationPlanted]] fixtures,
    * plus %10==5 docs rebuilt as (text ⏎ text ⏎ composed-café line) and
    * their +9M twins as (text ⏎ text ⏎ text ⏎ DECOMPOSED-café line) —
    * raw digests all distinct, normalized digests pairwise equal. */
  private def curationNormPlanted(d: DataFrame): DataFrame = {
    val base = curationPlanted(d)
    val fived = base.withColumn("text",
      when(col("doc_id") % 10 === 5,
        concat(col("text"), lit("\n"), col("text"), lit("\ncaf\u00e9 note")))
        .otherwise(col("text")))
    fived.unionByName(
      base.where(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("source"),
          concat(col("text"), lit("\n"), col("text"), lit("\n"), col("text"),
            lit("\ncafe\u0301 note")).as("text")))
  }

  /** Shared CTE chain for the two curation oracles — recomputes the
    * whole funnel: planting → stopword langid (the `q_langid` CASE) →
    * word metrics (the `q_gopher_quality` list-lambda constructs) →
    * quality filter → exact dedup (min doc_id per text group, md5 as
    * the grouping proxy) → per-source cap rank. Ends with CTE `c`
    * exposing (doc_id, source, pred_lang, n_words, rn2). */
  private lazy val curationCte: String =
    s"""WITH planted AS (
      |  SELECT doc_id, source, CASE
      |    WHEN doc_id % 10 = 1 THEN '$curationDeFix'
      |    WHEN doc_id % 10 = 2 THEN '$curationShortFix'
      |    WHEN doc_id % 10 = 4 THEN '$curationBoilerFix'
      |    ELSE text END AS text
      |  FROM documents),
      |h AS (SELECT doc_id, source, text,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(der|die|das|und|ist|nicht|ein|mit|auf|für)\\b')) AS de,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(the|and|of|to|in|is|that|it|for|with)\\b')) AS en,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(el|los|las|de|que|y|en|un|una|con)\\b')) AS es,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(le|la|les|et|est|pas|une|dans|pour|que)\\b')) AS fr,
      |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
      |  FROM planted),
      |lng AS (SELECT doc_id, source, text,
      |  CASE WHEN cjk > 0 THEN 'zh'
      |       WHEN greatest(de, en, es, fr) = 0 THEN 'und'
      |       WHEN de = greatest(de, en, es, fr) THEN 'de'
      |       WHEN en = greatest(de, en, es, fr) THEN 'en'
      |       WHEN es = greatest(de, en, es, fr) THEN 'es'
      |       ELSE 'fr' END AS pred_lang
      |  FROM h),
      |m AS (SELECT doc_id, source, text, pred_lang,
      |  list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'),
      |    x -> x <> '') AS ws
      |  FROM lng),
      |q AS (SELECT doc_id, source, text, pred_lang,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      |    round(CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum')
      |      AS DOUBLE) / len(ws), 6) END AS mean_word_len
      |  FROM m),
      |f AS (SELECT * FROM q WHERE pred_lang = 'en'
      |  AND n_words >= 10 AND mean_word_len BETWEEN 1 AND 12),
      |u AS (SELECT * FROM (SELECT *, row_number() OVER (
      |    PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f)
      |  WHERE rn = 1),
      |c AS (SELECT doc_id, source, pred_lang, n_words,
      |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn2
      |  FROM u)""".stripMargin

  /** The normalized-curation truth: [[curationCte]]'s chain with the
    * [[curationNormPlanted]] planting and a normalize head — DuckDB's own
    * `nfc_normalize` plus the first-occurrence line filter — so dedup
    * groups by CANONICAL text exactly as the engine's fused stage does. */
  private lazy val curationNormCte: String =
    s"""WITH planted AS (
      |  SELECT doc_id, source, CASE
      |    WHEN doc_id % 10 = 1 THEN '$curationDeFix'
      |    WHEN doc_id % 10 = 2 THEN '$curationShortFix'
      |    WHEN doc_id % 10 = 4 THEN '$curationBoilerFix'
      |    ELSE text END AS text
      |  FROM documents),
      |planted2 AS (
      |  SELECT doc_id, source, CASE WHEN doc_id % 10 = 5
      |    THEN text || chr(10) || text || chr(10) ||
      |      'caf' || chr(233) || ' note'
      |    ELSE text END AS text
      |  FROM planted
      |  UNION ALL
      |  SELECT doc_id + 9000000, source,
      |    text || chr(10) || text || chr(10) || text || chr(10) ||
      |      'cafe' || chr(769) || ' note'
      |  FROM planted WHERE doc_id % 10 = 5),
      |nl AS (SELECT doc_id, source,
      |  string_split(nfc_normalize(text), chr(10)) AS ls FROM planted2),
      |nrm AS (SELECT doc_id, source,
      |  array_to_string(list_transform(
      |    list_filter(range(1, len(ls) + 1),
      |      i -> list_position(ls, ls[CAST(i AS INT)]) = i),
      |    i -> ls[CAST(i AS INT)]), chr(10)) AS text
      |  FROM nl),
      |h AS (SELECT doc_id, source, text,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(der|die|das|und|ist|nicht|ein|mit|auf|für)\\b')) AS de,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(the|and|of|to|in|is|that|it|for|with)\\b')) AS en,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(el|los|las|de|que|y|en|un|una|con)\\b')) AS es,
      |  len(regexp_extract_all(lower(text),
      |    '\\b(le|la|les|et|est|pas|une|dans|pour|que)\\b')) AS fr,
      |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
      |  FROM nrm),
      |lng AS (SELECT doc_id, source, text,
      |  CASE WHEN cjk > 0 THEN 'zh'
      |       WHEN greatest(de, en, es, fr) = 0 THEN 'und'
      |       WHEN de = greatest(de, en, es, fr) THEN 'de'
      |       WHEN en = greatest(de, en, es, fr) THEN 'en'
      |       WHEN es = greatest(de, en, es, fr) THEN 'es'
      |       ELSE 'fr' END AS pred_lang
      |  FROM h),
      |m AS (SELECT doc_id, source, text, pred_lang,
      |  list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'),
      |    x -> x <> '') AS ws
      |  FROM lng),
      |q AS (SELECT doc_id, source, text, pred_lang,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      |    round(CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum')
      |      AS DOUBLE) / len(ws), 6) END AS mean_word_len
      |  FROM m),
      |f AS (SELECT * FROM q WHERE pred_lang = 'en'
      |  AND n_words >= 10 AND mean_word_len BETWEEN 1 AND 12),
      |u AS (SELECT * FROM (SELECT *, row_number() OVER (
      |    PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f)
      |  WHERE rn = 1),
      |c AS (SELECT doc_id, source, pred_lang, n_words,
      |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn2
      |  FROM u)""".stripMargin

  /** Target-domain fixture for the DSIR planting (no quotes/backslashes —
    * interpolates into the oracle SQL string literal verbatim). */
  private val dsirTargetFix: String =
    "quantum flux lattice entangled photon detector readout calibration notes"

  /** Spam fixture for the NB classifier planting (no quotes/backslashes —
    * interpolates into the oracle SQL string literal verbatim). */
  private val nbSpamFix: String =
    Seq.fill(4)("win big casino lottery jackpot bonus click now free spins")
      .mkString(" ")

  /** Token-set items for the set-similarity queries: the doc_id%4==0
    * slice, plus a near-identical copy (two junk tokens appended) of every
    * %16==0 item. Mirrored verbatim in [[setsimCte]]. */
  private def setsimItems(d: DataFrame): DataFrame = {
    val base = d.where(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("item_id"),
        SetSimJoin.tokenSet(col("text")).as("toks"))
    base.unionByName(
      base.where(col("item_id") % 16 === 0)
        .withColumn("item_id", col("item_id") + lit(7000000L))
        .withColumn("toks",
          concat(col("toks"), array(lit("zzzextra1"), lit("zzzextra2")))))
  }

  /** Weighted-Jaccard fixture: token BAGS (duplicates kept) of the %4==2
    * slice; %16==2 items get a copy (id+7500000) with the first two
    * tokens REPEATED — weighted J = n/(n+2) vs set-J 1.0, so only the
    * multiset semantics separates copy from original. Mirrored verbatim
    * in [[setsimWeightedCte]]. */
  private def setsimWeightedItems(d: DataFrame): DataFrame = {
    val base = d.where(col("doc_id") % 4 === 2)
      .select(col("doc_id").as("item_id"),
        SetSimJoin.tokenBag(col("text")).as("toks"))
    base.unionByName(
      base.where(col("item_id") % 16 === 2)
        .withColumn("item_id", col("item_id") + lit(7500000L))
        .withColumn("toks", concat(col("toks"), slice(col("toks"), 1, 2))))
  }

  /** Edit-join fixture: every doc's synthetic url ∪ three planted edit
    * slices — substituted first char (%25==3, id+8e6), dropped first char
    * (%25==11, id+8.5e6), two appended chars (%25==17, id+9e6). Natural
    * near-pairs (urls differing in one or two doc_id digits, same source)
    * make the bulk of the truth; the plants pin one of each edit type.
    * Mirrored verbatim in [[editPairsCte]]. */
  private def editItems(d: DataFrame): DataFrame = {
    val u = d.select(col("doc_id").as("item_id"), urlCol.as("s"))
    u.unionByName(u.where(col("item_id") % 25 === 3).select(
        (col("item_id") + 8000000L).as("item_id"),
        concat(lit("x"), col("s").substr(lit(2), length(col("s")))).as("s")))
      .unionByName(u.where(col("item_id") % 25 === 11).select(
        (col("item_id") + 8500000L).as("item_id"),
        col("s").substr(lit(2), length(col("s"))).as("s")))
      .unionByName(u.where(col("item_id") % 25 === 17).select(
        (col("item_id") + 9000000L).as("item_id"),
        concat(col("s"), lit("zq")).as("s")))
  }

  /** Shared fixture for the q_web_funnel queries: pages (url, text, html)
    * over [[docsPlanted]] with planted noindex metas, soft-404 shells,
    * mojibake tails and robots-gated paths, plus the q_robots_gate robots
    * table. Mirrored verbatim in the q_web_funnel oracle. */
  private def webFunnelPages(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docsPlanted(s, dir)
    val url = concat(lit("http://h"), (col("doc_id") % 40).cast("string"),
      lit(".example"),
      when(col("doc_id") % 3 === 0, lit("/private/p"))
        .when(col("doc_id") % 3 === 1, lit("/private/pub/p"))
        .otherwise(lit("/secret/p")),
      col("doc_id").cast("string"))
    val t = when(col("doc_id") % 17 === 5,
        lit(Soft404Shell))
      .when(col("doc_id") % 11 === 3,
        concat(col("text"),
          lit(MojibakeTail)))
      .otherwise(col("text"))
    val meta = when(col("doc_id") % 31 === 6,
      lit("<meta name=\"robots\" content=\"noindex\">")).otherwise(lit(""))
    val pages = d.select(url.as("url"), t.as("text"),
      concat(lit("<html><head><title> "),
        array_join(slice(split(t, " "), 1, 5), " "),
        lit(" </title>"), meta, lit("</head><body>"), t,
        lit("</body></html>")).as("html"))
    val hosts = docs(s, dir).select((col("doc_id") % 40).as("r")).distinct()
    val robots = hosts.where(col("r") % 4 =!= 3).select(
      concat(lit("h"), col("r").cast("string"), lit(".example")).as("host"),
      when(col("r") % 4 === 0, lit(
        "User-agent: *\nDisallow: /private\nAllow: /private/pub\n\n" +
          "User-agent: bot\nDisallow: /"))
        .when(col("r") % 4 === 1, lit("User-agent: bot\nDisallow: /"))
        .otherwise(lit(
          "User-agent: bot\nUser-agent: *\nDisallow: /secret"))
        .as("robots_txt"))
    (pages, robots)
  }

  /** Shared fixture for the q_mirror_* queries: docs on h{r}.example
    * hosts plus every %9==5 doc re-planted on its m{r}.example mirror
    * host. Mirrored in [[mirrorCte]]. */
  private def mirrorPages(s: SparkSession, dir: String): DataFrame = {
    def hostOf(p: String) = concat(lit(p),
      (col("doc_id") % 40).cast("string"), lit(".example"))
    docs(s, dir).select(hostOf("h").as("host"), col("text"))
      .unionByName(
        docs(s, dir).where(col("doc_id") % 9 === 5)
          .select(hostOf("m").as("host"), col("text")))
  }

  /** SQL mirror of [[mirrorPages]] + the shared hostOverlap replay
    * (digest key = the raw text; fan-out cap 8; pair floor 2), ending at
    * the `pr` (pairs) and `sz` (host sizes) CTEs — callers append their
    * final select. */
  private lazy val mirrorCte: String =
    """WITH p AS (
      |  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS host,
      |    text FROM documents
      |  UNION ALL
      |  SELECT 'm' || CAST(doc_id % 40 AS VARCHAR) || '.example', text
      |  FROM documents WHERE doc_id % 9 = 5),
      |dh AS (SELECT DISTINCT text AS h, host FROM p),
      |sz AS (SELECT host, count(*) AS n FROM dh GROUP BY 1),
      |fan AS (SELECT h FROM (SELECT h, count(*) AS nh FROM dh GROUP BY 1)
      |  WHERE nh <= 8),
      |k AS (SELECT dh.h, dh.host FROM dh JOIN fan USING (h)),
      |pr AS (SELECT a.host AS host_a, b.host AS host_b,
      |    count(*) AS n_shared
      |  FROM k a JOIN k b ON a.h = b.h AND a.host < b.host
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** Shared CTE chain for the q_web_funnel oracles: [[webFunnelPages]]
    * replayed — planted page builder, robots parse with Allow precedence
    * (the q_robots_gate CTEs over the SAME host classes), the four
    * row-local flags, the title key, and the survivors-first (host, tkey)
    * window — ending at the `rk` CTE; callers append their final select. */
  private def webFunnelOracle(finalSelect: String): String =
    s"""$plantedCte,
      |robots AS (
      |  SELECT 'h' || CAST(r AS VARCHAR) || '.example' AS host,
      |    CASE WHEN r % 4 = 0 THEN 'User-agent: *' || chr(10) ||
      |        'Disallow: /private' || chr(10) ||
      |        'Allow: /private/pub' || chr(10) || chr(10) ||
      |        'User-agent: bot' || chr(10) || 'Disallow: /'
      |      WHEN r % 4 = 1 THEN 'User-agent: bot' || chr(10) ||
      |        'Disallow: /'
      |      ELSE 'User-agent: bot' || chr(10) || 'User-agent: *' ||
      |        chr(10) || 'Disallow: /secret' END AS txt
      |  FROM (SELECT DISTINCT doc_id % 40 AS r FROM documents)
      |  WHERE r % 4 <> 3),
      |ln0 AS (SELECT host, unnest(list_zip(string_split(txt, chr(10)),
      |    range(1, len(string_split(txt, chr(10))) + 1))) AS pr
      |  FROM robots),
      |ln AS (SELECT host, CAST(pr[2] AS BIGINT) AS pos, trim(pr[1]) AS line
      |  FROM ln0),
      |tag AS (SELECT host, pos, line,
      |  sum(CASE WHEN line = '' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY host ORDER BY pos) AS grp,
      |  CASE WHEN regexp_matches(lower(line), '^user-agent[ \\t]*:')
      |    THEN trim(regexp_replace(line, '(?i)^user-agent[ \\t]*:', ''))
      |    END AS ua,
      |  CASE WHEN regexp_matches(lower(line), '^disallow[ \\t]*:')
      |    THEN trim(regexp_replace(line, '(?i)^disallow[ \\t]*:', ''))
      |    END AS dis,
      |  CASE WHEN regexp_matches(lower(line), '^allow[ \\t]*:')
      |    THEN trim(regexp_replace(line, '(?i)^allow[ \\t]*:', ''))
      |    END AS al
      |  FROM ln),
      |star AS (SELECT DISTINCT host, grp FROM tag WHERE ua = '*'),
      |rules AS (SELECT DISTINCT t.host,
      |    coalesce(t.dis, t.al) AS prefix,
      |    (t.al IS NOT NULL) AS allow
      |  FROM tag t
      |  JOIN star st ON t.host = st.host AND t.grp = st.grp
      |  WHERE coalesce(t.dis, t.al) IS NOT NULL
      |    AND coalesce(t.dis, t.al) <> ''),
      |pg AS (SELECT doc_id,
      |  'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.example' ||
      |  CASE WHEN doc_id % 3 = 0 THEN '/private/p'
      |       WHEN doc_id % 3 = 1 THEN '/private/pub/p'
      |       ELSE '/secret/p' END || CAST(doc_id AS VARCHAR) AS url,
      |  CASE WHEN doc_id % 17 = 5 THEN
      |    'Error 404 - page not found. The requested document ' ||
      |    'is not available.'
      |  WHEN doc_id % 11 = 3 THEN text || ' caf' || chr(65533) ||
      |    ' menu ' || chr(1) || chr(2) || ' na' || chr(195) || chr(175) ||
      |    've stra' || chr(195) || chr(159) || 'e'
      |  ELSE text END AS t,
      |  CASE WHEN doc_id % 31 = 6
      |    THEN '<meta name="robots" content="noindex">'
      |    ELSE '' END AS meta
      |  FROM docs),
      |ph AS (SELECT url, t,
      |  '<html><head><title> ' ||
      |  array_to_string((string_split(t, ' '))[1:5], ' ') ||
      |  ' </title>' || meta || '</head><body>' || t ||
      |  '</body></html>' AS html
      |  FROM pg),
      |hp AS (SELECT url, t, html,
      |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
      |    AS host,
      |  regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '')
      |    AS path
      |  FROM ph),
      |mrule AS (SELECT hp.url, r.prefix, r.allow
      |  FROM hp JOIN rules r ON hp.host = r.host
      |    AND starts_with(hp.path, r.prefix)),
      |bestr AS (SELECT url, allow, row_number() OVER (PARTITION BY url
      |    ORDER BY len(prefix) DESC, allow DESC) AS rnr FROM mrule),
      |fl AS (SELECT hp.url, hp.host,
      |  (regexp_matches(lower(hp.html),
      |    '<meta [^>]*name=["'']robots["''][^>]*content=["''][^"'']*noindex')
      |   OR regexp_matches(lower(hp.html),
      |    '<meta [^>]*content=["''][^"'']*noindex[^"'']*["''][^>]*name=["'']robots["'']'))
      |    AS noindex,
      |  coalesce(NOT b.allow, false) AS blocked,
      |  (regexp_matches(lower(hp.t),
      |    '(404|page not found|file not found|access denied|' ||
      |    'not available|forbidden|server error)')
      |   AND (CASE WHEN length(trim(hp.t)) = 0 THEN 0
      |        ELSE len(string_split_regex(trim(hp.t), '\\s+')) END) < 30)
      |    AS soft404,
      |  ((len(regexp_extract_all(hp.t, chr(65533))) +
      |    len(regexp_extract_all(hp.t, '[\\x00-\\x08\\x0E-\\x1F\\x7F]')) +
      |    len(regexp_extract_all(hp.t, '[' || chr(194) || chr(195) ||
      |      '][' || chr(128) || '-' || chr(191) || ']'))) * 1000
      |   > length(hp.t) * 2) AS moji,
      |  trim(regexp_replace(regexp_replace(lower(
      |    trim(regexp_replace(regexp_extract(hp.html,
      |      '(?is)<title[^>]*>(.*?)</title>', 1),
      |      '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))),
      |    '[!-/:-@\\[-`{-~]+', ' ', 'g'),
      |    '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS tkey
      |  FROM hp LEFT JOIN (SELECT url, allow FROM bestr WHERE rnr = 1) b
      |    ON hp.url = b.url),
      |fl2 AS (SELECT *,
      |  (NOT noindex AND NOT blocked AND NOT soft404 AND NOT moji) AS pass
      |  FROM fl),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY host, tkey
      |    ORDER BY pass DESC, url) AS rn FROM fl2)
      |$finalSelect""".stripMargin

  /** The q_near_dup_clusters configuration, shared with the keep-best
    * election query: length≥200 docs plus planted one-word-appended copies
    * (%25==7, id+3000000) through the full LSH → verify → CC path.
    * Returns (labels(url, cluster) with the plain string-min cluster
    * label, planted frame d(url, text, nk)). */
  private def nearDupClusterLabels(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = docs(s, dir).where(length(col("text")) >= 200)
      .select(col("doc_id"), col("text"), col("source"))
    val planted = base.unionByName(
      base.where(col("doc_id") % 25 === 7)
        .withColumn("doc_id", col("doc_id") + lit(3000000L))
        .withColumn("text", concat(col("text"), lit(" appended"))))
    val d = planted
      .select(urlCol.as("url"), col("text"))
      .withColumn("nk", gf.natural_sort_key(col("url")))
    val cfg = operators.Lsh.Config()
    val sigs = operators.Lsh.withSignatures(d, cfg)
    val cands = operators.Lsh.candidatePairs(s, sigs, cfg)
    val edges = operators.Lsh.verifiedEdges(cands, d, cfg, tau = 0.8)
    val labels = operators.ConnectedComponents.run(
      s, d.select(col("url"), col("nk")), edges.select(col("src"), col("dst")))
      .withColumn(
        "cluster",
        min(col("url")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_url"))))
      .select(col("url"), col("cluster"))
    (labels, d)
  }

  /** (probe, corpus) tables for the cross-table set-similarity queries:
    * corpus = the doc_id%4==0 slice; probe = near-copies of every %16==0
    * corpus item (two corpus-unseen junk tokens appended, id offset
    * +7000000) plus the doc_id%4==1 slice as the mostly-novel mass.
    * Mirrored verbatim in [[setsimAcrossCte]]. */
  private def setsimAcrossTables(d: DataFrame): (DataFrame, DataFrame) = {
    val corpus = d.where(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("item_id"),
        SetSimJoin.tokenSet(col("text")).as("toks"))
    val probe = d.where(col("doc_id") % 4 === 1)
      .select(col("doc_id").as("item_id"),
        SetSimJoin.tokenSet(col("text")).as("toks"))
      .unionByName(
        corpus.where(col("item_id") % 16 === 0)
          .withColumn("item_id", col("item_id") + lit(7000000L))
          .withColumn("toks",
            concat(col("toks"), array(lit("zzzextra1"), lit("zzzextra2")))))
    (probe, corpus)
  }

  /** Shared CTE for the cross-table set-similarity oracles: exhaustive
    * probe×corpus Jaccard over [[setsimAcrossTables]]. Plain string —
    * single backslashes reach DuckDB's regex engine as written. */
  private lazy val setsimAcrossCte: String =
    """WITH corp AS (SELECT doc_id AS item_id,
      |  list_distinct(list_filter(string_split_regex(lower(text),
      |    '[ \t\n\f\r]+'), x -> x <> '')) AS toks
      |  FROM documents WHERE doc_id % 4 = 0),
      |probe AS (SELECT doc_id AS item_id,
      |  list_distinct(list_filter(string_split_regex(lower(text),
      |    '[ \t\n\f\r]+'), x -> x <> '')) AS toks
      |  FROM documents WHERE doc_id % 4 = 1
      |  UNION ALL
      |  SELECT item_id + 7000000, list_concat(toks,
      |    ['zzzextra1', 'zzzextra2'])
      |  FROM corp WHERE item_id % 16 = 0),
      |tp AS (SELECT item_id, len(toks) AS n, unnest(toks) AS w FROM probe),
      |tc AS (SELECT item_id, len(toks) AS n, unnest(toks) AS w FROM corp),
      |o AS (SELECT p.item_id AS probe_id, c.item_id AS corpus_id,
      |  p.n AS na, c.n AS nb, count(*) AS ov
      |  FROM tp p JOIN tc c ON p.w = c.w GROUP BY 1, 2, 3, 4),
      |pr AS (SELECT probe_id, corpus_id,
      |  round(CAST(ov AS DOUBLE) / (na + nb - ov), 6) AS jac FROM o)""".stripMargin

  /** Shared recursive-CTE truth for the near-dup cluster oracles
    * (q_near_dup_clusters, q_cluster_keep_best): exhaustive 4-word-shingle
    * Jaccard ≥ 0.8 over the planted corpus, components closed with a
    * recursive CTE. Ends at the `reach` CTE — callers append their final
    * select (and further CTEs after a comma). */
  private lazy val nearDupClusterCte: String =
    s"""WITH RECURSIVE base AS (
      |  SELECT doc_id, text, source FROM documents WHERE length(text) >= 200),
      |d AS (
      |  SELECT doc_id, text, source FROM base
      |  UNION ALL
      |  SELECT doc_id + 3000000, text || ' appended', source
      |  FROM base WHERE doc_id % 25 = 7),
      |u AS (SELECT $urlSql AS url, string_split(text, ' ') AS w FROM d),
      |sh AS (
      |  SELECT url, list_distinct(list_transform(range(1, len(w) - 3),
      |    i -> array_to_string(w[i:i+4], ' '))) AS s
      |  FROM u),
      |p AS (
      |  SELECT x.url AS a, y.url AS b
      |  FROM sh x JOIN sh y ON x.url < y.url
      |  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |      / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.8),
      |sym AS (
      |  SELECT a AS un, b AS vn FROM p
      |  UNION SELECT b, a FROM p
      |  UNION SELECT url, url FROM u),
      |reach(un, r) AS (
      |  SELECT un, vn FROM sym
      |  UNION
      |  SELECT reach.un, sym.vn FROM reach JOIN sym ON reach.r = sym.un)""".stripMargin

  /** Shared CTE for the set-similarity oracles: exhaustive pairwise
    * Jaccard over [[setsimItems]] — the engine's prefix filter must lose
    * NOTHING vs brute force. Plain (non-interpolated) string: single
    * backslashes reach DuckDB's regex engine as written. */
  private lazy val setsimCte: String =
    """WITH b0 AS (SELECT doc_id AS item_id,
      |  list_distinct(list_filter(string_split_regex(lower(text),
      |    '[ \t\n\f\r]+'), x -> x <> '')) AS toks
      |  FROM documents WHERE doc_id % 4 = 0),
      |b AS (SELECT item_id, toks FROM b0
      |  UNION ALL
      |  SELECT item_id + 7000000, list_concat(toks,
      |    ['zzzextra1', 'zzzextra2'])
      |  FROM b0 WHERE item_id % 16 = 0),
      |t AS (SELECT item_id, len(toks) AS n, unnest(toks) AS w FROM b),
      |o AS (SELECT a.item_id AS id1, c.item_id AS id2, a.n AS na,
      |  c.n AS nb, count(*) AS ov
      |  FROM t a JOIN t c ON a.w = c.w AND a.item_id < c.item_id
      |  GROUP BY 1, 2, 3, 4),
      |pr AS (SELECT id1, id2,
      |  round(CAST(ov AS DOUBLE) / (na + nb - ov), 6) AS jac FROM o)""".stripMargin

  /** Mirror of [[setsimWeightedItems]] + the exhaustive pairwise weighted
    * (multiset) Jaccard truth: Σ_w min(cntA, cntB) / Σ_w max — the
    * occurrence-token join must reproduce it exactly. */
  private lazy val setsimWeightedCte: String =
    """WITH b0 AS (SELECT doc_id AS item_id,
      |  list_filter(string_split_regex(lower(text),
      |    '[ \t\n\f\r]+'), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id % 4 = 2),
      |b AS MATERIALIZED (SELECT item_id, toks FROM b0
      |  UNION ALL
      |  SELECT item_id + 7500000, list_concat(toks, toks[1:2])
      |  FROM b0 WHERE item_id % 16 = 2),
      |tc AS MATERIALIZED (SELECT item_id, w, count(*) AS c FROM (
      |  SELECT item_id, unnest(toks) AS w FROM b) GROUP BY 1, 2),
      |sz AS (SELECT item_id, len(toks) AS n FROM b),
      |o AS (SELECT a.item_id AS id1, c2.item_id AS id2,
      |  sum(least(a.c, c2.c)) AS ov
      |  FROM tc a JOIN tc c2 ON a.w = c2.w AND a.item_id < c2.item_id
      |  GROUP BY 1, 2),
      |pr AS (SELECT id1, id2,
      |  round(CAST(ov AS DOUBLE) / (na.n + nb.n - ov), 6) AS jac
      |  FROM o JOIN sz na ON o.id1 = na.item_id
      |         JOIN sz nb ON o.id2 = nb.item_id)""".stripMargin

  /** Mirror of [[editItems]] + the exhaustive length-filtered levenshtein
    * truth at k=2 (the q-gram prefix filter must lose nothing). */
  private lazy val editPairsCte: String =
    s"""WITH u AS MATERIALIZED (
      |  SELECT doc_id AS item_id, $urlSql AS s FROM documents),
      |it AS MATERIALIZED (
      |  SELECT item_id, s FROM u
      |  UNION ALL
      |  SELECT item_id + 8000000, 'x' || substr(s, 2) FROM u
      |  WHERE item_id % 25 = 3
      |  UNION ALL
      |  SELECT item_id + 8500000, substr(s, 2) FROM u
      |  WHERE item_id % 25 = 11
      |  UNION ALL
      |  SELECT item_id + 9000000, s || 'zq' FROM u
      |  WHERE item_id % 25 = 17),
      |pr AS MATERIALIZED (
      |  SELECT id1, id2, dist FROM (
      |    SELECT a.item_id AS id1, b.item_id AS id2,
      |      CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      |    FROM it a JOIN it b
      |      ON a.item_id < b.item_id
      |      AND abs(length(a.s) - length(b.s)) <= 2)
      |  WHERE dist <= 2)""".stripMargin

  /** q_pagerank truth: the same host/edge derivation, then every one of
    * the 10 synchronous rounds as its own (materialized) CTE running the
    * identical integer recurrence — rank'(v) = base + (85·(inflow +
    * dangling//N))//100 in nano-units. Integer div + integer sums are
    * order-independent, so DuckDB's replay is bit-exact. */
  private lazy val pagerankOracle: String = {
    val head =
      """WITH res AS MATERIALIZED (
        |  SELECT DISTINCT doc_id % 40 AS r FROM documents),
        |nodes AS MATERIALIZED (
        |  SELECT 'h' || CAST(r AS VARCHAR) AS host FROM res),
        |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT 'h' || CAST(r AS VARCHAR) AS src,
        |    'h' || CAST((r*7+3) % 40 AS VARCHAR) AS dst FROM res WHERE r < 37
        |  UNION ALL SELECT 'h' || CAST(r AS VARCHAR),
        |    'h' || CAST((r*13+5) % 40 AS VARCHAR) FROM res WHERE r < 37
        |  UNION ALL SELECT 'h' || CAST(r AS VARCHAR), 'h0'
        |    FROM res WHERE r < 37 AND r % 4 = 0)),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS MATERIALIZED (
        |  SELECT host, CAST(1000000000 AS BIGINT) // n AS rank
        |  FROM nodes, nn)""".stripMargin
    val rounds = (1 to 10).map { k =>
      s"""inf$k AS MATERIALIZED (SELECT e.dst AS host,
         |    SUM(r.rank // d.deg) AS s
         |  FROM e JOIN r${k - 1} r ON e.src = r.host
         |  JOIN deg d ON d.src = e.src GROUP BY 1),
         |dg$k AS MATERIALIZED (
         |  SELECT COALESCE(SUM(rank), 0) AS dang FROM r${k - 1}
         |  WHERE host NOT IN (SELECT src FROM deg)),
         |r$k AS MATERIALIZED (SELECT nodes.host,
         |    ((15 * CAST(1000000000 AS BIGINT) // 100) // n)
         |    + (85 * (COALESCE(inf$k.s, 0) + dang // n)) // 100 AS rank
         |  FROM nodes CROSS JOIN nn CROSS JOIN dg$k
         |  LEFT JOIN inf$k ON nodes.host = inf$k.host)""".stripMargin
    }.mkString(",\n")
    head + ",\n" + rounds +
      "\nSELECT host, CAST(rank AS BIGINT) AS rank_nano FROM r10"
  }

  private def oracleSqlBase: Map[String, String] = Map(
    // mirrors q_kmv_distinct: the KMV sketch is literally DISTINCT md5
    // ORDER BY LIMIT k; the estimator replays the identical IEEE-double
    // steps (60-bit hash slice, exact (k-1)*2^60 product, one division,
    // floor), so est_distinct matches bit-for-bit
    "q_kmv_distinct" ->
      s"""$plantedCte,
        |h AS (SELECT DISTINCT md5(text) AS h FROM docs WHERE text IS NOT NULL),
        |s AS (SELECT h FROM h ORDER BY h LIMIT 2048),
        |a AS (SELECT count(*) AS sketch_size, max(h) AS kth FROM s),
        |t AS (SELECT count(text) AS rows_total FROM docs),
        |e AS (SELECT sketch_size,
        |  CASE WHEN sketch_size < 2048 THEN sketch_size
        |       ELSE CAST(floor(2047.0 * 1152921504606846976.0 /
        |         CAST(CAST('0x' || substr(kth, 1, 15) AS BIGINT) AS DOUBLE))
        |         AS BIGINT) END AS est_distinct
        |  FROM a)
        |SELECT 2048 AS k, sketch_size, est_distinct, rows_total,
        |  greatest(0, rows_total - est_distinct) AS est_dup_rows,
        |  CAST(greatest(0, rows_total - est_distinct) AS DOUBLE) / rows_total
        |    AS dup_rate_est
        |FROM e, t""".stripMargin,
    // mirrors q_corpus_overlap: union sketch = k smallest of S(A) ∪ S(B);
    // Jaccard estimate = fraction of it present in BOTH side sketches
    "q_corpus_overlap" ->
      s"""$snapshotCte,
        |ha AS (SELECT DISTINCT md5(text) AS h FROM caps WHERE ts_s = 1),
        |hb AS (SELECT DISTINCT md5(text) AS h FROM caps WHERE ts_s = 2),
        |sa AS (SELECT h FROM ha ORDER BY h LIMIT 128),
        |sb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
        |su AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) u
        |       ORDER BY h LIMIT 128)
        |SELECT 128 AS k,
        |  (SELECT count(*) FROM su) AS union_sketch_size,
        |  (SELECT count(*) FROM su
        |   WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
        |    AS both_in_union,
        |  CAST((SELECT count(*) FROM su
        |        WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
        |    AS DOUBLE) / (SELECT count(*) FROM su) AS jaccard_est,
        |  CASE WHEN (SELECT count(*) FROM su) < 128
        |       THEN (SELECT count(*) FROM su)
        |       ELSE CAST(floor(127.0 * 1152921504606846976.0 /
        |         CAST(CAST('0x' || substr((SELECT max(h) FROM su), 1, 15)
        |              AS BIGINT) AS DOUBLE)) AS BIGINT) END AS est_union""".stripMargin,
    // mirrors q_corpus_drift: identical double shapes (left-assoc, totals
    // precomputed, per-bucket micro-nat quantization, integer sums)
    "q_corpus_drift" ->
      s"""$snapshotCte,
        |ab AS (
        |  SELECT substr(md5(tok), 1, 2) AS bucket, 'a' AS side FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM caps
        |    WHERE ts_s = 1) WHERE tok <> ''
        |  UNION ALL
        |  SELECT substr(md5(tok), 1, 2) AS bucket, 'b' AS side FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM caps
        |    WHERE ts_s = 3) WHERE tok <> ''),
        |c AS (SELECT bucket,
        |  SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS a,
        |  SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS b
        |  FROM ab GROUP BY 1),
        |t AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM c),
        |m AS (SELECT ta, tb,
        |  CASE WHEN a > 0 THEN CAST(round(
        |    CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) *
        |    ln(2.0 * CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) /
        |      (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) +
        |       CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))) * 1000000.0)
        |    AS BIGINT) ELSE 0 END AS mp,
        |  CASE WHEN b > 0 THEN CAST(round(
        |    CAST(b AS DOUBLE) / CAST(tb AS DOUBLE) *
        |    ln(2.0 * CAST(b AS DOUBLE) * CAST(ta AS DOUBLE) /
        |      (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) +
        |       CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))) * 1000000.0)
        |    AS BIGINT) ELSE 0 END AS mq
        |  FROM c, t)
        |SELECT ta AS n_tokens_a, tb AS n_tokens_b,
        |  count(*) AS buckets_active,
        |  SUM(mp) AS kl_ab_micro, SUM(mq) AS kl_ba_micro,
        |  SUM(mp) + SUM(mq) AS js2_micro
        |FROM m GROUP BY ta, tb""".stripMargin,
    // mirrors q_host_distinct: per-host DISTINCT md5 ranked, kth of the
    // 32 smallest, the same IEEE estimator steps (31·2^60 exact product)
    "q_host_distinct" ->
      s"""$snapshotCte,
        |hh AS (SELECT regexp_extract(url,
        |    '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
        |  md5(text) AS h FROM caps WHERE text IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT host, h,
        |  row_number() OVER (PARTITION BY host ORDER BY h) AS rn FROM hh),
        |a AS (SELECT host, count(*) AS sketch_size, max(h) AS kth
        |  FROM r WHERE rn <= 32 GROUP BY host),
        |t AS (SELECT regexp_extract(url,
        |    '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
        |  count(text) AS captures FROM caps GROUP BY 1)
        |SELECT t.host, captures, sketch_size,
        |  CASE WHEN sketch_size < 32 THEN sketch_size
        |       ELSE CAST(floor(31.0 * 1152921504606846976.0 /
        |         CAST(CAST('0x' || substr(kth, 1, 15) AS BIGINT) AS DOUBLE))
        |         AS BIGINT) END AS est_distinct
        |FROM a JOIN t USING (host)""".stripMargin,
    // mirrors q_host_drift: the corpus-drift arithmetic with the host key
    // carried through counts, totals (both-sides HAVING), and sums
    "q_host_drift" ->
      s"""$snapshotCte,
        |ab AS (
        |  SELECT regexp_extract(url,
        |      '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS key,
        |    substr(md5(tok), 1, 2) AS bucket, 'a' AS side FROM (
        |    SELECT url, unnest(string_split(text, ' ')) AS tok FROM caps
        |    WHERE ts_s = 1) WHERE tok <> ''
        |  UNION ALL
        |  SELECT regexp_extract(url,
        |      '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS key,
        |    substr(md5(tok), 1, 2) AS bucket, 'b' AS side FROM (
        |    SELECT url, unnest(string_split(text, ' ')) AS tok FROM caps
        |    WHERE ts_s = 3) WHERE tok <> ''),
        |c AS (SELECT key, bucket,
        |  SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS a,
        |  SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS b
        |  FROM ab GROUP BY 1, 2),
        |t AS (SELECT key, SUM(a) AS ta, SUM(b) AS tb FROM c GROUP BY 1
        |  HAVING SUM(a) > 0 AND SUM(b) > 0),
        |m AS (SELECT c.key, ta, tb,
        |  CASE WHEN a > 0 THEN CAST(round(
        |    CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) *
        |    ln(2.0 * CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) /
        |      (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) +
        |       CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))) * 1000000.0)
        |    AS BIGINT) ELSE 0 END AS mp,
        |  CASE WHEN b > 0 THEN CAST(round(
        |    CAST(b AS DOUBLE) / CAST(tb AS DOUBLE) *
        |    ln(2.0 * CAST(b AS DOUBLE) * CAST(ta AS DOUBLE) /
        |      (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) +
        |       CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))) * 1000000.0)
        |    AS BIGINT) ELSE 0 END AS mq
        |  FROM c JOIN t ON c.key = t.key)
        |SELECT key AS host, ta AS n_tokens_a, tb AS n_tokens_b,
        |  count(*) AS buckets_active,
        |  SUM(mp) AS kl_ab_micro, SUM(mq) AS kl_ba_micro,
        |  SUM(mp) + SUM(mq) AS js2_micro
        |FROM m GROUP BY key, ta, tb""".stripMargin,
    // mirrors q_cdx_index: the same messy-capture build, then the canon
    // chain (fragment, utm, lowercase head) and the SURT transform
    // (reversed host labels, www fold) replayed step by step
    "q_cdx_index" ->
      s"""$snapshotCte,
        |messy AS (SELECT
        |  CASE WHEN ts_s = 2
        |       THEN regexp_replace(url, '^https://', 'https://www.')
        |       ELSE url END ||
        |  CASE WHEN ts_s = 3 THEN '#fetched' ELSE '' END AS u,
        |  ts_s, text FROM caps),
        |c1 AS (SELECT ts_s, text, regexp_replace(u, '#.*', '', 'g') AS nf
        |  FROM messy),
        |c2 AS (SELECT ts_s, text, regexp_replace(regexp_replace(nf,
        |  '([?&])utm_[^&#]*(&utm_[^&#]*)*&', '\\1', 'g'),
        |  '[?&]utm_[^&#]*(&utm_[^&#]*)*$$', '', 'g') AS nu FROM c1),
        |c3 AS (SELECT ts_s, text,
        |  lower(regexp_extract(nu, '^[a-zA-Z]+://[^/]*', 0)) ||
        |    substr(nu, length(regexp_extract(nu, '^[a-zA-Z]+://[^/]*', 0)) + 1,
        |           length(nu)) AS cu FROM c2),
        |c4 AS (SELECT ts_s, text, cu,
        |  regexp_extract(cu, '^[a-z]+://[^/?#]*', 0) AS auth,
        |  regexp_replace(regexp_extract(cu, '^[a-z]+://([^/?#]+)', 1),
        |    '^www\\.', '') AS host FROM c3)
        |SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
        |    || ')' || substr(cu, length(auth) + 1, length(cu)) AS surt,
        |  ts_s, md5(text) AS digest, length(text) AS rec_len
        |FROM c4""".stripMargin,
    // mirrors q_snapshot_delta: the shared three-snapshot CTE + lag-text
    // classification (engine compares xxhash64 digests; equality agrees)
    "q_snapshot_delta" ->
      s"""$snapshotCte
        |SELECT url, ts_s, status FROM st""".stripMargin,
    // mirrors q_recrawl_dedup: the WARC revisit-record retention rule —
    // unchanged captures drop, kept rows carry payload length + status
    "q_recrawl_dedup" ->
      s"""$snapshotCte
        |SELECT url, ts_s, length(text) AS len, status
        |FROM st WHERE status <> 'unchanged'""".stripMargin,
    // mirrors q_snapshot_stats: per-snapshot churn rollup
    "q_snapshot_stats" ->
      s"""$snapshotCte
        |SELECT ts_s, status, count(*) AS n FROM st
        |GROUP BY ts_s, status""".stripMargin,
    // mirrors q_host_datacard: the q_datacard aggregate body at host grain
    "q_host_datacard" ->
      """WITH d AS (SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) ||
        |    '.example' AS host, text FROM documents),
        |c AS (SELECT host, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  avg(length(text)) AS mean_chars,
        |  count(DISTINCT sha256(text)) AS n_distinct
        |  FROM d GROUP BY host)
        |SELECT host, n_docs, n_tokens, n_chars, mean_chars, n_distinct,
        |  1.0 - CAST(n_distinct AS DOUBLE) / n_docs AS dup_rate,
        |  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share
        |FROM c""".stripMargin,
    // mirrors q_mirror_hosts: same host assignment + mirror plant; the
    // digest key is replayed as the raw text (distinct-count equivalent —
    // the digest never reaches the output), fan-out cap 8, pure integer
    // containment permille
    "q_mirror_hosts" ->
      s"""$mirrorCte
        |SELECT pr.host_a, pr.host_b, CAST(pr.n_shared AS BIGINT) AS n_shared,
        |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
        |  (pr.n_shared * 1000) // least(sa.n, sb.n) AS overlap_permille
        |FROM pr
        |JOIN sz sa ON pr.host_a = sa.host
        |JOIN sz sb ON pr.host_b = sb.host""".stripMargin,
    // mirrors q_mojibake: same planted tail via chr() codepoints, the same
    // three RE2-portable damage classes, integer permille rule (lateral
    // alias references avoided via a subquery)
    "q_mojibake" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 3 THEN text || ' caf' || chr(65533) ||
        |    ' menu ' || chr(1) || chr(2) || ' na' || chr(195) || chr(175) ||
        |    've stra' || chr(195) || chr(159) || 'e' ELSE text END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(length(t) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT) AS n_repl,
        |  CAST(len(regexp_extract_all(t,
        |    '[\x00-\x08\x0E-\x1F\x7F]')) AS BIGINT) AS n_ctrl,
        |  CAST(len(regexp_extract_all(t, '[' || chr(194) || chr(195) ||
        |    '][' || chr(128) || '-' || chr(191) || ']')) AS BIGINT) AS n_dbl
        |  FROM d)
        |SELECT doc_id, n_chars, n_repl, n_ctrl, n_dbl,
        |  (n_repl + n_ctrl + n_dbl) * 1000 > n_chars * 2 AS mojibake
        |FROM c""".stripMargin,
    // mirrors q_title_dedup: same plant, the titleOf regex, the
    // normalText canonicalization, (source, title-key) blocks with > 1
    // members
    "q_title_dedup" ->
      """WITH d AS (SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 8000000, source, text || ' republished today'
        |  FROM documents WHERE doc_id % 13 = 6),
        |p AS (SELECT doc_id, source,
        |  '<html><head><title> ' ||
        |  array_to_string((string_split(text, ' '))[1:5], ' ') ||
        |  ' </title></head><body>' || text || '</body></html>' AS html
        |  FROM d),
        |t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_extract(html,
        |    '(?is)<title[^>]*>(.*?)</title>', 1),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g')) AS title
        |  FROM p),
        |k AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(title),
        |    '[!-/:-@\[-`{-~]+', ' ', 'g'),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g')) AS tkey
        |  FROM t)
        |SELECT source, tkey, count(*) AS n, min(doc_id) AS rep_id
        |FROM k GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,
    // mirrors q_soft404: same plant, same error-phrase alternation over
    // lowercased text, same strict-< 30-word floor
    "q_soft404" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 17 = 5 THEN
        |    'Error 404 - page not found. The requested document ' ||
        |    'is not available.'
        |  WHEN doc_id % 17 = 6 THEN '404 discussion: ' || text
        |  ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  (regexp_matches(lower(t),
        |    '(404|page not found|file not found|access denied|' ||
        |    'not available|forbidden|server error)')
        |   AND (CASE WHEN length(trim(t)) = 0 THEN 0
        |        ELSE len(string_split_regex(trim(t), '\s+')) END) < 30)
        |    AS soft404
        |FROM d""".stripMargin,
    // mirrors q_crawl_traps: same url builders, digits→N then
    // fragment-drop (the engine's nesting order), key-grain counts
    "q_crawl_traps" ->
      s"""WITH u AS (
        |  SELECT $urlSql AS url FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example/cal/' ||
        |    CAST(2000 + doc_id % 5 AS VARCHAR) || '/' ||
        |    CAST(doc_id % 12 AS VARCHAR) || '/item' ||
        |    CAST(doc_id AS VARCHAR) || '#frag' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 6 = 2),
        |k AS (SELECT url, regexp_replace(regexp_replace(url,
        |    '[0-9]+', 'N', 'g'), '#.*', '') AS trap_key FROM u)
        |SELECT trap_key, count(*) AS n_urls,
        |  count(DISTINCT url) AS n_distinct
        |FROM k GROUP BY 1 HAVING count(*) >= 5""".stripMargin,
    // mirrors q_web_funnel: the full chain replayed — robots parse with
    // Allow precedence (q_robots_gate's CTEs), noindex/soft404/mojibake
    // flags, titleOf + normalText key, and the survivors-first window
    "q_web_funnel" -> webFunnelOracle("""SELECT url,
        |  CASE WHEN noindex THEN 'noindex'
        |       WHEN blocked THEN 'robots_blocked'
        |       WHEN soft404 THEN 'soft404'
        |       WHEN moji THEN 'mojibake'
        |       WHEN tkey <> '' AND rn > 1 THEN 'title_dup'
        |       ELSE 'kept' END AS verdict
        |FROM rk""".stripMargin),
    "q_web_funnel_stats" -> webFunnelOracle("""SELECT verdict,
        |  count(*) AS n FROM (SELECT
        |  CASE WHEN noindex THEN 'noindex'
        |       WHEN blocked THEN 'robots_blocked'
        |       WHEN soft404 THEN 'soft404'
        |       WHEN moji THEN 'mojibake'
        |       WHEN tkey <> '' AND rn > 1 THEN 'title_dup'
        |       ELSE 'kept' END AS verdict
        |FROM rk) GROUP BY 1""".stripMargin),
    // mirrors q_near_decontaminate: the q_incremental_near exhaustive
    // truth with benchmark as the corpus side and the paraphrase plant
    "q_near_decontaminate" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE length(text) >= 200),
        |corp AS (SELECT 'bm' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM base WHERE doc_id % 37 = 3),
        |bat AS (SELECT 'tr' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM base WHERE doc_id % 37 <> 3
        |  UNION ALL
        |  SELECT 'tr' || CAST(doc_id + 7300000 AS VARCHAR),
        |    text || ' paraphrased'
        |  FROM base WHERE doc_id % 37 = 3),
        |sb AS (SELECT url, list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 3),
        |    i -> array_to_string((string_split(text, ' '))[i:i+4], ' ')))
        |    AS s FROM bat),
        |sc AS (SELECT url, list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 3),
        |    i -> array_to_string((string_split(text, ' '))[i:i+4], ' ')))
        |    AS s FROM corp),
        |tb AS (SELECT url, len(s) AS n, unnest(s) AS w FROM sb),
        |tc AS (SELECT url, len(s) AS n, unnest(s) AS w FROM sc),
        |o AS (SELECT b.url AS url, c.url AS curl, b.n AS na, c.n AS nb,
        |    count(*) AS ov
        |  FROM tb b JOIN tc c ON b.w = c.w GROUP BY 1, 2, 3, 4),
        |p AS (SELECT url, curl,
        |    CAST(ov AS DOUBLE) / (na + nb - ov) AS jacraw FROM o
        |  WHERE CAST(ov AS DOUBLE) / (na + nb - ov) >= 0.8),
        |best AS (SELECT url, curl, jacraw,
        |  row_number() OVER (PARTITION BY url
        |    ORDER BY jacraw DESC, curl) AS rn FROM p)
        |SELECT bat.url, b.curl AS leaks_benchmark, b.jaccard,
        |  b.curl IS NOT NULL AS contaminated
        |FROM bat LEFT JOIN (SELECT url, curl, round(jacraw, 6) AS jaccard
        |  FROM best WHERE rn = 1) b ON bat.url = b.url""".stripMargin,
    // mirrors q_incremental_near: EXHAUSTIVE batch×corpus 5-word-shingle
    // Jaccard via the token-unnest join (the setsim oracle shape — no
    // quadratic list materialization), best match per batch url with the
    // engine's (raw-jaccard DESC, corpus-url ASC) election, novels kept
    // by the left join
    "q_incremental_near" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE length(text) >= 200),
        |corp AS (SELECT 'c' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM base WHERE doc_id % 4 = 0),
        |bat AS (SELECT 'b' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM base WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT 'b' || CAST(doc_id + 7100000 AS VARCHAR),
        |    text || ' appended'
        |  FROM base WHERE doc_id % 16 = 0),
        |sb AS (SELECT url, list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 3),
        |    i -> array_to_string((string_split(text, ' '))[i:i+4], ' ')))
        |    AS s FROM bat),
        |sc AS (SELECT url, list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 3),
        |    i -> array_to_string((string_split(text, ' '))[i:i+4], ' ')))
        |    AS s FROM corp),
        |tb AS (SELECT url, len(s) AS n, unnest(s) AS w FROM sb),
        |tc AS (SELECT url, len(s) AS n, unnest(s) AS w FROM sc),
        |o AS (SELECT b.url AS url, c.url AS curl, b.n AS na, c.n AS nb,
        |    count(*) AS ov
        |  FROM tb b JOIN tc c ON b.w = c.w GROUP BY 1, 2, 3, 4),
        |p AS (SELECT url, curl,
        |    CAST(ov AS DOUBLE) / (na + nb - ov) AS jacraw FROM o
        |  WHERE CAST(ov AS DOUBLE) / (na + nb - ov) >= 0.8),
        |best AS (SELECT url, curl, jacraw,
        |  row_number() OVER (PARTITION BY url
        |    ORDER BY jacraw DESC, curl) AS rn FROM p)
        |SELECT bat.url, b.curl AS dup_of, b.jaccard,
        |  b.curl IS NULL AS is_novel
        |FROM bat LEFT JOIN (SELECT url, curl, round(jacraw, 6) AS jaccard
        |  FROM best WHERE rn = 1) b ON bat.url = b.url""".stripMargin,
    // mirrors q_cluster_histogram: block sizes from the same planted
    // corpus + minLen floor, rolled to (size → clusters, docs)
    "q_cluster_histogram" ->
      s"""$plantedCte,
        |live AS (SELECT md5(text) AS h, count(*) AS n FROM docs
        |  WHERE length(text) >= 60 GROUP BY 1)
        |SELECT CAST(n AS BIGINT) AS cluster_size,
        |  CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(sum(n) AS BIGINT) AS n_docs
        |FROM live GROUP BY 1""".stripMargin,
    // mirrors q_crawl_budget: same plant + shells, digest distinct via
    // md5, the q_soft404 flag rule, integer permilles
    "q_crawl_budget" ->
      s"""$plantedCte,
        |p AS (SELECT
        |  'h' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS host,
        |  CASE WHEN doc_id % 17 = 5 THEN
        |    'Error 404 - page not found. The requested document ' ||
        |    'is not available.' ELSE text END AS t
        |  FROM docs),
        |a AS (SELECT host, count(*) AS n_docs,
        |  count(DISTINCT md5(t)) AS n_distinct,
        |  CAST(sum(CASE WHEN regexp_matches(lower(t),
        |      '(404|page not found|file not found|access denied|' ||
        |      'not available|forbidden|server error)')
        |    AND (CASE WHEN length(trim(t)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(t), '\\s+')) END) < 30
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_soft404
        |  FROM p GROUP BY 1)
        |SELECT host, n_docs, n_distinct, n_soft404,
        |  (n_distinct * 1000) // n_docs AS unique_permille,
        |  (n_soft404 * 1000) // n_docs AS soft404_permille,
        |  (n_distinct * 1000) // n_docs - (n_soft404 * 1000) // n_docs
        |    AS priority_permille
        |FROM a""".stripMargin,
    // mirrors q_host_lang_mix: same host cells, rank-1 majority election
    // with the same (count DESC, lang ASC) tie order, integer permille
    "q_host_lang_mix" ->
      """WITH c AS (SELECT
        |  'h' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS host,
        |  lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT host, lang, n,
        |  row_number() OVER (PARTITION BY host ORDER BY n DESC, lang)
        |    AS rk,
        |  sum(n) OVER (PARTITION BY host) AS n_docs
        |  FROM c)
        |SELECT host, lang AS major_lang, n AS n_major,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  (n * 1000) // CAST(n_docs AS BIGINT) AS purity_permille
        |FROM r WHERE rk = 1""".stripMargin,
    // mirrors q_mirror_retire: the q_mirror_hosts pair table at >= 800
    // permille, loser = smaller side (tie -> lexicographically larger),
    // left join back onto all host sizes
    "q_mirror_retire" ->
      s"""$mirrorCte,
        |ov AS (SELECT pr.host_a, pr.host_b, sa.n AS n_a, sb.n AS n_b,
        |    (pr.n_shared * 1000) // least(sa.n, sb.n) AS opm
        |  FROM pr
        |  JOIN sz sa ON pr.host_a = sa.host
        |  JOIN sz sb ON pr.host_b = sb.host),
        |losers AS (SELECT DISTINCT
        |    CASE WHEN n_b < n_a THEN host_b
        |         WHEN n_a < n_b THEN host_a
        |         ELSE greatest(host_a, host_b) END AS host
        |  FROM ov WHERE opm >= 800)
        |SELECT sz.host, CAST(sz.n AS BIGINT) AS n_docs,
        |  (losers.host IS NOT NULL) AS retired
        |FROM sz LEFT JOIN losers ON sz.host = losers.host""".stripMargin,
    // mirrors q_reciprocity: same planted graph, distinct directed edges
    // minus self-loops, reverse-edge membership per out-neighbor
    "q_reciprocity" ->
      """WITH rr AS (SELECT DISTINCT doc_id % 40 AS r FROM documents),
        |e0 AS (SELECT 'h' || CAST(r AS VARCHAR) AS src,
        |    'h' || CAST((r * 7 + 3) % 40 AS VARCHAR) AS dst FROM rr
        |  UNION ALL
        |  SELECT 'h' || CAST(r AS VARCHAR),
        |    'h' || CAST((r * 13 + 5) % 40 AS VARCHAR) FROM rr
        |  UNION ALL
        |  SELECT 'h' || CAST((r * 7 + 3) % 40 AS VARCHAR),
        |    'h' || CAST(r AS VARCHAR) FROM rr WHERE r % 5 = 0),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |rc AS (SELECT a.src, a.dst FROM e a JOIN e b
        |  ON a.src = b.dst AND a.dst = b.src)
        |SELECT e.src AS host, count(*) AS n_out,
        |  CAST(coalesce(sum(CASE WHEN rc.src IS NOT NULL THEN 1 ELSE 0 END),
        |    0) AS BIGINT) AS n_recip
        |FROM e LEFT JOIN rc ON e.src = rc.src AND e.dst = rc.dst
        |GROUP BY e.src""".stripMargin,
    // mirrors q_link_density: same paragraph/anchor patterns ((?s) lazy,
    // portable Java/RE2 subset), integer flag rule, 0-based positions
    "q_link_density" ->
      s"""WITH p AS (SELECT $urlSql AS url,
        |  '<html><p>' || text || '</p><p>see <a href="/x">' ||
        |  CASE WHEN doc_id % 2 = 0 THEN 'ok'
        |       ELSE 'a much longer anchor text segment' END ||
        |  '</a> tail words</p><p class="nav"><a href="/a">Home</a>' ||
        |  '<a href="/b">About</a></p></html>' AS html
        |  FROM documents),
        |pars0 AS (SELECT url, unnest(list_zip(
        |    regexp_extract_all(html, '(?s)<p[^>]*>(.*?)</p>', 1),
        |    range(0, len(regexp_extract_all(html, '(?s)<p[^>]*>(.*?)</p>', 1)))))
        |    AS pr FROM p),
        |pars AS (SELECT url, CAST(pr[2] AS INTEGER) AS pos, pr[1] AS par
        |  FROM pars0),
        |m AS (SELECT url, pos,
        |  CAST(len(trim(regexp_replace(par, '<[^>]*>', '', 'g'))) AS BIGINT)
        |    AS total_len,
        |  CAST(coalesce(list_sum(list_transform(
        |    regexp_extract_all(par, '(?s)<a [^>]*>(.*?)</a>', 1),
        |    x -> len(x))), 0) AS BIGINT) AS link_len
        |  FROM pars)
        |SELECT url, pos, total_len, link_len,
        |  (100 * link_len > 50 * total_len OR total_len = 0) AS boiler
        |FROM m""".stripMargin,
    // mirrors q_robots_gate: full parse replay — same line split, blank-
    // line group ids, star-group membership, empty-rule drop, literal
    // prefix match, and RFC 9309 §2.2.2 precedence (longest prefix wins,
    // Allow wins exact-length ties) re-derived from the raw text via a
    // per-url window over matching rules (the Spark side folds the same
    // order row-locally; the ScalaTest covers grammar corners)
    // mirrors q_crawl_delay: same per-class robots synthesis, same line/
    // group/star parse, strict integer filter, MAX per host
    "q_crawl_delay" ->
      """WITH robots AS (
        |  SELECT 'h' || CAST(r AS VARCHAR) || '.example' AS host,
        |    CASE WHEN r % 4 = 0 THEN 'User-agent: *' || chr(10) ||
        |        'Disallow: /private' || chr(10) || 'Crawl-delay: ' ||
        |        CAST(r % 7 + 1 AS VARCHAR) || chr(10) || chr(10) ||
        |        'User-agent: bot' || chr(10) || 'Crawl-delay: 99'
        |      WHEN r % 4 = 1 THEN 'User-agent: bot' || chr(10) ||
        |        'Crawl-delay: 5'
        |      WHEN r % 4 = 2 THEN 'User-agent: *' || chr(10) ||
        |        'Crawl-delay: fast'
        |      ELSE 'User-agent: *' || chr(10) || 'Disallow:' END AS txt
        |  FROM (SELECT DISTINCT doc_id % 40 AS r FROM documents)),
        |ln0 AS (SELECT host, unnest(list_zip(string_split(txt, chr(10)),
        |    range(1, len(string_split(txt, chr(10))) + 1))) AS pr
        |  FROM robots),
        |ln AS (SELECT host, CAST(pr[2] AS BIGINT) AS pos, trim(pr[1]) AS line
        |  FROM ln0),
        |tag AS (SELECT host, pos, line,
        |  sum(CASE WHEN line = '' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY host ORDER BY pos) AS grp,
        |  CASE WHEN regexp_matches(lower(line), '^user-agent[ \t]*:')
        |    THEN trim(regexp_replace(line, '(?i)^user-agent[ \t]*:[ \t]*', ''))
        |    END AS ua,
        |  CASE WHEN regexp_matches(lower(line), '^crawl-delay[ \t]*:')
        |    THEN trim(regexp_replace(line, '(?i)^crawl-delay[ \t]*:[ \t]*', ''))
        |    END AS cd
        |  FROM ln),
        |star AS (SELECT DISTINCT host, grp FROM tag WHERE ua = '*')
        |SELECT t.host, max(CAST(t.cd AS BIGINT)) AS crawl_delay_s
        |FROM tag t JOIN star s ON t.host = s.host AND t.grp = s.grp
        |WHERE t.cd IS NOT NULL AND regexp_matches(t.cd, '^[0-9]+$')
        |GROUP BY t.host""".stripMargin,
    // mirrors q_doc_chunks: the window rule replayed with range +
    // list_filter (starts are a PREFIX of the stride multiples, so
    // chunk_id = o // stride equals the position index)
    "q_doc_chunks" ->
      s"""$plantedCte,
        |tk AS (SELECT doc_id AS url, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM docs WHERE text IS NOT NULL AND length(text) > 0),
        |st AS (SELECT url, n, toks,
        |  unnest(list_filter(range(0, n, 30),
        |    o -> (o = 0) OR (o - 30 + 40 < n))) AS o FROM tk)
        |SELECT url, o // 30 AS chunk_id,
        |  least(40, n - o) AS n_chunk_tokens,
        |  array_to_string(toks[o + 1 : o + 40], ' ') AS chunk_text
        |FROM st""".stripMargin,
    // mirrors q_quality_calibrate: same histogram machinery as
    // q_quantiles with the keep-rank formula n - ceil(300n/1000) + 1,
    // then the verbatim keep rule
    "q_quality_calibrate" ->
      s"""$plantedCte,
        |hist AS (SELECT n_chars AS v, COUNT(*) AS c FROM docs
        |  WHERE n_chars IS NOT NULL GROUP BY 1),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
        |tot AS (SELECT SUM(c) AS n FROM hist),
        |lr AS (SELECT n - ((300 * n + 999) // 1000) + 1 AS rank, n
        |  FROM tot),
        |th AS (SELECT MIN(v) AS threshold, n FROM lr
        |  JOIN cum ON cum.cum >= lr.rank GROUP BY n),
        |k AS (SELECT COUNT(*) AS kept FROM docs, th
        |  WHERE docs.n_chars >= th.threshold)
        |SELECT 300 AS target_permille, threshold, CAST(n AS BIGINT) AS n,
        |  kept, CAST(kept * 1000 // n AS BIGINT) AS kept_permille
        |FROM th, k""".stripMargin,
    // mirrors q_sitemaps: standalone-record extraction — group machinery
    // deliberately absent (a bot-group sitemap still counts)
    "q_sitemaps" ->
      """WITH robots AS (
        |  SELECT 'h' || CAST(r AS VARCHAR) || '.example' AS host,
        |    CASE WHEN r % 4 = 0 THEN 'Sitemap: https://h' ||
        |        CAST(r AS VARCHAR) || '.example/sm.xml' || chr(10) ||
        |        'User-agent: bot' || chr(10) || 'Disallow: /' || chr(10) ||
        |        'Sitemap: https://cdn.example/shared.xml'
        |      WHEN r % 4 = 1 THEN 'User-agent: *' || chr(10) ||
        |        'Disallow: /x' || chr(10) || chr(10) ||
        |        'Sitemap: https://mirror.example/a.xml' || chr(10) ||
        |        'Sitemap: https://mirror.example/a.xml' || chr(10) ||
        |        'sitemap: HTTPS://mirror.example/b.xml'
        |      WHEN r % 4 = 2 THEN 'Sitemap: /sitemap.xml' || chr(10) ||
        |        'Sitemap: ftp://no.example/x'
        |      ELSE 'User-agent: *' || chr(10) || 'Disallow:' END AS txt
        |  FROM (SELECT DISTINCT doc_id % 40 AS r FROM documents)),
        |ln AS (SELECT host, trim(unnest(string_split(txt, chr(10)))) AS line
        |  FROM robots),
        |sm AS (SELECT host,
        |  trim(regexp_replace(line, '(?i)^sitemap[ \t]*:[ \t]*', '')) AS sitemap_url
        |  FROM ln WHERE regexp_matches(lower(line), '^sitemap[ \t]*:'))
        |SELECT DISTINCT host, sitemap_url FROM sm
        |WHERE regexp_matches(sitemap_url, '(?i)^https?://')""".stripMargin,
    "q_robots_gate" ->
      """WITH robots AS (
        |  SELECT 'h' || CAST(r AS VARCHAR) || '.example' AS host,
        |    CASE WHEN r % 4 = 0 THEN 'User-agent: *' || chr(10) ||
        |        'Disallow: /private' || chr(10) ||
        |        'Allow: /private/pub' || chr(10) || chr(10) ||
        |        'User-agent: bot' || chr(10) || 'Disallow: /'
        |      WHEN r % 4 = 1 THEN 'User-agent: bot' || chr(10) ||
        |        'Disallow: /'
        |      ELSE 'User-agent: bot' || chr(10) || 'User-agent: *' ||
        |        chr(10) || 'Disallow: /secret' END AS txt
        |  FROM (SELECT DISTINCT doc_id % 40 AS r FROM documents)
        |  WHERE r % 4 <> 3),
        |ln0 AS (SELECT host, unnest(list_zip(string_split(txt, chr(10)),
        |    range(1, len(string_split(txt, chr(10))) + 1))) AS pr
        |  FROM robots),
        |ln AS (SELECT host, CAST(pr[2] AS BIGINT) AS pos, trim(pr[1]) AS line
        |  FROM ln0),
        |tag AS (SELECT host, pos, line,
        |  sum(CASE WHEN line = '' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY host ORDER BY pos) AS grp,
        |  CASE WHEN regexp_matches(lower(line), '^user-agent[ \t]*:')
        |    THEN trim(regexp_replace(line, '(?i)^user-agent[ \t]*:[ \t]*', ''))
        |    END AS ua,
        |  CASE WHEN regexp_matches(lower(line), '^disallow[ \t]*:')
        |    THEN trim(regexp_replace(line, '(?i)^disallow[ \t]*:[ \t]*', ''))
        |    END AS dis,
        |  CASE WHEN regexp_matches(lower(line), '^allow[ \t]*:')
        |    THEN trim(regexp_replace(line, '(?i)^allow[ \t]*:[ \t]*', ''))
        |    END AS al
        |  FROM ln),
        |star AS (SELECT DISTINCT host, grp FROM tag WHERE ua = '*'),
        |rules AS (SELECT DISTINCT t.host,
        |    coalesce(t.dis, t.al) AS prefix,
        |    (t.al IS NOT NULL) AS allow
        |  FROM tag t
        |  JOIN star s ON t.host = s.host AND t.grp = s.grp
        |  WHERE coalesce(t.dis, t.al) IS NOT NULL
        |    AND coalesce(t.dis, t.al) <> ''),
        |pages AS (SELECT 'http://h' || CAST(doc_id % 40 AS VARCHAR) ||
        |    '.example' ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/private/p'
        |         WHEN doc_id % 3 = 1 THEN '/private/pub/p'
        |         ELSE '/secret/p' END || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |hp AS (SELECT url,
        |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
        |    AS host,
        |  regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '')
        |    AS path
        |  FROM pages),
        |m AS (SELECT hp.url, r.prefix, r.allow
        |  FROM hp JOIN rules r ON hp.host = r.host
        |    AND starts_with(hp.path, r.prefix)),
        |best AS (SELECT url, allow, row_number() OVER (PARTITION BY url
        |    ORDER BY len(prefix) DESC, allow DESC) AS rn FROM m)
        |SELECT hp.url, coalesce(NOT b.allow, false) AS blocked
        |FROM hp LEFT JOIN (SELECT url, allow FROM best WHERE rn = 1) b
        |  ON hp.url = b.url""".stripMargin,
    // mirrors q_noindex: same meta synthesis, same two attribute-order
    // patterns over lower(html)
    "q_noindex" ->
      s"""WITH p AS (SELECT $urlSql AS url,
        |  '<html><head>' ||
        |  CASE WHEN doc_id % 7 = 2
        |    THEN '<meta name="robots" content="noindex, nofollow">'
        |    WHEN doc_id % 7 = 5
        |    THEN '<meta content=''NOINDEX'' name=''robots''>'
        |    WHEN doc_id % 7 = 3
        |    THEN '<meta name="robots" content="nofollow">'
        |    WHEN doc_id % 7 = 1
        |    THEN '<meta name="keywords" content="noindex discussion">'
        |    ELSE '' END ||
        |  '</head><body>' || text || '</body></html>' AS html
        |  FROM documents)
        |SELECT url,
        |  regexp_matches(lower(html),
        |    '<meta [^>]*name=["'']robots["''][^>]*content=["''][^"'']*noindex')
        |  OR regexp_matches(lower(html),
        |    '<meta [^>]*content=["''][^"'']*noindex[^"'']*["''][^>]*name=["'']robots["'']')
        |  AS noindex
        |FROM p""".stripMargin,
    // mirrors q_tfidf: same whitespace class, df from the per-doc tf
    // table, idf_micro = round((ln N − ln df)·10⁶) — integer scores, so
    // the rank replays bit-identically (ties: score DESC, token ASC)
    "q_tfidf" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |    x -> x <> '')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t
        |  GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  tf.tf * CAST(round((ln(nn.n) - ln(df.df)) * 1000000) AS BIGINT)
        |    AS score_micro
        |  FROM tf JOIN df USING (token) CROSS JOIN nn),
        |r AS (SELECT doc_id, token, tf, df, score_micro,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, token) AS INTEGER) AS rk FROM sc)
        |SELECT doc_id, token, tf, df, score_micro, rk FROM r
        |WHERE rk <= 3""".stripMargin,
    // mirrors q_anchor_text: same page synthesis, same <a href> pair
    // pattern (LinkGraph.AnchorPat), positional zip, same normalization
    // and plurality election (cnt DESC, anchor DESC == max(struct))
    "q_anchor_text" ->
      s"""WITH p AS (SELECT
        |  '<html><p>x</p><a href="http://h' ||
        |    CAST((doc_id % 40 * 7 + 3) % 40 AS VARCHAR) || '.example/x">' ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' Read  More '
        |         WHEN doc_id % 3 = 1 THEN 'Click HERE'
        |         ELSE 'details' END ||
        |    '</a><a href=''http://h' ||
        |    CAST((doc_id % 40 * 13 + 5) % 40 AS VARCHAR) ||
        |    '.example/y''>site ' || CAST(doc_id % 40 AS VARCHAR) ||
        |    '</a><a href="/rel">v</a><a href="http://h' ||
        |    CAST((doc_id % 40 + 1) % 40 AS VARCHAR) ||
        |    '.example/z">  </a></html>' AS html
        |  FROM documents),
        |z AS (SELECT
        |  regexp_extract_all(html,
        |    '<a [^>]*href=["'']([^"'']+)["''][^>]*>([^<]*)</a>', 1) AS ds,
        |  regexp_extract_all(html,
        |    '<a [^>]*href=["'']([^"'']+)["''][^>]*>([^<]*)</a>', 2) AS ts
        |  FROM p),
        |e0 AS (SELECT unnest(list_zip(ds, ts)) AS pr FROM z),
        |e AS (SELECT
        |  regexp_extract(pr[1], '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
        |    AS dst,
        |  trim(regexp_replace(lower(pr[2]), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))
        |    AS anchor
        |  FROM e0),
        |pa AS (SELECT dst, anchor, count(*) AS cnt FROM e
        |  WHERE dst <> '' AND anchor <> '' GROUP BY dst, anchor),
        |rk AS (SELECT dst, anchor, cnt,
        |  row_number() OVER (PARTITION BY dst
        |    ORDER BY cnt DESC, anchor DESC) AS rn,
        |  CAST(sum(cnt) OVER (PARTITION BY dst) AS BIGINT) AS n_refs,
        |  count(*) OVER (PARTITION BY dst) AS n_anchors FROM pa)
        |SELECT dst, n_refs, n_anchors, anchor AS top_anchor, cnt AS top_cnt
        |FROM rk WHERE rn = 1""".stripMargin,
    // mirrors q_domain_split: host → public-suffix-aware registered
    // domain (the interpolated CASE is PublicSuffix.registeredDomainCaseSql
    // — the SAME snapshot the engine probes) → md5 draw; hex thresholds
    // are floor(f·2^32) (0.8 → cccccccc, 0.9 → e6666666)
    "q_domain_split" ->
      s"""WITH u AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3
        |    THEN 'https://www.' || source || '.example/d' ||
        |      CAST(doc_id % 5 AS VARCHAR) || '/doc' ||
        |      CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN doc_id % 7 = 5
        |    THEN 'https://www.' || source || '.co.uk/doc' ||
        |      CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN doc_id % 7 = 1
        |    THEN 'https://' || source || '.co.uk/doc' ||
        |      CAST(doc_id AS VARCHAR) || '.html'
        |    ELSE $urlSql END AS url FROM documents),
        |h AS (SELECT doc_id,
        |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host
        |  FROM u),
        |p AS (SELECT doc_id, host, string_split(host, '.') AS parts FROM h),
        |d AS (SELECT doc_id,
        |  ${PublicSuffix.registeredDomainCaseSql("host", "parts")} AS domain
        |  FROM p),
        |k AS (SELECT doc_id, domain,
        |  substring(md5(domain || ':7'), 1, 8) AS key FROM d)
        |SELECT doc_id, domain,
        |  CASE WHEN key < 'cccccccc' THEN 'train'
        |       WHEN key < 'e6666666' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM k""".stripMargin,

    // mirrors q_domain_blocklist: same url construction, host regex,
    // public-suffix-aware registered domain (shared CASE snapshot), and
    // the domain-or-host list membership
    "q_domain_blocklist" ->
      s"""WITH u AS (SELECT doc_id, CASE WHEN doc_id % 11 = 6
        |    THEN 'https://h' || CAST(doc_id % 97 AS VARCHAR) || '.shop' ||
        |      CAST(doc_id % 13 AS VARCHAR) || '.co.uk/p' ||
        |      CAST(doc_id AS VARCHAR)
        |    ELSE 'https://h' || CAST(doc_id % 97 AS VARCHAR) || '.site' ||
        |      CAST(doc_id % 13 AS VARCHAR) || '.example/p' ||
        |      CAST(doc_id AS VARCHAR) END AS url FROM documents),
        |h AS (SELECT doc_id,
        |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host
        |  FROM u),
        |p AS (SELECT doc_id, host, string_split(host, '.') AS parts FROM h),
        |d AS (SELECT doc_id, lower(host) AS host,
        |  lower(coalesce(
        |    ${PublicSuffix.registeredDomainCaseSql("host", "parts")},
        |    '')) AS domain
        |  FROM p)
        |SELECT doc_id, domain,
        |  domain IN ('site2.example', 'site5.example', 'site11.example',
        |    'h40.site1.example', 'shop4.co.uk')
        |  OR host IN ('site2.example', 'site5.example', 'site11.example',
        |    'h40.site1.example', 'shop4.co.uk') AS blocked
        |FROM d""".stripMargin,

    // mirrors q_domain_quality: same plant, url, public-suffix-aware
    // registered domain (shared CASE snapshot), and the exact
    // sum(long)/count mean
    "q_domain_quality" ->
      s"""WITH pl AS (SELECT doc_id, CASE WHEN doc_id % 13 IN (3, 6)
        |    THEN array_to_string(string_split(text, ' ')[1:20], ' ')
        |    ELSE text END AS text FROM documents),
        |u AS (SELECT doc_id, len(string_split(text, ' ')) AS score,
        |  'https://h' || CAST(doc_id % 97 AS VARCHAR) || '.site' ||
        |    CAST(doc_id % 13 AS VARCHAR) ||
        |    CASE WHEN doc_id % 13 IN (3, 6) THEN '.co.uk/p'
        |      ELSE '.example/p' END ||
        |    CAST(doc_id AS VARCHAR) AS url FROM pl),
        |h AS (SELECT doc_id, score,
        |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host
        |  FROM u),
        |p AS (SELECT doc_id, score, host, string_split(host, '.') AS parts
        |  FROM h),
        |d AS (SELECT doc_id, score, lower(coalesce(
        |    ${PublicSuffix.registeredDomainCaseSql("host", "parts")},
        |    '')) AS domain
        |  FROM p),
        |m AS (SELECT domain,
        |  round(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS domain_mean
        |  FROM d GROUP BY 1)
        |SELECT d.doc_id, d.domain, m.domain_mean,
        |  m.domain_mean < 60.0 AS low_quality_domain
        |FROM d JOIN m USING (domain)""".stripMargin,

    // mirrors q_blocklist: identical planting, the SAME RE2-safe pattern
    // string the engine compiles (exposed by QualityFilters.blocklistPattern)
    "q_blocklist" ->
      s"""WITH planted AS (SELECT doc_id, CASE
        |    WHEN doc_id % 11 = 4 THEN text || ' win the casino lottery now'
        |    WHEN doc_id % 11 = 7 THEN text || ' casinos and viagras are words'
        |    ELSE text END AS text FROM documents)
        |SELECT doc_id, regexp_matches(lower(text),
        |  '${QualityFilters.blocklistPattern(QualityFilters.defaultBlocklist)}')
        |  AS flagged
        |FROM planted""".stripMargin,

    // mirrors q_nb_quality: retrain the (word, class-count) model from the
    // even-id labeled slice, rescore via the same integer micro-llr sum
    "q_nb_quality" ->
      s"""WITH planted AS (SELECT doc_id, CASE WHEN doc_id % 5 = 3
        |    THEN '$nbSpamFix' ELSE text END AS text FROM documents),
        |tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(
        |  lower(text), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w FROM planted),
        |tr AS (SELECT w, CASE WHEN doc_id % 5 = 3 THEN 0 ELSE 1 END AS y
        |  FROM tok WHERE doc_id % 2 = 0),
        |model AS (SELECT w,
        |  SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS cp,
        |  SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS cn FROM tr GROUP BY w),
        |tot AS (SELECT SUM(cp) AS tp, SUM(cn) AS tn, COUNT(*) AS v FROM model),
        |mw AS (SELECT w, CAST(round((ln(cp + 1) - ln(tp + v) - ln(cn + 1)
        |  + ln(tn + v)) * 1000000) AS BIGINT) AS llr FROM model, tot),
        |u0 AS (SELECT CAST(round((ln(tn + v) - ln(tp + v)) * 1000000)
        |  AS BIGINT) AS llr0 FROM tot),
        |sc AS (SELECT t.doc_id, SUM(COALESCE(m.llr, u0.llr0)) AS s
        |  FROM tok t LEFT JOIN mw m ON t.w = m.w CROSS JOIN u0
        |  GROUP BY t.doc_id)
        |SELECT p.doc_id,
        |  CAST(COALESCE(sc.s, 0) AS BIGINT) AS score_micro,
        |  COALESCE(sc.s, 0) > 0 AS pred_pos
        |FROM planted p LEFT JOIN sc ON p.doc_id = sc.doc_id""".stripMargin,

    // mirrors q_host_boilerplate: same chunk/plant CTEs as q_line_dedup,
    // then df per (source, line TEXT) — host-scoped strip + reassembly
    "q_host_boilerplate" ->
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents),
        |ch AS (SELECT doc_id, source,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls
        |  FROM d),
        |pl AS (SELECT doc_id, source,
        |  list_append(ls, 'all rights reserved by ' || source) AS ls1
        |  FROM ch),
        |pl2 AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 10 = 0
        |    THEN list_append(ls1, 'a famous quote cited everywhere')
        |    ELSE ls1 END AS ls
        |  FROM pl),
        |l AS (SELECT doc_id, source,
        |  unnest(list_transform(range(1, len(ls) + 1),
        |    i -> {'pos': i, 'line': ls[CAST(i AS INT)]})) AS e
        |  FROM pl2),
        |ln AS (SELECT doc_id, source, e.pos AS pos, e.line AS line FROM l),
        |df AS (SELECT source, line, count(DISTINCT doc_id) AS df
        |  FROM ln GROUP BY source, line),
        |mk AS (SELECT ln.doc_id, ln.pos, ln.line, df.df >= 10 AS strip
        |  FROM ln JOIN df ON ln.source = df.source AND ln.line = df.line)
        |SELECT CAST(doc_id AS VARCHAR) AS url,
        |  coalesce(string_agg(CASE WHEN NOT strip THEN line END, chr(10)
        |    ORDER BY pos), '') AS kept_text,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN strip THEN 1 ELSE 0 END) AS BIGINT) AS n_stripped
        |FROM mk GROUP BY doc_id""".stripMargin,

    // mirrors q_epoch_mix: copies = floor(w) + md5-threshold extra, one
    // epoch row per copy (0.5 → 80000000, 0.25 → 40000000)
    "q_epoch_mix" ->
      s"""WITH k AS (SELECT doc_id, lang,
        |  substring(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 8) AS key
        |  FROM documents),
        |n AS (SELECT doc_id, lang, CASE
        |  WHEN lang = 'en' THEN 2 + CASE WHEN key < '80000000' THEN 1 ELSE 0 END
        |  WHEN lang = 'de' THEN 1
        |  WHEN lang = 'fr' THEN CASE WHEN key < '40000000' THEN 1 ELSE 0 END
        |  WHEN lang = 'zh' THEN 3
        |  ELSE 0 END AS c FROM k)
        |SELECT doc_id, lang, CAST(unnest(range(0, c)) AS INT) AS epoch
        |FROM n WHERE c > 0""".stripMargin,

    // mirrors q_containment: exhaustive directional containment over the
    // same base + first-10-word quote items
    "q_containment" ->
      s"""WITH b0 AS (SELECT doc_id AS item_id,
        |  list_distinct(list_filter(string_split_regex(lower(text),
        |    '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS toks
        |  FROM documents WHERE doc_id % 4 = 0),
        |q0 AS (SELECT doc_id + 8000000 AS item_id,
        |  list_distinct(list_filter(string_split_regex(lower(
        |    array_to_string((string_split(text, ' '))[1:10], ' ')),
        |    '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS toks
        |  FROM documents WHERE doc_id % 20 = 0),
        |b AS (SELECT * FROM b0 UNION ALL SELECT * FROM q0),
        |t AS (SELECT item_id, len(toks) AS n, unnest(toks) AS w FROM b),
        |o AS (SELECT a.item_id AS id_sub, c.item_id AS id_sup, a.n AS na,
        |  count(*) AS ov
        |  FROM t a JOIN t c ON a.w = c.w AND a.item_id <> c.item_id
        |  GROUP BY 1, 2, 3)
        |SELECT id_sub, id_sup, round(CAST(ov AS DOUBLE) / na, 6) AS cont
        |FROM o WHERE round(CAST(ov AS DOUBLE) / na, 6) >= 0.8""".stripMargin,

    // mirrors q_unicode_dedup: suffixes rebuilt via chr() codepoints
    // (769 = U+0301 combining acute, 776 = U+0308 combining diaeresis,
    // 233/239 = composed é/ï), then DuckDB's own NFC kernel
    "q_unicode_dedup" ->
      s"""WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 2 = 0
        |    THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |    ELSE ' caf' || chr(233) || ' na' || chr(239) || 've' END AS text
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(text) AS norm_text,
        |  nfc_normalize(text) <> text AS changed,
        |  sha256(nfc_normalize(text)) AS norm_sha
        |FROM p""".stripMargin,

    // mirrors q_datacard: same cell aggregates + share window; sums cast
    // BIGINT (DuckDB sum(int) is HUGEINT)
    "q_datacard" ->
      s"""WITH c AS (SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  avg(length(text)) AS mean_chars,
        |  count(DISTINCT sha256(text)) AS n_distinct
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, source, n_docs, n_tokens, n_chars, mean_chars,
        |  n_distinct,
        |  1.0 - CAST(n_distinct AS DOUBLE) / n_docs AS dup_rate,
        |  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share
        |FROM c""".stripMargin,

    // mirrors q_mix_solve: same sum + IEEE double weight arithmetic
    "q_mix_solve" ->
      s"""WITH a AS (SELECT lang AS stratum,
        |  CAST(sum(n_chars) AS BIGINT) AS available_tokens
        |  FROM documents WHERE lang IN ('en','de','fr','zh') GROUP BY lang),
        |w AS (SELECT stratum, available_tokens,
        |  CAST(CASE stratum WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.2
        |    WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.2 END AS DOUBLE)
        |    * CAST(1000000 AS DOUBLE) AS target_tokens
        |  FROM a)
        |SELECT stratum, available_tokens, target_tokens,
        |  least(target_tokens / available_tokens, 4.0) AS weight,
        |  target_tokens / available_tokens > 4.0 AS capped,
        |  least(target_tokens / available_tokens, 4.0) * available_tokens
        |    AS realized_tokens
        |FROM w""".stripMargin,

    // mirrors q_quality_sample: per-row probability → per-row hex
    // threshold (the q_budget_mix construction) → md5 keep decision
    "q_quality_sample" ->
      s"""WITH p AS (SELECT doc_id, n_chars,
        |  least(1.0, n_chars / 1000.0) AS pr,
        |  substring(md5(CAST(doc_id AS VARCHAR) || ':17'), 1, 8) AS key
        |  FROM documents)
        |SELECT doc_id, n_chars FROM p
        |WHERE pr >= 1.0 OR key < lpad(lower(to_hex(CAST(least(
        |  floor(pr * 4294967296.0), 4294967295.0) AS BIGINT))), 8, '0')""".stripMargin,

    // mirrors q_budget_mix: weights re-derived as in q_mix_solve, then the
    // same floor(w) + md5-threshold draw as q_epoch_mix, with the hex
    // threshold computed from the weight (lpad(to_hex(floor(frac·2^32))))
    "q_budget_mix" ->
      s"""WITH a AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail
        |  FROM documents WHERE lang IN ('en','de','fr','zh') GROUP BY lang),
        |w AS (SELECT lang, least(
        |  CAST(CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.2
        |    WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.2 END AS DOUBLE)
        |    * CAST(1000000 AS DOUBLE) / avail, 4.0) AS wt FROM a),
        |k AS (SELECT d.doc_id, d.lang, d.n_chars, w.wt,
        |  substring(md5(CAST(d.doc_id AS VARCHAR) || ':13'), 1, 8) AS key
        |  FROM documents d JOIN w ON d.lang = w.lang),
        |n AS (SELECT doc_id, lang, n_chars,
        |  CAST(floor(wt) AS INT) + CASE WHEN wt - floor(wt) > 0 AND key <
        |    lpad(lower(to_hex(CAST(least(floor((wt - floor(wt)) * 4294967296.0),
        |      4294967295.0) AS BIGINT))), 8, '0')
        |    THEN 1 ELSE 0 END AS c
        |  FROM k)
        |SELECT doc_id, lang, n_chars, CAST(unnest(range(0, c)) AS INT)
        |  AS epoch
        |FROM n WHERE c > 0""".stripMargin,

    // mirrors q_within_doc_dedup: same chunk + first-line re-append plant;
    // keep a line iff list_position finds it first at its own position
    "q_within_doc_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls0
        |  FROM d),
        |pl AS (SELECT doc_id, list_append(ls0, ls0[1]) AS ls FROM ch),
        |l AS (SELECT doc_id, ls,
        |  unnest(list_transform(range(1, len(ls) + 1),
        |    i -> {'pos': i, 'line': ls[CAST(i AS INT)]})) AS e
        |  FROM pl)
        |SELECT CAST(doc_id AS VARCHAR) AS url,
        |  coalesce(string_agg(
        |    CASE WHEN list_position(ls, e.line) = e.pos THEN e.line END,
        |    chr(10) ORDER BY e.pos), '') AS kept_text,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN list_position(ls, e.line) = e.pos
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_stripped
        |FROM l GROUP BY doc_id""".stripMargin,

    // mirrors q_dsir: retrain both hashed-bigram bucket models (target
    // slice vs raw corpus, TOTAL 4096-bucket space) and rescore via the
    // same integer micro-weight sum
    "q_dsir" ->
      s"""WITH planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 2 OR doc_id % 9 = 5
        |    THEN '$dsirTargetFix' || ' ' || text ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
        |  '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ws FROM planted),
        |big AS (SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS g FROM tok)),
        |tcnt AS (SELECT bucket, count(*) AS ct FROM big
        |  WHERE doc_id % 9 = 2 GROUP BY 1),
        |rcnt AS (SELECT bucket, count(*) AS cr FROM big GROUP BY 1),
        |allb AS (SELECT printf('%03x', i) AS bucket FROM range(0, 4096) t(i)),
        |m AS (SELECT a.bucket, COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
        |  FROM allb a LEFT JOIN tcnt USING (bucket)
        |  LEFT JOIN rcnt USING (bucket)),
        |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM m),
        |w AS (SELECT bucket, CAST(round((ln(ct + 1) - ln(tt + 4096)
        |  - ln(cr + 1) + ln(tr + 4096)) * 1000000) AS BIGINT) AS wm
        |  FROM m, tot),
        |sc AS (SELECT b.doc_id, count(*) AS n, SUM(w.wm) AS s
        |  FROM big b JOIN w USING (bucket) GROUP BY 1)
        |SELECT p.doc_id, CAST(COALESCE(sc.n, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(sc.s, 0) AS BIGINT) AS weight_micro,
        |  COALESCE(sc.s, 0) > 0 AS pred_target
        |FROM planted p LEFT JOIN sc ON p.doc_id = sc.doc_id""".stripMargin,

    // mirrors q_keep_best: max-q-then-min-id survivor per sha group
    "q_keep_best" ->
      s"""$plantedCte,
        |h AS (SELECT doc_id, (doc_id * 31) % 101 AS q, md5(text) AS sha
        |  FROM docs)
        |SELECT doc_id, sha, q FROM (
        |  SELECT doc_id, sha, q,
        |    row_number() OVER (PARTITION BY sha ORDER BY q DESC, doc_id) AS rn
        |  FROM h) WHERE rn = 1""".stripMargin,

    "q_setsim_pairs" ->
      s"""$setsimCte
        |SELECT id1, id2, jac FROM pr WHERE jac >= 0.8""".stripMargin,

    "q_setsim_keep" ->
      s"""$setsimCte
        |SELECT b.item_id, b.item_id NOT IN (
        |  SELECT id2 FROM pr WHERE jac >= 0.8) AS kept FROM b""".stripMargin,

    "q_setsim_weighted" ->
      s"""$setsimWeightedCte
        |SELECT id1, id2, jac FROM pr WHERE jac >= 0.8""".stripMargin,

    // mirrors q_heavy_hitters: the sketch+recount output is EXACT, so the
    // truth is the plain frequency query the sketch avoids running at scale
    "q_heavy_hitters" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text),
        |    '[ \t\n\f\r]+'), x -> x <> '')) AS tok FROM documents),
        |i AS (SELECT CASE WHEN doc_id % 5 = 0 THEN tok
        |  ELSE tok || '#' || CAST(doc_id AS VARCHAR) END AS item FROM t)
        |SELECT item, count(*) AS cnt FROM i
        |GROUP BY 1 HAVING count(*) >= 120""".stripMargin,

    // mirrors q_pagerank: replay all 10 integer power-iteration rounds as
    // chained CTEs — pure integer div/sum, so the replay is bit-exact
    "q_pagerank" -> pagerankOracle,

    // mirrors q_ngram_lm: retrain the three gram tables on the %11==4
    // slice and rescore every position through the same three-branch
    // Stupid Backoff CASE with the same micro-nat quantization
    "q_ngram_lm" ->
      s"""WITH planted AS MATERIALIZED (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 4 OR doc_id % 11 = 8
        |    THEN '$dsirTargetFix' || ' ' || text ELSE text END AS text
        |  FROM documents),
        |tok AS MATERIALIZED (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),
        |    '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ws FROM planted),
        |tr AS MATERIALIZED (SELECT ws FROM tok WHERE doc_id % 11 = 4),
        |c1 AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM (
        |  SELECT unnest(ws) AS gram FROM tr) GROUP BY 1),
        |c2 AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM (
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS gram FROM tr) GROUP BY 1),
        |c3 AS MATERIALIZED (SELECT gram, count(*) AS cnt FROM (
        |  SELECT unnest(list_transform(range(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
        |  FROM tr) GROUP BY 1),
        |tot AS MATERIALIZED (SELECT
        |  (SELECT COALESCE(SUM(len(ws)), 0) FROM tr) AS t,
        |  (SELECT COUNT(*) FROM c1) AS v),
        |pos AS MATERIALIZED (SELECT doc_id,
        |    ws[i+1] AS b, ws[i+2] AS w,
        |    ws[i] || ' ' || ws[i+1] AS g2ctx,
        |    ws[i+1] || ' ' || ws[i+2] AS g2g,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g3g
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
        |    FROM tok)),
        |sc AS MATERIALIZED (SELECT p.doc_id,
        |    CASE WHEN t3.cnt IS NOT NULL AND x2.cnt IS NOT NULL
        |      THEN CAST(round((ln(t3.cnt) - ln(x2.cnt)) * 1000000)
        |        AS BIGINT)
        |    WHEN n2.cnt IS NOT NULL AND x1.cnt IS NOT NULL
        |      THEN CAST(round(ln(0.4) * 1000000) AS BIGINT)
        |        + CAST(round((ln(n2.cnt) - ln(x1.cnt)) * 1000000)
        |          AS BIGINT)
        |    ELSE 2 * CAST(round(ln(0.4) * 1000000) AS BIGINT)
        |      + CAST(round((ln(COALESCE(n1.cnt, 0) + 1) - ln(t + v))
        |        * 1000000) AS BIGINT) END AS s
        |  FROM pos p
        |  LEFT JOIN c3 t3 ON t3.gram = p.g3g
        |  LEFT JOIN c2 x2 ON x2.gram = p.g2ctx
        |  LEFT JOIN c2 n2 ON n2.gram = p.g2g
        |  LEFT JOIN c1 x1 ON x1.gram = p.b
        |  LEFT JOIN c1 n1 ON n1.gram = p.w
        |  CROSS JOIN tot),
        |agg AS (SELECT doc_id, COUNT(*) AS n_scored, SUM(s) AS lm_micro
        |  FROM sc GROUP BY 1)
        |SELECT p.doc_id,
        |  CAST(COALESCE(a.n_scored, 0) AS BIGINT) AS n_scored,
        |  CAST(COALESCE(a.lm_micro, 0) AS BIGINT) AS lm_micro,
        |  CAST(CASE WHEN COALESCE(a.n_scored, 0) > 0
        |    THEN -((-a.lm_micro) // a.n_scored) ELSE 0 END AS BIGINT)
        |    AS avg_micro
        |FROM planted p LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // mirrors q_linkgraph_html: same page synthesis, then the same href
    // regex + host regex replayed by DuckDB
    "q_linkgraph_html" ->
      """WITH pages AS MATERIALIZED (SELECT
        |  'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.example/p'
        |    || CAST(doc_id AS VARCHAR) AS url,
        |  '<html><body><p>' || text || '</p><a href="http://h'
        |    || CAST(((doc_id % 40) * 7 + 3) % 40 AS VARCHAR)
        |    || '.example/x">t</a><a href=''http://h'
        |    || CAST(((doc_id % 40) * 13 + 5) % 40 AS VARCHAR)
        |    || '.example/y''>u</a><a href="/rel">v</a></body></html>'
        |    AS html FROM documents),
        |lnk AS (SELECT
        |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
        |    AS src,
        |  unnest(regexp_extract_all(html, 'href=["'']([^"'']+)["'']', 1))
        |    AS u2 FROM pages)
        |SELECT DISTINCT src,
        |  regexp_extract(u2, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
        |    AS dst
        |FROM lnk WHERE src <> '' AND
        |  regexp_extract(u2, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
        |    <> ''""".stripMargin,

    // mirrors q_frontier: same page synthesis, href regex, absolute-url
    // filter, canonUrl chain (fragment → utm runs → lowercased head),
    // canonical-url counts, anti-join vs the crawled set (whose canon is
    // provably the identity here — no fragments, utm params, or
    // uppercase heads in the crawled urls)
    "q_frontier" ->
      s"""$frontierCte
        |SELECT url, n_refs FROM frontier""".stripMargin,
    // mirrors q_fetch_plan: frontier → robots verdict → per-host cap.
    // The fixture's single robots shape (even-numbered hosts Disallow
    // /new) reduces the full RFC parse — already oracled by
    // q_robots_gate — to one predicate, replayed here verbatim
    "q_fetch_plan" ->
      s"""$frontierCte,
        |g AS (SELECT url, n_refs,
        |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
        |  regexp_replace(url,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '') AS path FROM frontier),
        |al AS (SELECT host, url, n_refs FROM g
        |  WHERE NOT (TRY_CAST(regexp_extract(host, '^h([0-9]+)', 1) AS INT)
        |    % 2 = 0 AND path LIKE '/new%')),
        |rk AS (SELECT host, url, n_refs,
        |  row_number() OVER (PARTITION BY host
        |    ORDER BY n_refs DESC, url) AS rank FROM al)
        |SELECT host, url, n_refs, CAST(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= 2""".stripMargin,
    // mirrors q_quantiles: same histogram + cumulative window + integer
    // permille rank rule — rank = (p·N + 999) // 1000, value = min v with
    // cum ≥ rank
    "q_quantiles" ->
      """WITH hist AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY 1),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
        |tot AS (SELECT SUM(c) AS n FROM hist),
        |lv AS (SELECT unnest([10,100,250,500,750,900,990,1000])
        |  AS p_mille),
        |lr AS (SELECT p_mille, (p_mille * n + 999) // 1000 AS rank, n
        |  FROM lv, tot)
        |SELECT CAST(p_mille AS INT) AS p_mille, MIN(v) AS value,
        |  CAST(rank AS BIGINT) AS rank, CAST(n AS BIGINT) AS n
        |FROM lr JOIN cum ON cum.cum >= lr.rank
        |GROUP BY 1, 3, 4""".stripMargin,

    "q_edit_pairs" ->
      s"""$editPairsCte
        |SELECT id1, id2, dist FROM pr""".stripMargin,

    "q_edit_keep" ->
      s"""$editPairsCte
        |SELECT it.item_id, it.item_id NOT IN (
        |  SELECT id2 FROM pr) AS kept FROM it""".stripMargin,

    "q_setsim_across" ->
      s"""$setsimAcrossCte
        |SELECT probe_id, corpus_id, jac FROM pr WHERE jac >= 0.8""".stripMargin,

    "q_novel_docs" ->
      s"""$setsimAcrossCte
        |SELECT probe.item_id, probe.item_id NOT IN (
        |  SELECT probe_id FROM pr WHERE jac >= 0.8) AS kept FROM probe""".stripMargin,

    "q_exact_dup_groups" ->
      s"""$plantedCte
        |SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS rep_id
        |FROM docs GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q_dup_states" ->
      s"""$plantedCte
        |SELECT doc_id,
        |  CASE WHEN length(text) < 60 THEN 'ignored'
        |       WHEN count(*) OVER (PARTITION BY md5(text)) = 1 THEN 'unique'
        |       WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 'keep'
        |       ELSE 'delete' END AS state
        |FROM docs""".stripMargin,
    "q_state_stats" ->
      s"""$plantedCte,
        |st AS (
        |  SELECT length(text) AS len,
        |    CASE WHEN length(text) < 60 THEN 'ignored'
        |         WHEN count(*) OVER (PARTITION BY md5(text)) = 1 THEN 'unique'
        |         WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 'keep'
        |         ELSE 'delete' END AS state
        |  FROM docs)
        |SELECT state, count(*) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS n_chars
        |FROM st GROUP BY 1""".stripMargin,
    "q_dedup_decisions_exact" ->
      s"""$plantedCte,
        |pages AS (
        |  SELECT doc_id, $urlSql AS url, text FROM docs),
        |live AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY md5(text)) AS cnt,
        |    min(doc_id) OVER (PARTITION BY md5(text)) AS min_id
        |  FROM pages WHERE length(text) >= 60)
        |SELECT p.url,
        |  CAST(coalesce(l.cnt, 1) AS BIGINT) AS cluster_size,
        |  CASE WHEN length(p.text) < 60 THEN 'ignored'
        |       WHEN l.cnt = 1 THEN 'unique'
        |       WHEN p.doc_id = l.min_id THEN 'keep'
        |       ELSE 'delete' END AS state
        |FROM pages p LEFT JOIN live l ON p.doc_id = l.doc_id""".stripMargin,
    "q_near_dup_clusters" ->
      s"""$nearDupClusterCte
        |SELECT un AS url, min(r) AS cluster FROM reach GROUP BY un""".stripMargin,
    // mirrors q_dup_recall: the SAME planted truth pairs graded against the
    // exhaustive-Jaccard recursive-CTE clusters — matching permille proves
    // the engine's LSH recall equals the exact graph's
    "q_dup_recall" ->
      s"""$nearDupClusterCte,
        |lab AS (SELECT un AS url, min(r) AS cluster FROM reach GROUP BY un),
        |tr AS (SELECT $urlSql AS a,
        |    'https://' || source || '.example/d' ||
        |    CAST((doc_id + 3000000) % 5 AS VARCHAR) || '/doc' ||
        |    CAST(doc_id + 3000000 AS VARCHAR) || '.html' AS b
        |  FROM base WHERE doc_id % 25 = 7),
        |hit AS (SELECT count(*) AS n_hit FROM tr
        |  JOIN lab la ON tr.a = la.url
        |  JOIN lab lb ON tr.b = lb.url
        |  WHERE la.cluster = lb.cluster),
        |cp AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT)
        |    AS n_cluster_pairs
        |  FROM (SELECT count(*) AS n FROM lab GROUP BY cluster)),
        |nt AS (SELECT count(*) AS n_truth FROM tr)
        |SELECT CAST(nt.n_truth AS BIGINT) AS n_truth,
        |  CAST(hit.n_hit AS BIGINT) AS n_hit,
        |  cp.n_cluster_pairs,
        |  (hit.n_hit * 1000) // nt.n_truth AS recall_permille
        |FROM nt, hit, cp""".stripMargin,
    // mirrors q_cluster_keep_best: the same cluster truth + a keep-best
    // rank window (max whitespace-token count, ties toward the min url)
    "q_cluster_keep_best" ->
      s"""$nearDupClusterCte,
        |lab AS (SELECT un AS url, min(r) AS cluster FROM reach GROUP BY un)
        |SELECT url, rn = 1 AS kept FROM (
        |  SELECT l.url,
        |    row_number() OVER (PARTITION BY l.cluster
        |      ORDER BY len(u.w) DESC, l.url) AS rn
        |  FROM lab l JOIN u ON l.url = u.url)""".stripMargin,
    // mirrors q_paragraph_near_dup: same chunk/filter/plant, then the
    // q_near_dup_clusters truth (4-word-shingle Jaccard ≥ 0.8 + recursive
    // CTE CC) at paragraph grain
    "q_paragraph_near_dup" ->
      s"""WITH RECURSIVE dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE doc_id < 40),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 24.0) AS BIGINT)),
        |    i -> array_to_string(w[i*24+1:i*24+24], ' ')) AS ps
        |  FROM dd),
        |pe AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ps) + 1),
        |    i -> {'pidx': i - 1, 'pt': ps[CAST(i AS INT)]})) AS e
        |  FROM ch),
        |pp AS (SELECT doc_id, e.pidx AS pidx, e.pt AS pt FROM pe
        |  WHERE len(string_split(e.pt, ' ')) >= 8),
        |pl AS (SELECT doc_id, pidx, pt FROM pp
        |  UNION ALL
        |  SELECT doc_id + 7000000, pidx, pt || ' tailword' FROM pp
        |  WHERE doc_id % 7 = 2 AND pidx = 0),
        |u AS (SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(pidx AS VARCHAR)
        |    AS url, string_split(pt, ' ') AS w
        |  FROM pl),
        |sh AS (SELECT url, list_distinct(list_transform(range(1, len(w) - 3),
        |    i -> array_to_string(w[i:i+4], ' '))) AS s
        |  FROM u),
        |p AS (SELECT x.url AS a, y.url AS b
        |  FROM sh x JOIN sh y ON x.url < y.url
        |  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |      / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.8),
        |sym AS (SELECT a AS un, b AS vn FROM p
        |  UNION SELECT b, a FROM p
        |  UNION SELECT url, url FROM u),
        |reach(un, r) AS (
        |  SELECT un, vn FROM sym
        |  UNION
        |  SELECT reach.un, sym.vn FROM reach JOIN sym ON reach.r = sym.un)
        |SELECT un AS url, min(r) AS cluster FROM reach GROUP BY un""".stripMargin,
    "q_normalized_dups" ->
      s"""WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000000, upper(text) FROM documents WHERE doc_id % 40 = 3)
        |SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[!-/:-@\\[-`{-~]+', ' ', 'g'), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS h,
        |  count(*) OVER (PARTITION BY md5(trim(regexp_replace(regexp_replace(
        |    lower(text), '[!-/:-@\\[-`{-~]+', ' ', 'g'),
        |    '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))) AS n
        |FROM d""".stripMargin,
    "q_pii_scrub" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 1
        |      THEN text || ' contact bob@example.com or 555-123-4567 asap'
        |      ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b', '<PHONE>', 'g') AS scrubbed
        |FROM d""".stripMargin,
    "q_repetition" ->
      s"""WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 6000000, rtrim(repeat('buy now ', 60))
        |  FROM documents WHERE doc_id % 100 = 9),
        |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
        |b AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY 1, 2),
        |t AS (SELECT doc_id, max(cnt) AS top, sum(cnt) AS nb FROM c GROUP BY 1)
        |SELECT d.doc_id,
        |  round(CAST(coalesce(t.top, 0) AS DOUBLE)
        |    / greatest(coalesce(t.nb, 1), 1), 9) AS top_bigram_frac
        |FROM d LEFT JOIN t ON d.doc_id = t.doc_id""".stripMargin,
    // mirrors q_gopher_repetition: same chunk/plant CTEs, then every
    // repetition signal recomputed over the unit/gram STRINGS (engine
    // groups by (xxhash64, length) — identical while collision-free, and
    // every output depends only on (count, length) so top-gram ties
    // cannot diverge)
    "q_gopher_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls FROM d),
        |pa AS (SELECT doc_id, ls,
        |  list_transform(range(0, CAST(ceil(len(ls) / 2.0) AS BIGINT)),
        |    i -> array_to_string(ls[i*2+1:i*2+2], chr(10))) AS ps FROM ch),
        |q1 AS (SELECT doc_id, ls, CASE WHEN doc_id % 5 = 0
        |  THEN list_append(ps, ps[1]) ELSE ps END AS ps FROM pa),
        |q2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3
        |  THEN list_append(ps, ls[1]) ELSE ps END AS ps FROM q1),
        |q3 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 2
        |  THEN list_append(ps, rtrim(repeat('buy now ', 20))) ELSE ps END AS ps
        |  FROM q2),
        |t AS (SELECT doc_id, array_to_string(ps, chr(10) || chr(10)) AS text
        |  FROM q3),
        |ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS u FROM t),
        |lc AS (SELECT doc_id, u, count(*) AS cnt FROM ln GROUP BY 1, 2),
        |la AS (SELECT doc_id,
        |  round(CAST(sum(cnt) - count(*) AS DOUBLE) / sum(cnt), 6)
        |    AS dup_line_frac,
        |  CASE WHEN sum(cnt * length(u)) = 0 THEN 0.0 ELSE
        |    round(CAST(sum(CASE WHEN cnt > 1 THEN (cnt-1) * length(u)
        |      ELSE 0 END) AS DOUBLE) / sum(cnt * length(u)), 6) END
        |    AS dup_line_char_frac
        |  FROM lc GROUP BY doc_id),
        |pn AS (SELECT doc_id,
        |  unnest(string_split(text, chr(10) || chr(10))) AS u FROM t),
        |pc AS (SELECT doc_id, u, count(*) AS cnt FROM pn GROUP BY 1, 2),
        |paa AS (SELECT doc_id,
        |  round(CAST(sum(cnt) - count(*) AS DOUBLE) / sum(cnt), 6)
        |    AS dup_para_frac,
        |  CASE WHEN sum(cnt * length(u)) = 0 THEN 0.0 ELSE
        |    round(CAST(sum(CASE WHEN cnt > 1 THEN (cnt-1) * length(u)
        |      ELSE 0 END) AS DOUBLE) / sum(cnt * length(u)), 6) END
        |    AS dup_para_char_frac
        |  FROM pc GROUP BY doc_id),
        |wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM t),
        |gr AS (SELECT doc_id, nn.n,
        |  unnest(list_transform(range(0, greatest(len(w) - nn.n + 1, 0)),
        |    i -> array_to_string(w[i+1:i+nn.n], ' '))) AS g
        |  FROM wd CROSS JOIN (VALUES (2), (3), (4)) AS nn(n)),
        |gc AS (SELECT doc_id, n, g, count(*) AS cnt FROM gr GROUP BY 1, 2, 3),
        |gw AS (SELECT doc_id, n, cnt, length(g) AS gl,
        |  row_number() OVER (PARTITION BY doc_id, n
        |    ORDER BY cnt DESC, length(g) DESC) AS rn FROM gc),
        |gtop AS (SELECT doc_id, n, cnt * gl AS top_chars FROM gw WHERE rn = 1),
        |gdup AS (SELECT doc_id, n,
        |  sum(CASE WHEN cnt > 1 THEN (cnt-1) * length(g) ELSE 0 END) AS dup_chars
        |  FROM gc GROUP BY 1, 2),
        |gp AS (SELECT gtop.doc_id,
        |  max(CASE WHEN gtop.n = 2 THEN gtop.top_chars END) AS t2,
        |  max(CASE WHEN gtop.n = 3 THEN gtop.top_chars END) AS t3,
        |  max(CASE WHEN gtop.n = 4 THEN gtop.top_chars END) AS t4,
        |  max(CASE WHEN gtop.n = 2 THEN gdup.dup_chars END) AS d2,
        |  max(CASE WHEN gtop.n = 3 THEN gdup.dup_chars END) AS d3,
        |  max(CASE WHEN gtop.n = 4 THEN gdup.dup_chars END) AS d4
        |  FROM gtop JOIN gdup ON gtop.doc_id = gdup.doc_id AND gtop.n = gdup.n
        |  GROUP BY gtop.doc_id)
        |SELECT t.doc_id,
        |  coalesce(la.dup_line_frac, 0.0) AS dup_line_frac,
        |  coalesce(la.dup_line_char_frac, 0.0) AS dup_line_char_frac,
        |  coalesce(paa.dup_para_frac, 0.0) AS dup_para_frac,
        |  coalesce(paa.dup_para_char_frac, 0.0) AS dup_para_char_frac,
        |  round(CAST(coalesce(gp.t2, 0) AS DOUBLE) / length(t.text), 6)
        |    AS top_2gram_char_frac,
        |  round(CAST(coalesce(gp.t3, 0) AS DOUBLE) / length(t.text), 6)
        |    AS top_3gram_char_frac,
        |  round(CAST(coalesce(gp.t4, 0) AS DOUBLE) / length(t.text), 6)
        |    AS top_4gram_char_frac,
        |  round(CAST(coalesce(gp.d2, 0) AS DOUBLE) / length(t.text), 6)
        |    AS dup_2gram_char_frac,
        |  round(CAST(coalesce(gp.d3, 0) AS DOUBLE) / length(t.text), 6)
        |    AS dup_3gram_char_frac,
        |  round(CAST(coalesce(gp.d4, 0) AS DOUBLE) / length(t.text), 6)
        |    AS dup_4gram_char_frac
        |FROM t
        |LEFT JOIN la ON t.doc_id = la.doc_id
        |LEFT JOIN paa ON t.doc_id = paa.doc_id
        |LEFT JOIN gp ON t.doc_id = gp.doc_id""".stripMargin,
    // mirrors q_perplexity_bucket: same trigram LM recomputed from the
    // training slice, same add-one conditional, same rank-based terciles
    "q_perplexity_bucket" ->
      """WITH tr AS (SELECT text FROM documents WHERE doc_id % 10 = 7),
        |tg AS (SELECT unnest(list_transform(range(1, length(text) - 1),
        |  i -> substr(text, CAST(i AS INT), 3))) AS gram FROM tr),
        |tri AS (SELECT gram, count(*) AS c3 FROM tg GROUP BY gram),
        |ctx AS (SELECT substr(gram, 1, 2) AS g2, sum(c3) AS c2
        |  FROM tri GROUP BY 1),
        |vv AS (SELECT count(DISTINCT substr(text, CAST(i AS INT), 1)) AS v
        |  FROM (SELECT text, unnest(range(1, length(text) + 1)) AS i FROM tr)),
        |dg AS (SELECT doc_id, unnest(list_transform(range(1, length(text) - 1),
        |  i -> substr(text, CAST(i AS INT), 3))) AS gram FROM documents),
        |lp AS (SELECT doc_id,
        |  ln(CAST(coalesce(tri.c3, 0) + 1 AS DOUBLE)
        |    / CAST(coalesce(ctx.c2, 0) + vv.v AS DOUBLE)) AS lp
        |  FROM dg LEFT JOIN tri ON dg.gram = tri.gram
        |  LEFT JOIN ctx ON substr(dg.gram, 1, 2) = ctx.g2
        |  CROSS JOIN vv),
        |sc AS (SELECT doc_id, round(-sum(lp) / count(*), 6) AS logppl
        |  FROM lp GROUP BY doc_id),
        |al AS (SELECT d.doc_id, coalesce(sc.logppl, 0.0) AS logppl
        |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |rk AS (SELECT doc_id, logppl,
        |  row_number() OVER (ORDER BY logppl, doc_id) AS rn,
        |  count(*) OVER () AS n FROM al)
        |SELECT doc_id, logppl,
        |  CASE WHEN rn * 3 <= n THEN 'head'
        |       WHEN rn * 3 <= n * 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM rk""".stripMargin,
    "q_url_canon" ->
      s"""WITH m0 AS (
        |  SELECT doc_id, $urlSql ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=1#top'
        |         WHEN doc_id % 3 = 1 THEN '#section-2'
        |         ELSE '?a=1&utm_campaign=x' END AS u
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN upper(u) ELSE u END AS u
        |  FROM m0),
        |s1 AS (SELECT doc_id, regexp_replace(u, '#.*', '', 'g') AS nf FROM m),
        |s2 AS (SELECT doc_id, regexp_replace(regexp_replace(nf,
        |  '([?&])utm_[^&#]*(&utm_[^&#]*)*&', '\\1', 'g'),
        |  '[?&]utm_[^&#]*(&utm_[^&#]*)*$$', '', 'g') AS nu FROM s1),
        |s3 AS (SELECT doc_id, nu,
        |  regexp_extract(nu, '^[a-zA-Z]+://[^/]*', 0) AS hd FROM s2)
        |SELECT doc_id, lower(hd) || substr(nu, length(hd) + 1, length(nu)) AS canon
        |FROM s3""".stripMargin,
    "q_dedup_decisions_full" ->
      s"""WITH RECURSIVE base AS (SELECT doc_id, text, source FROM documents),
        |big AS (SELECT * FROM base WHERE length(text) >= 250),
        |d AS (
        |  SELECT doc_id, text, source FROM base
        |  UNION ALL SELECT doc_id + 1000000, text, source
        |    FROM big WHERE doc_id % 50 = 0
        |  UNION ALL SELECT doc_id + 3000000, text || ' appended', source
        |    FROM big WHERE doc_id % 25 = 7
        |  UNION ALL SELECT doc_id + 4000000,
        |      text || ' ' || repeat('shared boilerplate passage ', 10), source
        |    FROM big WHERE doc_id % 25 = 11),
        |u AS (SELECT doc_id, source, text, $urlSql AS url, length(text) AS len FROM d),
        |live AS (SELECT * FROM u WHERE len >= 60),
        |wrd AS (SELECT url, string_split(text, ' ') AS w FROM live),
        |sh AS (SELECT url, list_distinct(list_transform(range(1, len(w)-3),
        |    i -> array_to_string(w[i:i+4], ' '))) AS s FROM wrd),
        |g AS (SELECT url, unnest(list_distinct(list_transform(range(1, length(text)-198),
        |    i -> substr(text, i, 200)))) AS gram FROM live),
        |e_exact AS (SELECT x.url a, y.url b FROM live x JOIN live y
        |  ON md5(x.text) = md5(y.text) AND x.url < y.url),
        |e_near AS (SELECT x.url a, y.url b FROM sh x JOIN sh y ON x.url < y.url
        |  WHERE CAST(len(list_intersect(x.s,y.s)) AS DOUBLE)
        |      / (len(x.s)+len(y.s)-len(list_intersect(x.s,y.s))) >= 0.8),
        |e_sub AS (SELECT DISTINCT x.url a, y.url b FROM g x JOIN g y
        |  ON x.gram = y.gram AND x.url < y.url),
        |e AS (SELECT a, b FROM e_exact UNION SELECT a, b FROM e_near
        |  UNION SELECT a, b FROM e_sub),
        |sym AS (SELECT a un, b vn FROM e UNION SELECT b, a FROM e
        |  UNION SELECT url, url FROM live),
        |reach(un, r) AS (SELECT un, vn FROM sym
        |  UNION SELECT reach.un, sym.vn FROM reach JOIN sym ON reach.r = sym.un),
        |comp AS (SELECT un AS url, min(r) AS cluster FROM reach GROUP BY un),
        |csize AS (SELECT cluster, count(*) AS n FROM comp GROUP BY cluster),
        |rep AS (SELECT cluster, url AS rep_url FROM (
        |  SELECT c.cluster, l.url,
        |    row_number() OVER (PARTITION BY c.cluster
        |      ORDER BY CAST(substr(l.source, 4) AS INT), l.doc_id % 5, l.doc_id) AS rn
        |  FROM comp c JOIN live l ON c.url = l.url) WHERE rn = 1)
        |SELECT u.url,
        |  CAST(coalesce(cs.n, 1) AS BIGINT) AS cluster_size,
        |  CASE WHEN u.len < 60 THEN 'ignored'
        |       WHEN cs.n = 1 THEN 'unique'
        |       WHEN u.url = r.rep_url THEN 'keep'
        |       ELSE 'delete' END AS state
        |FROM u
        |LEFT JOIN comp c ON u.url = c.url
        |LEFT JOIN csize cs ON c.cluster = cs.cluster
        |LEFT JOIN rep r ON c.cluster = r.cluster""".stripMargin,
    "q_substring_pairs" ->
      """WITH u AS (SELECT CAST(doc_id AS VARCHAR) AS url, text FROM documents),
        |g AS (
        |  SELECT url, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 98), i -> substr(text, CAST(i AS INT), 100)))) AS gram
        |  FROM u)
        |SELECT DISTINCT least(x.url, y.url) AS a, greatest(x.url, y.url) AS b
        |FROM g x JOIN g y ON x.gram = y.gram AND x.url < y.url""".stripMargin,
    "q_line_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls
        |  FROM d),
        |pl AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN list_append(ls, 'subscribe to our newsletter today') ELSE ls END AS ls1
        |  FROM ch),
        |pl2 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 1
        |    THEN list_append(ls1, 'cookie policy accepted') ELSE ls1 END AS ls
        |  FROM pl),
        |l AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ls) + 1),
        |    i -> {'pos': i, 'line': ls[CAST(i AS INT)]})) AS e
        |  FROM pl2),
        |ln AS (SELECT doc_id, e.pos AS pos, e.line AS line FROM l),
        |df AS (SELECT line, count(DISTINCT doc_id) AS df FROM ln GROUP BY line),
        |mk AS (SELECT ln.doc_id, ln.pos, ln.line, df.df >= 10 AS strip
        |  FROM ln JOIN df ON ln.line = df.line)
        |SELECT CAST(doc_id AS VARCHAR) AS url,
        |  coalesce(string_agg(CASE WHEN NOT strip THEN line END, chr(10)
        |    ORDER BY pos), '') AS kept_text,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN strip THEN 1 ELSE 0 END) AS BIGINT) AS n_stripped
        |FROM mk GROUP BY doc_id""".stripMargin,
    "q_dup_spans" -> dupSpansGramOracle,
    "q_dup_mass" -> dupMassGramOracle,
    // identical truth, answered by the suffix-array path on the Spark side
    "q_sa_dup_spans" -> dupSpansGramOracle,
    "q_suffix_array" ->
      s"""WITH u AS (
        |  SELECT $urlSql AS url, text FROM documents WHERE doc_id < 40),
        |g AS (SELECT url, text, unnest(range(1, length(text) + 1)) AS pos FROM u)
        |SELECT url, pos, row_number() OVER (
        |  ORDER BY substr(text, CAST(pos AS INT)), url, pos) AS sa_rank
        |FROM g""".stripMargin,
    // mirrors q_span_dedup_keep: duplicated gram positions restricted to
    // grams shared with a STRICTLY EARLIER doc (numeric-url natural order
    // == doc_id order), then the same gaps-and-islands merge as q_dup_spans
    "q_span_dedup_keep" -> spanKeepGramOracle,
    // identical truth, answered by the suffix-array path on the Spark side
    "q_sa_span_keep" -> spanKeepGramOracle,
    "q_substring_pairs_oracle" ->
      s"""WITH base AS (
        |  SELECT doc_id, text, source FROM documents WHERE length(text) >= 250),
        |d AS (
        |  SELECT doc_id, text, source FROM base
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |    text || ' ' || repeat('shared boilerplate passage ', 10), source
        |  FROM base WHERE doc_id % 25 = 11),
        |u AS (SELECT $urlSql AS url, text FROM d),
        |g AS (
        |  SELECT url, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 198), i -> substr(text, i, 200)))) AS gram
        |  FROM u)
        |SELECT DISTINCT least(x.url, y.url) AS a, greatest(x.url, y.url) AS b
        |FROM g x JOIN g y ON x.gram = y.gram AND x.url < y.url""".stripMargin,
    "q_deduped_corpus_exact" ->
      s"""$plantedCte,
        |pages AS (
        |  SELECT doc_id, $urlSql AS url, text FROM docs),
        |live AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY md5(text)) AS cnt,
        |    min(doc_id) OVER (PARTITION BY md5(text)) AS min_id
        |  FROM pages WHERE length(text) >= 60)
        |SELECT p.url, CAST(length(p.text) AS INT) AS len
        |FROM pages p LEFT JOIN live l ON p.doc_id = l.doc_id
        |WHERE l.doc_id IS NULL OR l.cnt = 1 OR p.doc_id = l.min_id""".stripMargin,
    "q_dedup_stats_exact" ->
      s"""$plantedCte,
        |pages AS (
        |  SELECT doc_id, length(text) AS len, md5(text) AS h FROM docs),
        |live AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY h) AS cnt,
        |    min(doc_id) OVER (PARTITION BY h) AS min_id
        |  FROM pages WHERE len >= 60),
        |st AS (
        |  SELECT p.len,
        |    CASE WHEN p.len < 60 THEN 'ignored'
        |         WHEN l.cnt = 1 THEN 'unique'
        |         WHEN p.doc_id = l.min_id THEN 'keep'
        |         ELSE 'delete' END AS state
        |  FROM pages p LEFT JOIN live l ON p.doc_id = l.doc_id),
        |agg AS (
        |  SELECT state, count(*) AS docs, CAST(sum(len) AS BIGINT) AS bytes
        |  FROM st GROUP BY 1),
        |tot AS (SELECT sum(docs) AS td, sum(bytes) AS tb FROM agg)
        |SELECT a.state, a.docs, a.bytes,
        |  round(a.docs / (1.0 * t.td), 9) AS doc_ratio,
        |  round(a.bytes / (1.0 * t.tb), 9) AS byte_ratio
        |FROM agg a CROSS JOIN tot t""".stripMargin,
    "q_overrides" ->
      s"""$plantedCte,
        |pages AS (
        |  SELECT doc_id, $urlSql AS url, text, md5(text) AS h,
        |    length(text) AS len
        |  FROM docs),
        |live AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY h) AS cnt,
        |    min(doc_id) OVER (PARTITION BY h) AS min_id
        |  FROM pages WHERE len >= 60),
        |st AS (
        |  SELECT p.doc_id, p.url, p.h,
        |    CASE WHEN p.len < 60 THEN 'ignored'
        |         WHEN l.cnt = 1 THEN 'unique'
        |         WHEN p.doc_id = l.min_id THEN 'keep'
        |         ELSE 'delete' END AS state
        |  FROM pages p LEFT JOIN live l ON p.doc_id = l.doc_id),
        |eff AS (
        |  SELECT st.doc_id, st.url, st.h,
        |    CASE WHEN st.doc_id % 50 = 0 AND st.doc_id < 1000000 THEN 'delete'
        |         WHEN st.doc_id >= 2000000 AND st.doc_id % 100 = 25 THEN 'keep'
        |         END AS ov_state,
        |    CASE WHEN st.state IN ('keep','delete')
        |           AND ((st.doc_id % 50 = 0 AND st.doc_id < 1000000)
        |             OR (st.doc_id >= 2000000 AND st.doc_id % 100 = 25))
        |         THEN CASE WHEN st.doc_id % 50 = 0 AND st.doc_id < 1000000
        |                   THEN 'delete' ELSE 'keep' END
        |         ELSE st.state END AS eff
        |  FROM st),
        |fin AS (
        |  SELECT doc_id, url, eff, ov_state,
        |    max(CASE WHEN eff = 'keep' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY h) AS has_keep,
        |    max(CASE WHEN eff IN ('keep','delete') THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY h) AS had_dup,
        |    min(CASE WHEN eff = 'delete' AND ov_state IS NULL THEN doc_id END)
        |      OVER (PARTITION BY h) AS reelect_id
        |  FROM eff)
        |SELECT url,
        |  CASE WHEN had_dup = 1 AND has_keep = 0 AND doc_id = reelect_id
        |       THEN 'keep' ELSE eff END AS state
        |FROM fin""".stripMargin,
    "q_scope_same_source_singletons" ->
      s"""$plantedCte
        |SELECT doc_id FROM (
        |  SELECT doc_id, count(*) OVER (PARTITION BY md5(text), source) AS cnt
        |  FROM docs) WHERE cnt = 1""".stripMargin,
    "q_scope_different_source_unique" ->
      s"""$plantedCte
        |SELECT d.doc_id FROM docs d
        |JOIN (SELECT md5(text) AS h, count(DISTINCT source) AS nsrc
        |      FROM docs GROUP BY 1) g ON md5(d.text) = g.h
        |WHERE g.nsrc = 1""".stripMargin,
    "q_length_filter" ->
      "SELECT doc_id, length(text) AS len FROM documents WHERE length(text) < 200",
    "q_candidate_pairs_exact" ->
      s"""$plantedCte
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM docs a JOIN docs b
        |  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id""".stripMargin,
    // mirrors q_bounded_topk: the bounded aggregate's documented window
    // equivalence — cap smallest per bucket by (nkp, id), total = full count
    "q_bounded_topk" ->
      """WITH d AS (SELECT doc_id % 16 AS bkey, n_chars AS nkp,
        |    doc_id AS id, doc_id * 31 AS sim FROM documents),
        |r AS (SELECT bkey, id, sim,
        |    row_number() OVER (PARTITION BY bkey ORDER BY nkp, id) AS rn,
        |    count(*) OVER (PARTITION BY bkey) AS total FROM d)
        |SELECT bkey, id, sim, total FROM r WHERE rn <= 5""".stripMargin,
    // mirrors q_lsh_plan: divisor pairs of the 128-permutation budget and
    // the closed-form S-curve midpoint (1 - 2^(-1/b))^(1/r); INT casts
    // match Spark's IntegerType, round(6) absorbs any last-ulp pow drift
    "q_lsh_plan" ->
      """WITH d AS (SELECT b FROM generate_series(1, 128) t(b) WHERE 128 % b = 0)
        |SELECT CAST(b AS INT) AS bands, CAST(128 // b AS INT) AS rows_per_band,
        |  round(pow(1.0 - pow(0.5, 1.0/b), 1.0/(128//b)), 6) AS s50
        |FROM d""".stripMargin,
    "q_token_count" ->
      "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents",
    // re-trains the 12 BPE rounds in SQL (materialized CTE chain) and
    // counts markers under the same replace cascade
    "q_token_count_bpe" -> Bpe.tokenCountOracleSql(rounds = 12),
    "q_bpe_merges" -> Bpe.mergesOracleSql(rounds = 12),

    // mirrors q_text_embed: same md5 bucket/sign draws, zero-filled
    // dense grid via the dim-row cross join
    "q_text_embed" -> TextEmbed.oracleSql(dim = 64, seed = 7L),

    // mirrors q_semdedup_text: the q_text_embed construction over the
    // planted-copy corpus, then the q_semdedup assignment + deletion
    // rule — end-to-end semantic dedup from raw text, fully replayed
    "q_semdedup_text" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 20 = 0),
        |tok AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |    x -> x <> '')) AS w FROM d),
        |h AS (SELECT doc_id,
        |  CAST('0x' || substring(md5(w || ':7'), 1, 6) AS INTEGER) % 64
        |    AS bucket,
        |  1 - 2 * (CAST('0x' || substring(md5(w || ':7'), 7, 6) AS INTEGER) % 2)
        |    AS c
        |  FROM tok),
        |b AS (SELECT doc_id, bucket, sum(c) AS v FROM h GROUP BY 1, 2),
        |g AS (SELECT d2.doc_id, i.i AS i, CAST(coalesce(b.v, 0) AS DOUBLE) AS v
        |  FROM (SELECT DISTINCT doc_id FROM d) d2
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
        |  LEFT JOIN b ON b.doc_id = d2.doc_id AND b.bucket = i.i),
        |e AS (SELECT doc_id AS vec_id, list(v ORDER BY i) AS emb
        |  FROM g GROUP BY doc_id),
        |c AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e
        |  ORDER BY vec_id LIMIT 8),
        |a AS (SELECT vec_id, emb, centroid_id, cos_c FROM (
        |  SELECT e.vec_id, e.emb, c.centroid_id,
        |    list_dot_product(e.emb, c.cemb) /
        |      (sqrt(list_dot_product(e.emb, e.emb)) *
        |       sqrt(list_dot_product(c.cemb, c.cemb))) AS cos_c,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.emb, c.cemb) /
        |        (sqrt(list_dot_product(e.emb, e.emb)) *
        |         sqrt(list_dot_product(c.cemb, c.cemb))) DESC,
        |      c.centroid_id) AS rnk
        |  FROM e CROSS JOIN c) WHERE rnk = 1),
        |del AS (SELECT DISTINCT y.vec_id
        |  FROM a x JOIN a y ON x.centroid_id = y.centroid_id
        |    AND x.vec_id < y.vec_id
        |  WHERE list_dot_product(x.emb, y.emb) /
        |    (sqrt(list_dot_product(x.emb, x.emb)) *
        |     sqrt(list_dot_product(y.emb, y.emb))) >= 0.95)
        |SELECT a.vec_id, a.centroid_id, round(a.cos_c, 6) AS cos_c,
        |  (del.vec_id IS NOT NULL) AS deleted
        |FROM a LEFT JOIN del ON a.vec_id = del.vec_id""".stripMargin,
    "q_quality" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |  round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text), 6)
        |    AS punct_ratio
        |FROM documents""".stripMargin,
    // CAST: DuckDB sum(int) yields HUGEINT while Spark yields BIGINT and
    // the driver's hash is type-sensitive (VERDICT r1 §wrong.1)
    "q_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_langid" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text),
        |      '\b(der|die|das|und|ist|nicht|ein|mit|auf|für)\b')) AS de,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|and|of|to|in|is|that|it|for|with)\b')) AS en,
        |    len(regexp_extract_all(lower(text),
        |      '\b(el|los|las|de|que|y|en|un|una|con)\b')) AS es,
        |    len(regexp_extract_all(lower(text),
        |      '\b(le|la|les|et|est|pas|une|dans|pour|que)\b')) AS fr,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN cjk > 0 THEN 'zh'
        |       WHEN greatest(de, en, es, fr) = 0 THEN 'und'
        |       WHEN de = greatest(de, en, es, fr) THEN 'de'
        |       WHEN en = greatest(de, en, es, fr) THEN 'en'
        |       WHEN es = greatest(de, en, es, fr) THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |FROM h""".stripMargin,
    // mirrors q_langid_trigram end to end, all generated from the SAME
    // Scala fixture constants (LangProfiles / LangId.scriptRules): profile
    // derivation, planting, script rules, and the integer coverage vote
    "q_langid_trigram" -> {
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      val profValues = operators.LangProfiles.profileText
        .map { case (l, t) => s"(${q(l)}, ${q(t)})" }.mkString(",\n|    ")
      val plantArms = operators.LangProfiles.heldOut.zipWithIndex
        .map { case ((_, t), i) => s"WHEN doc_id % 26 = $i THEN ${q(t)}" }
        .mkString("\n|    ")
      s"""WITH prof_src(lang, s) AS (VALUES
        |    $profValues),
        |pg AS (SELECT lang, unnest(list_transform(range(1, length(lower(s)) - 1),
        |  i -> substr(lower(s), CAST(i AS INT), 3))) AS gram FROM prof_src),
        |pc AS (SELECT lang, gram, count(*) AS cnt FROM pg GROUP BY 1, 2),
        |pr AS (SELECT lang, gram, row_number() OVER (PARTITION BY lang
        |  ORDER BY cnt DESC, gram) AS rn FROM pc),
        |prof AS (SELECT lang, gram FROM pr WHERE rn <= 200),
        |planted AS (SELECT doc_id, CASE
        |    $plantArms
        |    ELSE text END AS text FROM documents),
        |scr AS (SELECT doc_id, text, CASE
        |       ${operators.LangId.scriptCaseSql("text")}
        |       END AS script_lang FROM planted),
        |dg AS (SELECT doc_id,
        |  unnest(list_transform(range(1, length(lower(text)) - 1),
        |    i -> substr(lower(text), CAST(i AS INT), 3))) AS gram
        |  FROM scr WHERE script_lang IS NULL),
        |tot AS (SELECT doc_id, count(*) AS total FROM dg GROUP BY doc_id),
        |hits AS (SELECT doc_id, prof.lang, count(*) AS h FROM dg
        |  JOIN prof ON dg.gram = prof.gram GROUP BY 1, 2),
        |best AS (SELECT doc_id, lang, h, row_number() OVER (PARTITION BY doc_id
        |  ORDER BY h DESC, lang) AS rn FROM hits),
        |vote AS (SELECT b.doc_id,
        |  CASE WHEN b.h * 10 >= t.total * 1 THEN b.lang ELSE 'und' END AS vote_lang
        |  FROM best b JOIN tot t ON b.doc_id = t.doc_id WHERE b.rn = 1)
        |SELECT s.doc_id,
        |  coalesce(s.script_lang, v.vote_lang, 'und') AS pred_lang
        |FROM scr s LEFT JOIN vote v ON s.doc_id = v.doc_id""".stripMargin
    },

    // mirrors q_paragraph_dedup: chunk → pair into paragraphs → plant →
    // df-by-paragraph-TEXT (engine uses xxhash64 — identical while
    // collision-free) → strip + reassemble
    "q_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls FROM d),
        |pa AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(ls) / 2.0) AS BIGINT)),
        |    i -> array_to_string(ls[i*2+1:i*2+2], chr(10))) AS ps FROM ch),
        |pl AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |  THEN list_append(ps,
        |    'subscribe to our newsletter' || chr(10) || 'all rights reserved')
        |  ELSE ps END AS ps FROM pa),
        |l AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ps) + 1),
        |    i -> {'pos': i, 'p': ps[CAST(i AS INT)]})) AS e FROM pl),
        |ln AS (SELECT doc_id, e.pos AS pos, e.p AS p FROM l),
        |df AS (SELECT p, count(DISTINCT doc_id) AS df FROM ln GROUP BY p),
        |mk AS (SELECT ln.doc_id, ln.pos, ln.p, df.df >= 10 AS strip
        |  FROM ln JOIN df ON ln.p = df.p)
        |SELECT CAST(doc_id AS VARCHAR) AS url,
        |  coalesce(string_agg(CASE WHEN NOT strip THEN p END, chr(10) || chr(10)
        |    ORDER BY pos), '') AS kept_text,
        |  count(*) AS n_paras,
        |  CAST(sum(CASE WHEN strip THEN 1 ELSE 0 END) AS BIGINT) AS n_stripped
        |FROM mk GROUP BY doc_id""".stripMargin,
    // mirrors q_vocab_topk: same whitespace class, tf-desc-then-token
    // deterministic order
    "q_vocab_topk" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |    x -> x <> '')) AS token FROM documents)
        |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM t GROUP BY 1 ORDER BY tf DESC, token LIMIT 50""".stripMargin,
    // mirrors q_vocab_coverage: same tf-desc-then-token order; cumulative
    // window over the 50-row head only; pure integer permille (// is
    // DuckDB integer division, matching Spark's `div`)
    "q_vocab_coverage" ->
      """WITH t AS (SELECT
        |  unnest(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |    x -> x <> '')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS tf FROM t GROUP BY 1),
        |tot AS (SELECT sum(tf) AS total_tf FROM c),
        |head AS (SELECT token, tf FROM c ORDER BY tf DESC, token LIMIT 50),
        |r AS (SELECT token, tf,
        |  CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT)
        |    AS rank,
        |  CAST(sum(tf) OVER (ORDER BY tf DESC, token
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tf
        |  FROM head)
        |SELECT r.rank, r.token, r.tf, r.cum_tf,
        |  CAST(tot.total_tf AS BIGINT) AS total_tf,
        |  (r.cum_tf * 1000) // CAST(tot.total_tf AS BIGINT) AS cum_permille
        |FROM r, tot""".stripMargin,

    // mirrors q_novelty: same plant, 8-word grams as STRINGS, per-doc
    // distinct, doc-frequency, exact integer counts
    "q_novelty" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |d AS (SELECT doc_id, text FROM d0
        |  UNION ALL
        |  SELECT doc_id + 9000000, text FROM d0 WHERE doc_id % 31 = 4),
        |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 7, 0)),
        |    i -> array_to_string(w[i+1:i+8], ' ')))) AS gram FROM w),
        |f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
        |p AS (SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM g JOIN f USING (gram) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(p.n_grams, 0) AS n_grams,
        |  coalesce(p.n_novel, 0) AS n_novel,
        |  CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 1.0
        |    ELSE round(CAST(p.n_novel AS DOUBLE) / p.n_grams, 6)
        |  END AS novel_frac
        |FROM d LEFT JOIN p ON d.doc_id = p.doc_id""".stripMargin,

    // mirrors q_contamination_report: per-(doc, bench set) shared-gram
    // occurrence counts, gram STRINGS for the hashes
    "q_contamination_report" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dg AS (SELECT doc_id,
        |  unnest(list_transform(range(0, greatest(len(w) - 12, 0)),
        |    i -> array_to_string(w[i+1:i+13], ' '))) AS gram FROM d),
        |b0 AS (SELECT 'evalA' AS bench_id, w FROM d WHERE doc_id % 37 = 5
        |  UNION ALL
        |  SELECT 'evalB', w FROM d WHERE doc_id % 41 = 6),
        |bg0 AS (SELECT bench_id,
        |  unnest(list_transform(range(0, greatest(len(w) - 12, 0)),
        |    i -> array_to_string(w[i+1:i+13], ' '))) AS gram FROM b0),
        |bg AS (SELECT DISTINCT bench_id, gram FROM bg0)
        |SELECT dg.doc_id, bg.bench_id, count(*) AS n_hits
        |FROM dg JOIN bg ON dg.gram = bg.gram
        |GROUP BY 1, 2""".stripMargin,

    // mirrors q_decontaminate with gram STRINGS (engine: xxhash64 of the
    // same grams — identical verdicts while grams are collision-free)
    "q_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dg AS (SELECT doc_id,
        |  unnest(list_transform(range(0, greatest(len(w) - 12, 0)),
        |    i -> array_to_string(w[i+1:i+13], ' '))) AS gram FROM d),
        |b AS (SELECT DISTINCT
        |  unnest(list_transform(range(0, greatest(len(w) - 12, 0)),
        |    i -> array_to_string(w[i+1:i+13], ' '))) AS gram
        |  FROM d WHERE doc_id % 37 = 5),
        |hits AS (SELECT dg.doc_id, count(b.gram) AS n_hits
        |  FROM dg LEFT JOIN b ON dg.gram = b.gram GROUP BY dg.doc_id)
        |SELECT d.doc_id,
        |  coalesce(h.n_hits, 0) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    // the Bloom gate never changes verdicts (negatives definitive, false
    // positives re-verified against the exact gram table), so the
    // bloom-gated path answers to the identical SQL
    "q_decontaminate_bloom" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dg AS (SELECT doc_id,
        |  unnest(list_transform(range(0, greatest(len(w) - 12, 0)),
        |    i -> array_to_string(w[i+1:i+13], ' '))) AS gram FROM d),
        |b AS (SELECT DISTINCT
        |  unnest(list_transform(range(0, greatest(len(w) - 12, 0)),
        |    i -> array_to_string(w[i+1:i+13], ' '))) AS gram
        |  FROM d WHERE doc_id % 37 = 5),
        |hits AS (SELECT dg.doc_id, count(b.gram) AS n_hits
        |  FROM dg LEFT JOIN b ON dg.gram = b.gram GROUP BY dg.doc_id)
        |SELECT d.doc_id,
        |  coalesce(h.n_hits, 0) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    "q_url_latest" ->
      s"""WITH d AS (
        |  SELECT $urlSql AS url, 1767225600 + doc_id AS ts_s, doc_id, text
        |  FROM documents
        |  UNION ALL
        |  SELECT $urlSql AS url, 1767225600 + doc_id + 86400, doc_id,
        |    'recrawled ' || text
        |  FROM documents WHERE doc_id % 4 = 1),
        |r AS (SELECT url, ts_s, length(text) AS len,
        |  row_number() OVER (PARTITION BY url ORDER BY ts_s DESC, doc_id DESC)
        |    AS rn FROM d)
        |SELECT url, ts_s, len FROM r WHERE rn = 1""".stripMargin,
    // mirrors q_incremental_dedup: batch-internal min-url election per md5,
    // then anti-join against the even-doc corpus digest set
    "q_incremental_dedup" ->
      """WITH b AS (
        |  SELECT 'b' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'x' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM documents WHERE doc_id % 9 = 0),
        |h AS (SELECT url, md5(text) AS sha FROM b),
        |reps AS (SELECT sha, min(url) AS url FROM h GROUP BY sha),
        |c AS (SELECT md5(text) AS sha FROM documents WHERE doc_id % 2 = 0)
        |SELECT r.url, r.sha FROM reps r
        |LEFT JOIN c ON r.sha = c.sha WHERE c.sha IS NULL""".stripMargin,
    // the Bloom gate never changes membership (negatives definitive, false
    // positives re-verified by the anti-join), so the bloom-gated path
    // answers to the identical SQL
    "q_incremental_dedup_bloom" ->
      """WITH b AS (
        |  SELECT 'b' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'x' || CAST(doc_id AS VARCHAR) AS url, text
        |  FROM documents WHERE doc_id % 9 = 0),
        |h AS (SELECT url, md5(text) AS sha FROM b),
        |reps AS (SELECT sha, min(url) AS url FROM h GROUP BY sha),
        |c AS (SELECT md5(text) AS sha FROM documents WHERE doc_id % 2 = 0)
        |SELECT r.url, r.sha FROM reps r
        |LEFT JOIN c ON r.sha = c.sha WHERE c.sha IS NULL""".stripMargin,
    // mirrors q_corpus_mix: per-stratum Bernoulli draw via the first 8 hex
    // chars of md5(doc_id:seed) compared against floor(f * 2^32) in hex —
    // lexicographic hex order equals numeric order at fixed width, so both
    // engines make identical keep decisions
    "q_corpus_mix" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (lang = 'de')
        |   OR (lang = 'en' AND substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) < '80000000')
        |   OR (lang = 'fr' AND substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) < '40000000')
        |   OR (lang = 'zh' AND substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) < 'c0000000')""".stripMargin,
    // mirrors q_seq_pack: per-shard running token total before each doc,
    // sequence = floor(before / budget), offset = before % budget
    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tb
        |  FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(floor(tb / 256.0) AS BIGINT) AS seq_id,
        |  CAST(tb % 256 AS BIGINT) AS seq_offset
        |FROM c""".stripMargin,
    // mirrors q_source_cap: row_number per source in doc_id order, keep ≤ 10
    "q_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 10""".stripMargin,
    // mirrors q_curation_chain: the full funnel as nested CTEs
    "q_curation_chain" ->
      s"""$curationCte
        |SELECT doc_id, source, pred_lang, n_words FROM c
        |WHERE rn2 <= 15""".stripMargin,
    // mirrors q_curation_norm: the normalized-planting chain
    "q_curation_norm" ->
      s"""$curationNormCte
        |SELECT doc_id, source, pred_lang, n_words FROM c
        |WHERE rn2 <= 15""".stripMargin,
    // mirrors q_curation_funnel: per-stage survivor counts
    "q_curation_funnel" ->
      s"""$curationCte
        |SELECT
        |  (SELECT count(*) FROM planted) AS n_input,
        |  (SELECT count(*) FROM lng WHERE pred_lang = 'en') AS n_lang,
        |  (SELECT count(*) FROM f) AS n_quality,
        |  (SELECT count(*) FROM u) AS n_unique,
        |  (SELECT count(*) FROM c WHERE rn2 <= 15) AS n_final""".stripMargin,
    "q_ingest_stats" ->
      """WITH b AS (
        |  SELECT text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id % 9 = 0),
        |per AS (SELECT md5(text) AS sha, count(*) AS cnt FROM b GROUP BY 1),
        |c AS (SELECT DISTINCT md5(text) AS sha FROM documents WHERE doc_id % 2 = 0),
        |f AS (SELECT per.cnt, (c.sha IS NOT NULL) AS in_corpus
        |  FROM per LEFT JOIN c ON per.sha = c.sha)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_batch,
        |  count(*) AS n_distinct,
        |  CAST(sum(cnt) - count(*) AS BIGINT) AS n_internal_dups,
        |  CAST(sum(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus_dups,
        |  CAST(sum(CASE WHEN in_corpus THEN 0 ELSE 1 END) AS BIGINT) AS n_new
        |FROM f""".stripMargin,
    // mirrors q_gopher_quality's chunking + planting, then recomputes every
    // Gopher metric with list lambdas; ratios rounded to 6 on both sides,
    // `passes` evaluated over the ROUNDED values on both sides
    "q_gopher_quality" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls
        |  FROM d),
        |p1 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |  THEN list_transform(ls, l -> '- ' || l) ELSE ls END AS ls FROM ch),
        |p2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 1
        |  THEN list_transform(ls, l -> l || '...') ELSE ls END AS ls FROM p1),
        |t AS (SELECT doc_id, CASE WHEN doc_id % 7 = 2
        |  THEN array_to_string(ls, chr(10)) || chr(10) ||
        |    '# # # # # # # # # # # # # # # #'
        |  ELSE array_to_string(ls, chr(10)) END AS text FROM p2),
        |m AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(text, '[ \t\n\f\r]+'), x -> x <> '') AS ws,
        |  string_split(text, chr(10)) AS lines FROM t),
        |mm AS (SELECT doc_id,
        |  len(ws) AS n_words,
        |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE
        |    round(CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum')
        |      AS DOUBLE) / len(ws), 6) END AS mean_word_len,
        |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE
        |    round(CAST(len(regexp_extract_all(text, '#')) +
        |      len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) / len(ws), 6)
        |    END AS symbol_ratio,
        |  round(CAST(len(list_filter(lines, l -> l[1:2] IN ('- ', '* ')))
        |    AS DOUBLE) / len(lines), 6) AS bullet_frac,
        |  round(CAST(len(list_filter(lines, l -> l[-3:] = '...'))
        |    AS DOUBLE) / len(lines), 6) AS ellipsis_frac,
        |  CASE WHEN len(ws) = 0 THEN 0.0 ELSE
        |    round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS DOUBLE) / len(ws), 6) END AS alpha_frac,
        |  len(regexp_extract_all(lower(text),
        |    '\b(the|be|to|of|and|that|have|with)\b')) AS stop_hits
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, stop_hits,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
        |   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        |   AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        |   AND stop_hits >= 2) AS passes
        |FROM mm""".stripMargin,
    // mirrors q_c4_clean: chunk, punctuate even lines, plant js/brace/lorem
    // lines, then apply the C4 line predicate with list lambdas
    "q_c4_clean" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
        |    i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS ls FROM d),
        |p0 AS (SELECT doc_id, list_transform(range(1, len(ls) + 1),
        |  i -> CASE WHEN (i - 1) % 2 = 0 THEN ls[CAST(i AS INT)] || '.'
        |       ELSE ls[CAST(i AS INT)] END) AS ls FROM ch),
        |pj AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
        |  THEN list_append(ls, 'please enable JavaScript to view this page.')
        |  ELSE ls END AS ls FROM p0),
        |pb AS (SELECT doc_id, CASE WHEN doc_id % 5 = 1
        |  THEN list_append(ls, 'window.config = { foo: 1 };')
        |  ELSE ls END AS ls FROM pj),
        |pl AS (SELECT doc_id, CASE WHEN doc_id % 11 = 3
        |  THEN list_append(ls, 'standard lorem ipsum placeholder text here.')
        |  ELSE ls END AS ls FROM pb),
        |t AS (SELECT doc_id, array_to_string(ls, chr(10)) AS text FROM pl),
        |k AS (SELECT doc_id, text,
        |  list_filter(string_split(text, chr(10)), l ->
        |    l[-1:] IN ('.', '!', '?', '"', '''')
        |    AND len(list_filter(string_split_regex(l, '[ \t]+'), x -> x <> '')) >= 3
        |    AND NOT contains(lower(l), 'javascript')
        |    AND NOT contains(l, '{')) AS kept,
        |  len(string_split(text, chr(10))) AS n_lines
        |  FROM t)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
        |  len(kept) AS n_kept,
        |  n_lines - len(kept) AS n_dropped,
        |  (NOT contains(lower(text), 'lorem ipsum') AND len(kept) >= 3)
        |    AS doc_kept
        |FROM k""".stripMargin,
    // mirrors q_semdedup: k=8 lowest-id centroids, nearest-centroid
    // assignment (ties to lowest centroid), delete any vector with a
    // lower-id same-cluster member at cosine ≥ 0.8 — double arrays on both
    // sides, same planted slices as q_cos_dup_pairs
    "q_semdedup" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |e AS (
        |  SELECT vec_id, emb FROM e0
        |  UNION ALL
        |  SELECT vec_id + 1000000, emb FROM e0 WHERE vec_id % 20 = 0
        |  UNION ALL
        |  SELECT vec_id + 2000000, list_concat([0.0], emb[2:]) AS emb
        |  FROM e0 WHERE vec_id % 20 = 10),
        |c AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e
        |  ORDER BY vec_id LIMIT 8),
        |a AS (SELECT vec_id, emb, centroid_id, cos_c FROM (
        |  SELECT e.vec_id, e.emb, c.centroid_id,
        |    list_dot_product(e.emb, c.cemb) /
        |      (sqrt(list_dot_product(e.emb, e.emb)) *
        |       sqrt(list_dot_product(c.cemb, c.cemb))) AS cos_c,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.emb, c.cemb) /
        |        (sqrt(list_dot_product(e.emb, e.emb)) *
        |         sqrt(list_dot_product(c.cemb, c.cemb))) DESC,
        |      c.centroid_id) AS rnk
        |  FROM e CROSS JOIN c) WHERE rnk = 1),
        |del AS (SELECT DISTINCT y.vec_id
        |  FROM a x JOIN a y ON x.centroid_id = y.centroid_id
        |    AND x.vec_id < y.vec_id
        |  WHERE list_dot_product(x.emb, y.emb) /
        |    (sqrt(list_dot_product(x.emb, x.emb)) *
        |     sqrt(list_dot_product(y.emb, y.emb))) >= 0.8)
        |SELECT a.vec_id, a.centroid_id, round(a.cos_c, 6) AS cos_c,
        |  (del.vec_id IS NOT NULL) AS deleted
        |FROM a LEFT JOIN del ON a.vec_id = del.vec_id""".stripMargin,
    "q_doc_fingerprint" ->
      "SELECT doc_id, substr(md5(text), 1, 16) AS fp FROM documents",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_orders_priority" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q_events_by_type" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1""".stripMargin,
    "q_tri_state" ->
      """SELECT source AS grp, bool_and(n_chars > 250) AS all_true,
        |  bool_or(n_chars > 250) AS any_true,
        |  CASE WHEN bool_and(n_chars > 250) THEN 'all'
        |       WHEN NOT bool_or(n_chars > 250) THEN 'none'
        |       ELSE 'mixed' END AS tri_state
        |FROM documents GROUP BY 1""".stripMargin,
    "q_visibility" ->
      """WITH st AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) < 20 THEN 'ignored'
        |         WHEN count(*) OVER (PARTITION BY md5(text)) = 1 THEN 'unique'
        |         WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 'keep'
        |         ELSE 'delete' END AS state
        |  FROM documents)
        |SELECT doc_id FROM st WHERE state IN ('keep', 'unique')""".stripMargin,
    "q_human_bytes" ->
      """SELECT doc_id,
        |  CASE WHEN n_chars < 1024 THEN cast(n_chars AS varchar) || ' B'
        |       WHEN n_chars < 1048576
        |         THEN cast(round(n_chars / 1024.0, 1) AS varchar) || ' KiB'
        |       WHEN n_chars < 1073741824
        |         THEN cast(round(n_chars / 1048576.0, 1) AS varchar) || ' MiB'
        |       ELSE cast(round(n_chars / 1073741824.0, 1) AS varchar) || ' GiB'
        |  END AS size_h
        |FROM documents""".stripMargin,
    "q_ts_dups" ->
      """WITH ev AS (
        |  SELECT ts FROM events
        |  UNION ALL
        |  SELECT ts FROM events WHERE event_id % 100 = 0)
        |SELECT epoch_us(ts) AS ts_us, count(*) AS cnt
        |FROM ev GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q_events_top_per_user" ->
      """SELECT user_id, event_id AS top_event FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    // brute-force ANN is plain relational math — DuckDB list_dot_product in
    // double mirrors the Spark zip_with/aggregate kernel bit-exactly on the
    // deterministic test embeddings (verified at sf0.001 and sf0.01)
    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 10)
        |SELECT query_id, vec_id, round(cos, 6) AS cos,
        |  CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT q.query_id, e.vec_id,
        |    list_dot_product(e.emb, q.qe) /
        |      (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(q.qe, q.qe))) AS cos,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      list_dot_product(e.emb, q.qe) /
        |      (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(q.qe, q.qe))) DESC,
        |      e.vec_id) AS rank
        |  FROM e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id) WHERE rank <= 5""".stripMargin,
    // planted copies only: the raw embeddings' max pairwise cosine is ~0.51
    // (verified at sf0.001/sf0.01), so τ=0.8 selects exactly the planted
    // exact copies (cos 1.0) and zeroed-coordinate copies (cos ≈ 0.99) —
    // non-vacuous, and both sides compute the dot product in double
    "q_cos_dup_pairs" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |e AS (
        |  SELECT vec_id, emb FROM e0
        |  UNION ALL
        |  SELECT vec_id + 1000000, emb FROM e0 WHERE vec_id % 20 = 0
        |  UNION ALL
        |  SELECT vec_id + 2000000, list_concat([0.0], emb[2:]) AS emb
        |  FROM e0 WHERE vec_id % 20 = 10)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(a.emb, b.emb) /
        |    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.emb, b.emb) /
        |  (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) >= 0.8""".stripMargin,
    // the natural comparator is SQL-expressible on this url shape
    // ('src<digits>/doc<digits>.txt'): source digit-run numeric first, then
    // doc id numeric — the driver's row-sorted compare checks the top-50
    // SET the comparator selects
    "q_natural_sort_topk" ->
      """SELECT doc_id, source || '/doc' || CAST(doc_id AS VARCHAR) || '.txt' AS u
        |FROM documents
        |ORDER BY CAST(regexp_extract(source, '[0-9]+') AS BIGINT), doc_id
        |LIMIT 50""".stripMargin)
}
