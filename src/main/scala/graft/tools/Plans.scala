package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.operators._
import graft.functions.gf
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    println("=== PLAN 1: q1_agg (pushdown & pruning) ===")
    SparkEntry.queries("q1_agg")(spark, sf).explain("formatted")

    println("=== PLAN 2: q_length_filter (filter pushdown) ===")
    SparkEntry.queries("q_length_filter")(spark, sf).explain("formatted")

    println("=== PLAN 3: signature projection (codegen?) ===")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    Lsh.withSignatures(docs, Lsh.Config()).explain("formatted")

    println("=== PLAN 4: exact rep election (partial agg?) ===")
    val d2 = docs.selectExpr("cast(doc_id as string) as url", "text")
      .withColumn("nk", gf.natural_sort_key(col("url")))
      .withColumn("sha", sha2(col("text"), 256))
    ExactDedup.repsAndEdges(d2.select(col("url"), col("nk"), col("sha")))._2.explain("formatted")

    println("=== PLAN 5: brute-force ANN (broadcast?) ===")
    SparkEntry.queries("q_ann_topk")(spark, sf).explain("formatted")

    println("=== PLAN 6: LSH candidate pairs (one exchange, bounded top-k, HOF) ===")
    val sigs = Lsh.withSignatures(
      docs.selectExpr("cast(doc_id as string) as url", "text")
        .withColumn("nk", gf.natural_sort_key(col("url"))),
      Lsh.Config())
    Lsh.candidatePairs(spark, sigs, Lsh.Config()).explain("formatted")

    println("=== PLAN 7: IVF assignment (broadcast of fixed-C centroids) ===")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    Similarity.ivfAssign(emb, nCentroids = 32)._1.explain("formatted")

    println("=== PLAN 8: embedding cosine near-dup (bounded buckets, one wide exchange) ===")
    Similarity.cosDupPairs(emb, tau = 0.8).explain("formatted")

    println("=== PLAN 9: SemDeDup (O(k) centroid broadcast; cluster-keyed self-join) ===")
    Similarity.semDedup(emb, k = 8, tau = 0.8).explain("formatted")

    println("=== PLAN 10: Gopher + C4 quality filters (single projection, no exchange) ===")
    QualityFilters.gopherQuality(docs).explain("formatted")
    QualityFilters.c4Clean(docs).explain("formatted")

    println("=== PLAN 11: near_edges end-to-end (is the candidate subtree reused?) ===")
    val cands11 = Lsh.candidatePairs(spark, sigs, Lsh.Config())
    val plan11 = Lsh.verifiedEdges(cands11, sigs, Lsh.Config(), 0.8)
    plan11.explain("formatted")
    val s11 = plan11.queryExecution.executedPlan.toString
    println(s"bounded_topk occurrences in physical plan: ${"bounded_topk".r.findAllIn(s11).size}")
    println(s"ReusedExchange nodes: ${"ReusedExchange".r.findAllIn(s11).size}")
    // collect() runs THIS DataFrame's QueryExecution (count() would build a
    // fresh one and leave plan11's adaptive plan unfinalized)
    println(s"rows: ${plan11.collect().length}")
    val s11b = plan11.queryExecution.executedPlan.toString
    println(s"AFTER RUN bounded_topk occurrences: ${"bounded_topk".r.findAllIn(s11b).size}")
    println(s"AFTER RUN ReusedExchange/QueryStage: ${"Reused".r.findAllIn(s11b).size}")
    println(s"AFTER RUN ShuffleQueryStage: ${"ShuffleQueryStage".r.findAllIn(s11b).size}")

    println("=== PLAN 12: Bloom gates (in-row probe; residue-only join) ===")
    val corpusShas = docs.selectExpr("md5(text) as sha")
    val bloom = IncrementalDedup.corpusBloom(corpusShas, expectedItems = 1024)
    val batch = docs.selectExpr("cast(doc_id as string) as url", "text")
    val gated = IncrementalDedup.newDocsBloomGated(batch, corpusShas, bloom)
    val s12 = gated.queryExecution.executedPlan.toString
    println(s"might_contain filters: ${"might_contain".r.findAllIn(s12).size}")
    println(s"anti joins: ${"LeftAnti".r.findAllIn(s12).size}")
    val bench = docs.where(col("doc_id") % 37 === 5)
      .selectExpr("doc_id as bench_id", "text")
    val bbloom = Decontaminate.benchBloom(bench, expectedItems = 1024)
    val dGated = Decontaminate.contaminatedBloomGated(docs, bench, bbloom)
    val s12b = dGated.queryExecution.executedPlan.toString
    println(s"decontaminate might_contain filters: ${"might_contain".r.findAllIn(s12b).size}")
    println(s"decontaminate semi joins: ${"LeftSemi".r.findAllIn(s12b).size}")
    // codegen only visible once AQE finalizes — run, then inspect; the
    // final-plan treeString marks codegen stages as `*(n)`, and the probe
    // is fused when the might_contain Filter line carries the marker
    dGated.collect()
    val s12c = dGated.queryExecution.executedPlan.toString
    val probeFused = s12c.linesIterator
      .exists(l => l.contains("might_contain") && l.contains("*("))
    println(s"decontaminate probe fused into a codegen stage: $probeFused")

    println("=== PLAN 13: per-source cap (WindowGroupLimit before the exchange) ===")
    val dsrc = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"))
    Mixing.capPerStratum(dsrc, "source", k = 10, col("doc_id")).explain("formatted")

    println("=== PLAN 14: curation funnel (per-row stages fused into the scan) ===")
    // wants: ONE parquet scan; langid + word metrics + both filters in the
    // scan-side stage; then exactly two exchanges, each preceded by a
    // Partial WindowGroupLimit (dedup = cap-1-per-sha, source cap) so
    // duplicates and over-cap rows drop map-side before they shuffle.
    val dcur = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val cur = Curation.curate(dcur)
    cur.explain("formatted")
    val s14 = cur.queryExecution.executedPlan.toString
    println(s"curation exchanges: ${"Exchange".r.findAllIn(s14).size}")
    println(s"curation group-limit planned: ${s14.contains("WindowGroupLimit")}")

    println("=== PLAN 15: exact set-sim join (prefix filter; skew-inverse key) ===")
    // wants: df computed once (ReusedExchange on the token frame), the
    // candidate join keyed on PREFIX tokens only (rare-first order), the
    // length filter inside the join condition, and the verify join fed by
    // the deduped candidate set, not the raw token join.
    val items15 = docs.select(col("doc_id").as("item_id"),
      SetSimJoin.tokenSet(col("text")).as("toks"))
    val p15 = SetSimJoin.similarPairs(items15, tau = 0.8)
    p15.explain("formatted")
    p15.collect()
    val s15 = p15.queryExecution.executedPlan.toString
    println(s"setsim exchanges: ${"Exchange".r.findAllIn(s15).size}")
    println(s"setsim reused: ${"Reused".r.findAllIn(s15).size}")
    // PPJoin positional filter audit: candidates reaching verification
    // with the filter off vs on (same inputs, same tau)
    val candLoose = SetSimJoin
      .selfCandidates(items15, tau = 0.8, positional = false).count()
    val candTight = SetSimJoin
      .selfCandidates(items15, tau = 0.8, positional = true).count()
    println(s"setsim candidates loose/positional: $candLoose / $candTight" +
      f" (${100.0 * (candLoose - candTight) / math.max(candLoose, 1L)}%.1f%% pruned)")

    println("=== PLAN 16: NB scoring (broadcast model; no doc-side shuffle before the per-doc agg) ===")
    val labeled16 = docs.select((col("doc_id") % 2).cast("int").as("label"), col("text"))
    val sc16 = NaiveBayes.score(docs.select(col("doc_id"), col("text")),
      NaiveBayes.train(labeled16))
    val s16 = sc16.queryExecution.executedPlan.toString
    println(s"nb broadcast joins: ${"BroadcastHashJoin".r.findAllIn(s16).size + "BroadcastNestedLoop".r.findAllIn(s16).size}")

    println("=== PLAN 17: domain split (pure projection, zero exchange) ===")
    val sp17 = Splits.domainSplit(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(concat(lit("https://s"), col("doc_id") % 97, lit(".example/p")).as("url")))
    val s17 = sp17.queryExecution.executedPlan.toString
    println(s"split exchanges: ${"Exchange".r.findAllIn(s17).size}")
    println(s"blocklist exchanges: ${
      "Exchange".r.findAllIn(QualityFilters.blocklistFlag(docs)
        .queryExecution.executedPlan.toString).size}")

    println("=== PLAN 18: DSIR scoring (bounded broadcast model; docs never shuffle wide) ===")
    val target18 = docs.where(col("doc_id") % 9 === 2)
    val sc18 = Dsir.score(docs.select(col("doc_id"), col("text")),
      Dsir.weights(target18, docs))
    sc18.collect()
    val s18 = sc18.queryExecution.executedPlan.toString
    println(s"dsir broadcasts: ${"BroadcastExchange".r.findAllIn(s18).size}")
    // the only shuffles allowed: the two <=4096-row bucket-count aggs and
    // the narrow per-doc (id, count, sum) partial agg + score re-attach
    println(s"dsir exchanges: ${"Exchange".r.findAllIn(s18).size}")
    println(s"dsir text col in any exchange: ${
      s18.linesIterator.exists(l => l.contains("Exchange") && l.contains("text"))}")

    println("=== PLAN 19: host-scoped boilerplate strip (df agg ships hashes; hash join, not SMJ) ===")
    // wants: the per-(scope,line) document-frequency aggregate carries only
    // (scope, lh, ll) — the line TEXT must not appear in ITS exchange (the
    // reassembly groupBy necessarily ships line text, same as the global
    // operator); the strip join honors the shuffle_hash hint (no sort); the
    // surviving-line frame is frequent-lines-sized, not corpus-sized.
    val docs19 = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source").as("host"),
      col("doc_id").cast("string").as("url"), col("text"))
    val p19 = LineDedup.stripFrequentLinesPerScope(docs19, "host", maxDf = 10)
    p19.collect()
    val s19 = p19.queryExecution.executedPlan.toString
    println(s"hostStrip exchanges: ${"Exchange".r.findAllIn(s19).size}")
    println(s"hostStrip shuffled-hash join: ${s19.contains("ShuffledHashJoin")}")
    println(s"hostStrip sort-merge join: ${s19.contains("SortMergeJoin")}")
    val dfAggExchangeShipsText = s19.linesIterator
      .filter(l => l.contains("Exchange") && l.contains("hashpartitioning"))
      .exists(l => l.contains("__fs") && l.contains("line"))
    println(s"hostStrip df-agg exchange ships line text: $dfAggExchangeShipsText")

    println("=== PLAN 20: epoch-weighted mix (projection + generator, zero exchange) ===")
    val p20 = Mixing.epochSample(
      docs.select(col("doc_id"), (col("doc_id") % 3).cast("string").as("lang")),
      "lang", "doc_id", Map("0" -> 2.5, "1" -> 1.0), seed = 7L)
    val s20 = p20.queryExecution.executedPlan.toString
    println(s"epochMix exchanges: ${"Exchange".r.findAllIn(s20).size}")
    println(s"epochMix generators: ${"Generate".r.findAllIn(s20).size}")

    println("=== PLAN 22: cross-table set-sim join (R-S prefix filter; corpus-df order) ===")
    // wants: the df table computed from the CORPUS side only; both prefix
    // frames join it (probe side left-join, unseen tokens df 0); candidates
    // dedup BEFORE the token-array verify re-joins; length filter inside
    // the join condition.
    val corpus22 = docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("item_id"),
        SetSimJoin.tokenSet(col("text")).as("toks"))
    val probe22 = docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("item_id"),
        SetSimJoin.tokenSet(col("text")).as("toks"))
    val p22 = SetSimJoin.similarPairsAcross(probe22, corpus22, 0.8)
    p22.collect()
    val s22 = p22.queryExecution.executedPlan.toString
    println(s"setsimAcross exchanges: ${"Exchange".r.findAllIn(s22).size}")
    println(s"setsimAcross dedup before verify: ${s22.contains("HashAggregate")}")
    println(s"setsimAcross toks in candidate-join exchanges: ${
      s22.linesIterator.exists(l => l.contains("Exchange") && l.contains("ts#"))}")

    println("=== PLAN 23: domain blocklist + domain quality gate ===")
    // wants: blocklist = one left join against the tiny domain table
    // (broadcast at any realistic list size); quality gate = one narrow
    // (domain, 2xlong) aggregate + a broadcastable domain join — the text
    // payload must appear in NO exchange of either plan.
    import spark.implicits._
    val urls23 = docs.select(col("doc_id"),
      concat(lit("https://h"), col("doc_id") % 97, lit(".s"),
        col("doc_id") % 13, lit(".example/p")).as("url"),
      col("text"), size(split(col("text"), " ")).as("score"))
    val p23a = QualityFilters.flagBlockedDomains(
      urls23, Seq("s3.example", "s5.example").toDF("domain"))
    p23a.collect()
    val s23a = p23a.queryExecution.executedPlan.toString
    println(s"domainBlocklist broadcast join: ${s23a.contains("BroadcastHashJoin")}")
    println(s"domainBlocklist exchanges with text: ${
      s23a.linesIterator.exists(l => l.contains("Exchange") && l.contains("text"))}")
    val p23b = QualityFilters.domainQualityFlag(urls23, minMean = 60.0)
    p23b.collect()
    val s23b = p23b.queryExecution.executedPlan.toString
    println(s"domainQuality exchanges: ${"Exchange".r.findAllIn(s23b).size}")
    println(s"domainQuality broadcast join: ${s23b.contains("BroadcastHashJoin")}")
    println(s"domainQuality exchanges with text: ${
      s23b.linesIterator.exists(l => l.contains("Exchange") && l.contains("text"))}")

    println("=== PLAN 24: Misra-Gries heavy hitters (partial sketch before exchange) ===")
    // wants: ObjectHashAggregate with partial_misra_gries BELOW the
    // single-row exchange (per-partition summaries, not per-item rows),
    // and the recount pass keyed on <= cap values only.
    val items24 = docs.select(col("doc_id"),
      explode(SetSimJoin.tokenBag(col("text"))).as("tok"))
      .select(when(col("doc_id") % 5 === 0, col("tok"))
        .otherwise(concat(col("tok"), lit("#"), col("doc_id"))).as("item"))
    val p24 = items24.agg(gf.misra_gries(col("item"), 4096).as("sk"))
    p24.collect()
    val s24 = p24.queryExecution.executedPlan.toString
    println(s"sketch partial agg before exchange: ${
      s24.contains("partial_misra_gries")}")
    s24.linesIterator.filter(_.contains("Exchange")).foreach(l =>
      println(s"  exchange: ${l.trim.take(110)}"))

    println("=== PLAN 25: integer PageRank round (edges join + partial-agg inflow) ===")
    // ONE round with checkpointing off so the round plan is visible
    // (production checkpoints each round, which hides it behind an RDD
    // scan): wants one shuffle join edges-to-ranks, a map-side-combined
    // partial_sum on dst, and the dangling scalar as a BroadcastExchange
    // — never a corpus-wide exchange of anything but (host, long) rows.
    val res25 = docs.select((col("doc_id") % 40).as("r")).distinct()
    val nodes25 = res25.select(concat(lit("h"), col("r")).as("host"))
    val edges25 = res25.where(col("r") < 37)
      .select(concat(lit("h"), col("r")).as("src"),
        concat(lit("h"), (col("r") * 7 + 3) % 40).as("dst"))
    LinkGraph.pageRank(nodes25, edges25, rounds = 1,
      checkpointRounds = false).explain("formatted")

    println("=== PLAN 26: Stupid Backoff LM scoring (text pruned before every exchange) ===")
    SparkEntry.queries("q_ngram_lm")(spark, sf).explain("formatted")

    println("=== PLAN 27: exact quantiles (histogram window, not corpus sort) ===")
    // wants: partial count agg -> exchange on value -> ONE single-partition
    // window over the (value,count) HISTOGRAM rows; no global Sort of docs.
    SparkEntry.queries("q_quantiles")(spark, sf).explain("formatted")

    println("=== PLAN 28: snapshot-delta classify (digest below the url exchange) ===")
    // wants: xxhash64 projected map-side (below the Exchange), window over
    // (url, ts, dig) only — payload text absent past the scan projection.
    SparkEntry.queries("q_snapshot_delta")(spark, sf).explain("formatted")

    println("=== PLAN 29: anchor rollup (two partial-agg groupBys, html never shuffles) ===")
    SparkEntry.queries("q_anchor_text")(spark, sf).explain("formatted")

    println("=== PLAN 30: tf-idf top-k (WindowGroupLimit before the doc exchange) ===")
    SparkEntry.queries("q_tfidf")(spark, sf).explain("formatted")

    println("=== PLAN 31: robots gate (rules side broadcast, page side unshuffled) ===")
    SparkEntry.queries("q_robots_gate")(spark, sf).explain("formatted")

    println("=== PLAN 32: link density (pure projection — zero exchanges) ===")
    SparkEntry.queries("q_link_density")(spark, sf).explain("formatted")

    println("=== PLAN 33: mirror hosts (digest-grain only; capped self-join) ===")
    SparkEntry.queries("q_mirror_hosts")(spark, sf).explain("formatted")

    println("=== PLAN 34: crawl budget (one map-side-combined host groupBy) ===")
    SparkEntry.queries("q_crawl_budget")(spark, sf).explain("formatted")

    println("=== PLAN 35: incremental near-dup probe (batch-side exchanges only past the artifact) ===")
    SparkEntry.queries("q_incremental_near")(spark, sf).explain("formatted")

    spark.stop()
  }
}
