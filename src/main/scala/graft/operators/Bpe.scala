package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding merge-rule training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") and
  * token counting under the learned merges — the statistic a token-budget
  * solver actually consumes, completing the tokenizer-prep tier that
  * [[TextAnalysis.vocabTopK]] starts.
  *
  * Reference anchor: the reference app's only text statistics are
  * size/count aggregates (`MainViewModel.cs:1226-1240` elects keepers by
  * size); subword tokenization is part of the training-data extension
  * surface, not a port.
  *
  * == Algorithm ==
  * Classic BPE over whitespace-pre-tokenized words:
  *
  *  1. ONE corpus-scale pass: count word frequencies (the standard
  *     trainer optimization — all further work is over the DISTINCT-word
  *     table, vocab-sized by Heaps' law, never the corpus again).
  *  2. Each word becomes a symbol sequence, initially its characters.
  *  3. Per round: count adjacent symbol pairs weighted by word frequency,
  *     take the single most frequent pair (ties break toward the
  *     lexicographically smaller (left, right) so reruns and the DuckDB
  *     oracle agree bit-for-bit), record it as a merge rule, and fuse it
  *     everywhere. Stop early when no pairs remain.
  *
  * == Encoding ==
  * A symbol sequence is a single string with a U+0001 marker M BEFORE
  * every symbol (`lower` → `MlMoMwMeMr`). Fusing
  * pair (l, r) is then one literal `replace(seq, M+l+M+r, M+l+r)`:
  *  - the marker prefix makes mid-symbol false matches impossible (the
  *    pattern requires a marker immediately before `l`, and inside a
  *    symbol characters are preceded by characters);
  *  - each symbol carries its OWN marker, so the pattern consumes no
  *    neighbor and `replace`'s left-to-right non-overlapping scan
  *    reproduces BPE's left-to-right merge order exactly
  *    (`M a M a M a` → `M aa M a`, as BPE turns `aaa` into `[aa, a]`);
  *  - counting tokens under the merges is `count of markers` — a length
  *    difference, no re-parse.
  * U+0001 never occurs in text columns (it is a C0 control; ingest
  * normalization strips it — and the whitespace pre-tokenizer would
  * isolate it anyway).
  *
  * == Shape at 100 TB ==
  * The corpus is touched ONCE (explode → map-side-combined groupBy; text
  * never shuffles, words do — inherent to counting them). Each merge
  * round is one O(|vocab|) partial-agg groupBy plus a TakeOrdered(1) that
  * collects exactly ONE row to the driver — O(rounds) driver data total,
  * the same bounded-collect contract as the mixing solver. The symbol
  * column's replace chain is truncated with a localCheckpoint every
  * [[Bpe.CheckpointEvery]] rounds so plan depth stays bounded at
  * production merge counts (GPT-2-class trainers run 50k rounds of
  * exactly this loop over the word-count table). `minCount` drops
  * hapax words from the vocab table first — the standard cap that keeps
  * |vocab| bounded whatever the crawl contains.
  */
object Bpe {

  /** Symbol marker: prefixed to every symbol in the internal encoding. */
  val Marker = "\u0001"

  /** Truncate the replace-chain lineage this often during training. */
  val CheckpointEvery = 16

  /** A learned merge rule: at `round`, fuse adjacent (`lhs`, `rhs`) —
    * which co-occurred `pairCount` times, frequency-weighted. */
  final case class Merge(round: Int, lhs: String, rhs: String, pairCount: Long)

  private val WsClass = "[ \\t\\n\\f\\r]+"

  /** Corpus word-frequency table — the one corpus-scale pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), WsClass), w => w =!= "")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))

  /** Initial symbol encoding of a word: marker before every character. */
  private def seqOf(w: Column): Column =
    regexp_replace(w, "(.)", Marker + "$1")

  /** Train `rounds` merge rules over `docs`' text. Deterministic: pair
    * ties break (count desc, lhs asc, rhs asc). Stops early when no
    * adjacent pairs remain. Returns the rules in application order. */
  def trainMerges(
      docs: DataFrame,
      rounds: Int,
      textCol: String = "text",
      minCount: Long = 1L): Seq[Merge] = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    var words = wordCounts(docs, textCol)
      .where(col("cnt") >= minCount)
      .withColumn("seq", seqOf(col("w")))
      .select(col("cnt"), col("seq"))
      .localCheckpoint()

    val acc = ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // adjacent pairs: split(seq, M) = ["", s1, …, sk]; pairs are
      // (syms[i], syms[i+1]) — zip the k-1-length shifted slices
      val syms = split(col("seq"), Marker)
      val n = size(syms)
      val pairs = words
        .select(
          col("cnt"),
          explode(
            zip_with(
              slice(syms, lit(2), greatest(n - lit(2), lit(0))),
              slice(syms, lit(3), greatest(n - lit(2), lit(0))),
              (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (pairs.isEmpty) {
        exhausted = true
      } else {
        val row = pairs.head
        val l = row.getString(0)
        val rr = row.getString(1)
        val c = row.getLong(2)
        acc += Merge(r, l, rr, c)
        words = words.withColumn(
          "seq",
          replace(col("seq"), lit(Marker + l + Marker + rr), lit(Marker + l + rr)))
        if (r % CheckpointEvery == 0) words = words.localCheckpoint()
        r += 1
      }
    }
    acc.toSeq
  }

  /** The learned rules as a DataFrame (round, lhs, rhs, pair_count). */
  def mergesDF(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Token count of `text` under the learned merges: marker-encode every
    * non-whitespace character, apply the merge rules in order (patterns
    * cannot cross a word boundary — the space between words carries no
    * marker, so no `M l M r` pattern spans it), and count the markers
    * left. A pure codegen'd projection — no join, no shuffle; the merge
    * table rides into the plan as literals (it is O(rounds), driver-held
    * by construction). */
  def tokenCountUnderMerges(text: Column, merges: Seq[Merge]): Column = {
    val s0 = regexp_replace(text, "([^ \\t\\n\\f\\r])", Marker + "$1")
    val sN = merges.foldLeft(s0) { (s, m) =>
      replace(s, lit(Marker + m.lhs + Marker + m.rhs), lit(Marker + m.lhs + m.rhs))
    }
    (length(sN) - length(replace(sN, lit(Marker), lit("")))).cast("long")
  }

  // ---- DuckDB oracle mirrors -----------------------------------------------

  /** The training replayed as unrolled SQL rounds (test scale): CTEs
    * `wc` (word counts) and `s0` (initial symbol strings), then per round
    * k: `p_k` (pair counts), `m_k` (the argmax under the same tie-break),
    * `s_k` (the merge applied — a no-op via `chr(2)` when `m_k` is empty,
    * mirroring the engine's early stop). Every CTE is MATERIALIZED:
    * each round references its predecessor several times (p_k once, the
    * two scalar subqueries in s_k twice), so inlining would re-evaluate
    * the whole prefix exponentially — with materialization the chain is
    * linear in `rounds`. Callers append a final SELECT over
    * `m_1..m_rounds` or over `s_rounds`. */
  def trainingCtesSql(rounds: Int, docsRel: String = "documents"): String = {
    require(rounds > 0)
    val base =
      s"""WITH wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(list_filter(string_split_regex(text,
         |      '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w FROM $docsRel)
         |  GROUP BY w),
         |s0 AS MATERIALIZED (SELECT cnt,
         |  regexp_replace(w, '(.)', chr(1) || '\\1', 'g') AS seq FROM wc)""".stripMargin
    val perRound = (1 to rounds).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS MATERIALIZED (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt,
         |      unnest(list_transform(range(2, greatest(len(syms), 2)),
         |        i -> syms[i])) AS l,
         |      unnest(list_transform(range(2, greatest(len(syms), 2)),
         |        i -> syms[i + 1])) AS r
         |    FROM (SELECT cnt, string_split(seq, chr(1)) AS syms FROM $prev))
         |  GROUP BY l, r),
         |m$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |s$k AS MATERIALIZED (SELECT cnt, replace(seq,
         |    coalesce((SELECT chr(1) || l || chr(1) || r FROM m$k), chr(2)),
         |    coalesce((SELECT chr(1) || l || r FROM m$k), '')) AS seq
         |  FROM $prev)""".stripMargin
    }
    (base +: perRound).mkString(",\n")
  }

  /** Full oracle for the merge table: (round, lhs, rhs, pair_count). */
  def mergesOracleSql(rounds: Int): String = {
    val union = (1 to rounds)
      .map(k => s"SELECT $k AS round, l AS lhs, r AS rhs, c AS pair_count FROM m$k")
      .mkString("\nUNION ALL ")
    s"${trainingCtesSql(rounds)}\n$union"
  }

  /** Full oracle for the per-doc token count under the learned merges:
    * the same training CTEs, then every doc's text marker-encoded and
    * pushed through the same `rounds` scalar-subquery replaces. */
  def tokenCountOracleSql(rounds: Int): String = {
    val s0 = "regexp_replace(text, '([^ \\t\\n\\f\\r])', chr(1) || '\\1', 'g')"
    val sN = (1 to rounds).foldLeft(s0) { (s, k) =>
      s"""replace($s,
         |  coalesce((SELECT chr(1) || l || chr(1) || r FROM m$k), chr(2)),
         |  coalesce((SELECT chr(1) || l || r FROM m$k), ''))""".stripMargin
    }
    s"""${trainingCtesSql(rounds)}
       |SELECT doc_id,
       |  CAST(length(enc) - length(replace(enc, chr(1), '')) AS BIGINT) AS n_bpe
       |FROM (SELECT doc_id, $sN AS enc FROM documents)""".stripMargin
  }
}
