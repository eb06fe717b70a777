package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine-trained multinomial Naive Bayes text classifier — the
  * model-based quality gate of the GPT-3 / LLaMA data pipelines (a linear
  * classifier over token counts scores every page; low scorers drop),
  * trained and applied entirely as Spark plans: training is one
  * explode+groupBy over the labeled slice, the model is a small
  * (word, class-count) table broadcast to the scoring scan, and scoring
  * is a per-token log-likelihood-ratio fold. No driver-side learning, no
  * external artifacts — the classifier is data in the same engine.
  *
  * Scale notes: the model table is O(vocabulary) — bounded and broadcast
  * — so scoring a 100 TB corpus is ONE pass: explode tokens, hash-join
  * the broadcast vocab, partial-aggregate the per-doc mean. The training
  * groupBy shuffles (word, class) pairs only, never documents. The same
  * shape CCNet uses for its fastText gate; Laplace add-one smoothing
  * keeps unseen tokens finite.
  *
  * Reference anchor: the reference's size pre-filter is its only quality
  * gate (`ViewModels/MainViewModel.cs:586-588`); this is the model-based
  * gate a web-corpus user layers beside it.
  */
object NaiveBayes {

  /** Same portable tokenisation as [[QualityFilters]]/[[Curation]]
    * (explicit whitespace class, lowercased) so the DuckDB oracle splits
    * identically. */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "[ \\t\\n\\f\\r]+"), w => w =!= "")

  /** Per-word class counts from a labeled slice: (w, cp, cn) where cp/cn
    * are token occurrences under label 1 / label 0. The model. */
  def train(
      labeled: DataFrame,
      labelCol: String = "label",
      textCol: String = "text"): DataFrame =
    labeled
      .select(col(labelCol).cast("int").as("__y"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w"))
      .agg(
        sum(when(col("__y") === 1, 1L).otherwise(0L)).as("cp"),
        sum(when(col("__y") === 1, 0L).otherwise(1L)).as("cn"))

  /** Model totals as a one-row frame (tp, tn, v): class token masses and
    * vocabulary size — the smoothing denominators. Never a collect. */
  def totals(model: DataFrame): DataFrame =
    model.agg(
      sum(col("cp")).as("tp"),
      sum(col("cn")).as("tn"),
      count(lit(1)).as("v"))

  /** Scores (idCol, score_micro, pred_pos) for every doc. Per-word
    * log-likelihood ratios log((cp+1)/(tp+v)) − log((cn+1)/(tn+v)) are
    * QUANTIZED to integer micro-units (round(llr·10⁶) as long) in the
    * model table, and a document's score is the plain integer SUM of its
    * tokens' micro-llrs. Summing floats would be exact-parity poison: the
    * addend order differs between Spark's partial aggregates and the
    * DuckDB oracle's scan, and float addition is not associative — whereas
    * the integer sum is order-independent, so engine and oracle agree
    * bit-for-bit (each engine computes round(ln(..)·10⁶) from the SAME
    * integer counts; a 1-ulp libm divergence would need to land within
    * ~1e-10 of a rounding boundary to matter). Quantization error is
    * ≤ 5e-7 per token — three orders below any useful decision margin.
    * Unseen tokens get the cp=cn=0 smoothing score; token-free docs score
    * 0 / false. pred_pos = score_micro > 0. */
  def score(
      docs: DataFrame,
      model: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val t = totals(model)
    val micro = lit(1000000L)
    val mw = model.crossJoin(broadcast(t)).select(
      col("w"),
      round((log(col("cp") + 1) - log(col("tp") + col("v")) -
        log(col("cn") + 1) + log(col("tn") + col("v"))) * micro)
        .cast("long").as("llr"))
    val unseen = t.select(
      round((log(col("tn") + col("v")) - log(col("tp") + col("v"))) * micro)
        .cast("long").as("llr0"))
    val sc = docs
      .select(id, explode(tokens(col(textCol))).as("w"))
      .join(broadcast(mw), Seq("w"), "left")
      .crossJoin(broadcast(unseen))
      .groupBy(id)
      .agg(sum(coalesce(col("llr"), col("llr0"))).as("score_micro"))
    docs.select(id)
      .join(sc, Seq(idCol), "left")
      .select(
        id,
        coalesce(col("score_micro"), lit(0L)).as("score_micro"),
        (coalesce(col("score_micro"), lit(0L)) > 0).as("pred_pos"))
  }
}
