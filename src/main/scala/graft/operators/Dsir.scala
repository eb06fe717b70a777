package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * NeurIPS — "Data Selection for Language Models via Importance
  * Resampling"): every document gets an importance weight, the
  * log-likelihood ratio of its hashed-bigram features under a target-slice
  * unigram-of-buckets model vs the raw-corpus model. High-weight docs look
  * like the target domain; selection is a threshold/top-k over the weight.
  *
  * Scale shape — the reason DSIR works at 100 TB where a real LM gate
  * cannot: the feature space is a FIXED hash-bucket space (4096 buckets
  * here: the first 3 hex chars of md5(bigram)), so both models are
  * bounded-size count tables whatever the corpus size. Training each model
  * is one explode+groupBy whose key cardinality is ≤ 4096 (map-side
  * partials collapse almost everything before the exchange); the weight
  * table broadcasts; scoring is ONE corpus pass — explode bigrams, probe
  * the broadcast, sum per doc. Documents never shuffle.
  *
  * Exactness discipline shared with [[NaiveBayes]]: per-bucket log ratios
  * are quantized to integer micro-units in the model, and a doc's weight
  * is the plain integer SUM of its bigram instances' micro-weights —
  * order-independent, so the DuckDB oracle retrains and rescores
  * bit-identically. The md5-prefix bucket hash is engine-portable for the
  * same reason [[Mixing.sampleKey]] is.
  *
  * Reference anchor: the reference's only corpus-composition control is
  * the ordered source list deciding keeps (`ViewModels/MainViewModel.cs:
  * 877-882`); DSIR is the composition control a training-data user adds
  * on top — "more like THIS slice".
  */
object Dsir {

  /** Fixed bucket space: 16^3. */
  val nBuckets: Int = 4096

  private def tokens(text: Column): Column =
    filter(split(lower(text), "[ \\t\\n\\f\\r]+"), w => w =!= "")

  /** Hashed-bigram feature stream for a text: bucket key = first 3 hex
    * chars of md5("w1 w2") for every adjacent token pair. Empty/one-token
    * docs have no features. */
  def bigramBuckets(text: Column): Column = {
    val ws = tokens(text)
    val n = size(ws)
    transform(
      zip_with(slice(ws, lit(1), greatest(n - 1, lit(0))),
        slice(ws, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      g => substring(md5(g), 1, 3))
  }

  /** Per-bucket occurrence counts (bucket, cnt) of a corpus slice — one of
    * the two models. ≤ [[nBuckets]] rows whatever the slice size. */
  def bucketCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(bigramBuckets(col(textCol))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The broadcastable weight table (bucket, w_micro): w = round(10⁶ ·
    * (ln((cT+1)/(tT+V)) − ln((cR+1)/(tR+V)))) with V = [[nBuckets]] —
    * the Laplace-smoothed log importance ratio per bucket, integer-
    * quantized. The table is TOTAL over all 4096 buckets (the base frame
    * enumerates the hash space, counts left-join on), so scoring never
    * meets an absent key and the cT=cR=0 smoothing weight falls out of
    * the same formula instead of needing a special case. */
  def weights(target: DataFrame, raw: DataFrame): DataFrame = {
    val all = target.sparkSession.range(nBuckets)
      .select(format_string("%03x", col("id")).as("bucket"))
    val t = bucketCounts(target).withColumnRenamed("cnt", "ct")
    val r = bucketCounts(raw).withColumnRenamed("cnt", "cr")
    val joined = all
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tot = joined.agg(
      sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    joined.crossJoin(broadcast(tot)).select(
      col("bucket"),
      round((log(col("ct") + 1) - log(col("tt") + lit(nBuckets)) -
        log(col("cr") + 1) + log(col("tr") + lit(nBuckets))) * 1000000L)
        .cast("long").as("w_micro"))
  }

  /** Scores (idCol, n_grams, weight_micro, pred_target) for every doc:
    * integer sum of its bigram instances' micro-weights. The weight table
    * is total over the bucket space, so the probe is a plain inner join
    * against the broadcast. pred_target = weight > 0, i.e. the doc's
    * features are more probable under the target model than the raw one.
    * Feature-free docs (≤ 1 token) score 0 / false. */
  def score(
      docs: DataFrame,
      wtable: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val g = docs.select(id, explode(bigramBuckets(col(textCol))).as("bucket"))
    val sc = g
      .join(broadcast(wtable), Seq("bucket"))
      .groupBy(id)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(col("w_micro")).as("weight_micro"))
    docs.select(id)
      .join(sc, Seq(idCol), "left")
      .select(
        id,
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("weight_micro"), lit(0L)).as("weight_micro"),
        (coalesce(col("weight_micro"), lit(0L)) > 0).as("pred_target"))
  }
}
