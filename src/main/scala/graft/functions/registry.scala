package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom expressions, so every operator
  * is reachable from `spark.sql(...)` as well as the Column API:
  *
  *   SELECT url, minhash_sig(text, 5, 128, 42) FROM pages
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval(null).toString.toInt
    def longLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
      e.eval(null).toString.toLong

    reg.createOrReplaceTempFunction("extract_text",
      es => ExtractText(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("natural_sort_key",
      es => NaturalSortKey(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es(0), intLit(es(1)), intLit(es(2)), longLit(es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es(0), intLit(es(1)), longLit(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("band_buckets",
      es => BandBuckets(es(0), intLit(es(1)), intLit(es(2)), longLit(es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("sig_digest",
      es => SigDigest(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_blocks",
      es => SimHashBlocks(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      es => WinnowFingerprints(es(0), intLit(es(1)), intLit(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("est_jaccard",
      es => EstJaccard(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_jaccard",
      es => ShingleJaccard(es(0), es(1), intLit(es(2)), longLit(es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_dist",
      es => HammingDist(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("common_substring_ge",
      es => CommonSubstringGE(es(0), es(1), intLit(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("vec_simhash",
      es => VecSimHash(es(0), intLit(es(1)), longLit(es(2))), "scala_udf")
  }
}
