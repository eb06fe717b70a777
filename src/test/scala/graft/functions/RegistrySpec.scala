package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("custom expressions are callable from SQL") {
    GraftFunctions.register(spark)
    spark.sql("select 'a b c d e f g' as text")
      .createOrReplaceTempView("t_reg")
    val row = spark.sql(
      """select
        |  size(minhash_sig(text, 5, 128, 42)) as n,
        |  simhash64(text, 5, 42) as sh,
        |  hamming_dist(simhash64(text, 5, 42), simhash64(text, 5, 42)) as hd,
        |  shingle_jaccard(text, text, 5, 42) as j,
        |  common_substring_ge(text, text, 5) as cs,
        |  natural_sort_key('doc2') < natural_sort_key('doc10') as nat
        |from t_reg""".stripMargin).head()
    assert(row.getAs[Int]("n") == 128)
    assert(row.getAs[Int]("hd") == 0)
    assert(row.getAs[Double]("j") == 1.0)
    assert(row.getAs[Boolean]("cs"))
    assert(row.getAs[Boolean]("nat"))
  }

  test("extract_text from SQL") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "select extract_text(encode('<p>hi &amp; bye</p>', 'UTF-8')) as t").head().getString(0)
    assert(got == "hi & bye")
  }
}
