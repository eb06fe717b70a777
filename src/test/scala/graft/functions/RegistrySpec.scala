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

  test("bounded_topk aggregate is callable from SQL") {
    GraftFunctions.register(spark)
    spark.sql(
      """select * from values (1L, 5L, 10L, 0L), (1L, 3L, 20L, 0L), (1L, 9L, 30L, 0L)
        |  as t_btk(bkey, nkp, id, sim)""".stripMargin)
      .createOrReplaceTempView("t_btk")
    val row = spark.sql(
      """select r.total as total, r.ms.id as ids
        |from (select bounded_topk(nkp, id, sim, 2) as r from t_btk group by bkey)"""
        .stripMargin).head()
    assert(row.getAs[Long]("total") == 3L)
    assert(row.getSeq[Long](1) == Seq(20L, 10L)) // two smallest nkp, (nkp,id) order
  }

  test("spark.sql.extensions injection exposes the functions in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val base = spark // materialize the shared session first
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext at
    // creation — a reused test context can't exercise that loading path, so
    // apply the same class through the public builder hook (identical
    // injection code; spark-submit with the conf drives it the other way).
    // No active/default session in scope, restored in finally — suites run
    // sequentially in the forked test JVM.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate() // reuses the SparkContext, fresh session state
      val row = s2.sql(
        "select size(minhash_sig('a b c d e f g', 5, 128, 42)) as n, " +
          "hamming_dist(11L, 12L) as hd").head()
      assert(row.getAs[Int]("n") == 128)
      assert(row.getAs[Int]("hd") == 3) // 0b1011 ^ 0b1100 = 0b0111
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
