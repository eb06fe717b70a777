package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** 5,000 distinct keys, each duplicated 1–3 times (12.5k rows total),
    * interleaved deterministically so partition splits mix everything. */
  private def keyed: Seq[String] =
    (0 until 5000).flatMap(i => Seq.fill(1 + i % 3)(s"key-$i-${i * 7 % 101}"))
      .sortBy(_.hashCode)

  test("estimate within KMV error bounds of the exact distinct count") {
    import spark.implicits._
    val df = keyed.toDF("key").repartition(8)
    val r = Kmv.distinctReport(df, "key", 256).collect().head
    val est = r.getAs[Long]("est_distinct")
    val rows = r.getAs[Long]("rows_total")
    assert(rows == keyed.size.toLong)
    assert(r.getAs[Long]("sketch_size") == 256L)
    // se ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; assert 4 sigma
    assert(math.abs(est - 5000L) < 5000 * 0.25, s"est=$est")
    val dup = r.getAs[Long]("est_dup_rows")
    assert(dup == math.max(0L, rows - est))
    assert(r.getAs[Double]("dup_rate_est") == dup.toDouble / rows.toDouble)
  }

  test("under-full sketch is EXACT, invariant to partitioning, null-skipping") {
    import spark.implicits._
    for (parts <- Seq(1, 7, 32)) {
      val df = (keyed.take(500).map(Option(_)) ++ Seq(None, None))
        .toDF("key").repartition(parts)
      val r = Kmv.distinctReport(df, "key", 4096).collect().head
      val exact = keyed.take(500).distinct.size.toLong
      assert(r.getAs[Long]("est_distinct") == exact, s"parts=$parts")
      assert(r.getAs[Long]("sketch_size") == exact)
      // nulls out of rows_total, like count(key)
      assert(r.getAs[Long]("rows_total") == 500L)
    }
  }

  test("overlap is exact Jaccard when both sketches are under-full") {
    import spark.implicits._
    // |A|=300 distinct, |B|=300 distinct, |A∩B|=150 → J = 150/450
    val a = (0 until 300).map(i => s"doc-$i").toDF("key")
    val b = (150 until 450).map(i => s"doc-$i").toDF("key")
    val r = Kmv.overlap(a.repartition(5), b.repartition(3), "key", 1024)
      .collect().head
    assert(r.getAs[Long]("union_sketch_size") == 450L)
    assert(r.getAs[Long]("both_in_union") == 150L)
    assert(r.getAs[Double]("jaccard_est") == 150.0 / 450.0)
    assert(r.getAs[Long]("est_union") == 450L)
  }

  test("overlap estimate tracks true Jaccard at k well below the union") {
    import spark.implicits._
    // 4,000 vs 4,000 with 2,000 shared → J = 2000/6000 = 1/3
    val a = (0 until 4000).map(i => s"page-$i").toDF("key")
    val b = (2000 until 6000).map(i => s"page-$i").toDF("key")
    val r = Kmv.overlap(a.repartition(8), b.repartition(8), "key", 256)
      .collect().head
    assert(r.getAs[Long]("union_sketch_size") == 256L)
    val j = r.getAs[Double]("jaccard_est")
    // se ≈ sqrt(J(1-J)/k) ≈ 2.9%; assert 4 sigma
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard_est=$j")
    val u = r.getAs[Long]("est_union")
    assert(math.abs(u - 6000L) < 6000 * 0.25, s"est_union=$u")
  }

  test("distinctReportBy: per-group sketches, both branches, partition invariance") {
    import spark.implicits._
    // group g0: 10 distinct (under-full at k=64 → exact); g1: 5000
    // distinct with duplicates (estimator branch)
    val rows = (0 until 10).map(i => ("g0", s"a$i")) ++
      (0 until 5000).flatMap(i => Seq(("g1", s"b$i"), ("g1", s"b$i")))
    for (parts <- Seq(1, 16)) {
      val r = Kmv.distinctReportBy(
        rows.toDF("host", "key").repartition(parts), "host", "key", 64)
        .collect().map(x => x.getString(0) -> x).toMap
      assert(r("g0").getAs[Long]("est_distinct") == 10L, s"parts=$parts")
      assert(r("g0").getAs[Long]("captures") == 10L)
      val est = r("g1").getAs[Long]("est_distinct")
      assert(r("g1").getAs[Long]("captures") == 10000L)
      assert(r("g1").getAs[Long]("sketch_size") == 64L)
      // se ≈ 1/sqrt(62) ≈ 12.7%; 4 sigma
      assert(math.abs(est - 5000L) < 5000 * 0.5, s"est=$est")
    }
  }

  test("mergeSketches equals the from-scratch union sketch (epoch-incremental identity)") {
    import spark.implicits._
    val a = (0 until 3000).map(i => s"epoch1-$i")
    val b = (1500 until 4500).map(i => if (i < 3000) s"epoch1-$i" else s"epoch2-$i")
    val k = 512
    val merged = a.toDF("key").agg(Kmv.sketchAgg(col("key"), k).as("sa"))
      .crossJoin(b.toDF("key").agg(Kmv.sketchAgg(col("key"), k).as("sb")))
      .select(Kmv.mergeSketches(col("sa"), col("sb"), k).as("su"))
      .collect().head.getSeq[String](0)
    val scratch = (a ++ b).toDF("key")
      .agg(Kmv.sketchAgg(col("key"), k).as("s"))
      .collect().head.getSeq[String](0)
    assert(merged == scratch)
  }

  test("raw (un-hashed) keys order by UTF-8 binary, matching array_sort downstream") {
    import spark.implicits._
    // UTF-16 code units would sort the surrogate-pair emoji (U+1F600)
    // BEFORE U+FFFD; UTF-8 binary order (Spark's) sorts it after
    val keys = Seq("z", "\uFFFD", "\uD83D\uDE00", "a")
    val sk = keys.toDF("key").repartition(2)
      .agg(graft.functions.gf.kmv_sketch(col("key"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(sk == Seq("a", "z", "\uFFFD"))
    // and the sketch is ascending under Spark's own sort
    val sorted = Seq(1).toDF("x")
      .select(array_sort(typedLit(sk)).as("s")).collect().head.getSeq[String](0)
    assert(sk == sorted)
  }

  test("kmv_sketch is SQL-registered and matches the Column API") {
    import spark.implicits._
    keyed.take(800).toDF("key").createOrReplaceTempView("kmv_in")
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT kmv_sketch(md5(key), 64) AS sketch FROM kmv_in")
      .collect().head.getSeq[String](0)
    val viaCol = keyed.take(800).toDF("key")
      .agg(Kmv.sketchAgg(col("key"), 64).as("sketch"))
      .collect().head.getSeq[String](0)
    assert(viaSql == viaCol)
    assert(viaSql.size == 64 && viaSql == viaSql.sorted)
  }
}
