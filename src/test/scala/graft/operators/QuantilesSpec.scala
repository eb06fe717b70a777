package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Driver-side reference: the identical integer rank rule over a full
    * sort. */
  private def ref(values: Seq[Long], pMilles: Seq[Int]): Map[Int, Long] = {
    val sorted = values.sorted
    val n = sorted.size.toLong
    pMilles.map { p =>
      val rank = (p.toLong * n + 999L) / 1000L
      p -> sorted((rank - 1).toInt)
    }.toMap
  }

  private val levels = Seq(10, 100, 250, 500, 750, 900, 990, 1000)

  test("matches the full-sort reference on a skewed multiset, all partitionings") {
    import spark.implicits._
    // heavy ties + outliers: quantiles must respect multiplicity exactly
    val values: Seq[Long] =
      Seq.fill(500)(7L) ++ (0 until 300).map(_.toLong * 3) ++
        Seq.fill(90)(1000000L) ++ Seq(-5L, -5L, 0L)
    val want = ref(values, levels)
    for (parts <- Seq(1, 8, 32)) {
      val got = Quantiles
        .exactQuantiles(values.toDF("x").repartition(parts), "x", levels)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("rank arithmetic is integer-exact at the permille boundaries") {
    import spark.implicits._
    // n = 500: p=100 → rank = (100·500+999) div 1000 = 50 (NOT the IEEE
    // ceil(0.1·500)=51 trap) — the 50th smallest of 1..500 is 50
    val df = (1L to 500L).toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(100, 500, 1000))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(got == List((100, 50L, 50L), (500, 250L, 250L),
      (1000, 500L, 500L)))
  }

  test("nulls are dropped; duplicate levels collapse") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), Some(3L), None)
      .toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(500, 500, 1000))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(500 -> 2L, 1000 -> 3L))
  }

  test("calibrateKeep: exact cut, tie overshoot, both directions, invariant to parts") {
    import spark.implicits._
    // 100 values 1..100, no ties: keep the top 30% → threshold 71, kept 30
    val clean = (1 to 100).toDF("s")
    val r = Quantiles.calibrateKeep(clean.repartition(7), "s", 300).collect().head
    assert(r.getAs[Int]("target_permille") == 300)
    assert(r.getAs[Int]("threshold") == 71)
    assert(r.getAs[Long]("kept") == 30L)
    assert(r.getAs[Long]("kept_permille") == 300L)
    // lower-is-better (perplexity direction): keep the smallest 30%
    val lo = Quantiles.calibrateKeep(clean, "s", 300, higherIsBetter = false)
      .collect().head
    assert(lo.getAs[Int]("threshold") == 30 && lo.getAs[Long]("kept") == 30L)
    // tie-heavy: 90 copies of 1 + 10 copies of 2, keep "top 5%" → the
    // threshold lands on 2 and ALL ten ties keep (overshoot reported)
    val ties = (Seq.fill(90)(1) ++ Seq.fill(10)(2)).toDF("s")
    val t = Quantiles.calibrateKeep(ties.repartition(5), "s", 50).collect().head
    assert(t.getAs[Int]("threshold") == 2)
    assert(t.getAs[Long]("kept") == 10L)
    assert(t.getAs[Long]("kept_permille") == 100L)
  }

  test("invalid levels are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "x", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "x", Seq(1001))
    }
  }
}
