package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Skewed fixture: 20 heavy items (60..250 copies each, deterministic)
    * over a 4,000-item unique tail. */
  private val skewed: Seq[String] = {
    val heavy = (0 until 20).flatMap(h => Seq.fill(60 + h * 10)(s"hot$h"))
    val tail = (0 until 4000).map(i => s"tail$i-${i % 13}")
    // deterministic interleave so partition splits mix heavy and tail
    (heavy ++ tail).sortBy(_.hashCode)
  }

  private def truth(min: Long): Map[String, Long] =
    skewed.groupBy(identity).collect {
      case (k, v) if v.size >= min => k -> v.size.toLong
    }.toMap

  test("exact vs full groupBy truth across partitionings (merge paths exercised)") {
    import spark.implicits._
    for (parts <- Seq(1, 7, 32)) {
      val df = skewed.toDF("item").repartition(parts)
      val got = HeavyHitters.frequentItems(df, "item", cap = 256, minCount = 60)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == truth(60), s"parts=$parts")
      assert(got.size == 20, "fixture should yield exactly the 20 hot items")
    }
  }

  test("sketch lower bounds + zero-miss superset at max_err") {
    import spark.implicits._
    val df = skewed.toDF("item").repartition(8)
    val (entries, total, maxErr) = HeavyHitters.sketch(df, "item", cap = 128)
    assert(total == skewed.size.toLong)
    assert(entries.size <= 128)
    val exact = skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // every sketch count is a lower bound within max_err of the truth
    entries.foreach { case (item, cnt) =>
      val t = exact(item)
      assert(cnt <= t && t <= cnt + maxErr, s"$item: cnt=$cnt true=$t err=$maxErr")
    }
    // every item with true count > max_err is present (zero-miss)
    val present = entries.map(_._1).toSet
    exact.foreach { case (item, t) =>
      if (t > maxErr) assert(present.contains(item), s"missed $item (true=$t > err=$maxErr)")
    }
    assert(maxErr > 0, "cap=128 over ~4k distinct must compress — vacuous otherwise")
  }

  test("sketch is exact (max_err = 0) when distinct count never exceeds cap") {
    import spark.implicits._
    val df = (0 until 1000).map(i => s"k${i % 50}").toDF("item").repartition(4)
    val (entries, total, maxErr) = HeavyHitters.sketch(df, "item", cap = 64)
    assert(maxErr == 0L && total == 1000L)
    assert(entries.toMap == (0 until 50).map(i => s"k$i" -> 20L).toMap)
  }

  test("uncertifiable threshold fails loudly (uniform data, tiny cap)") {
    import spark.implicits._
    val df = (0 until 5000).map(i => s"u${i % 500}").toDF("item")
    val ex = intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", cap = 8, minCount = 5)
    }
    assert(ex.getMessage.contains("cannot certify"))
  }

  test("nulls are skipped; SQL registry surface works") {
    import spark.implicits._
    val df = (Seq("a", "a", "b") ++ Seq.fill(2)(null.asInstanceOf[String]))
      .toDF("item")
    val (entries, total, maxErr) = HeavyHitters.sketch(df, "item", cap = 4)
    assert(total == 3L && maxErr == 0L)
    assert(entries.toMap == Map("a" -> 2L, "b" -> 1L))
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql(
      "SELECT misra_gries(item, 4).total AS t FROM hh_in").head().getLong(0)
    assert(viaSql == 3L)
  }
}
