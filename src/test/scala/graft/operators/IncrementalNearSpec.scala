package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class IncrementalNearSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val t1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val t2 = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val t3 = (1 to 30).map(i => s"gamma$i").mkString(" ")

  test("vsCorpus: near copy matches, exact copy scores 1.0, novel stays novel") {
    import spark.implicits._
    val corpus = Seq(("c1", t1), ("c2", t2)).toDF("url", "text")
    val batch = Seq(
      ("b1", t1 + " tail"), // near copy of c1: 26∩ of 27∪ shingles
      ("b2", t3),           // novel
      ("b3", t2))           // exact copy of c2: J = 1.0
      .toDF("url", "text")
    val got = IncrementalNear.vsCorpus(batch, corpus).collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.get(2)), r.getBoolean(3))))
      .toMap
    assert(got("b1")._1.contains("c1") && !got("b1")._3)
    assert(math.abs(got("b1")._2.get.asInstanceOf[Double] - 26.0 / 27) < 1e-6)
    assert(got("b2") == ((None, None, true)))
    assert(got("b3") == ((Some("c2"), Some(1.0d), false)))
  }

  test("vsCorpus: best-match election prefers higher Jaccard, then min corpus url") {
    import spark.implicits._
    // c_far shares fewer shingles with the probe than c_near does
    val corpus = Seq(
      ("cA", t1),
      ("cB", t1),                  // identical to cA: tie → min url wins
      ("cZ", t1 + " x y z w v"))   // strictly lower J vs the probe
      .toDF("url", "text")
    val batch = Seq(("b", t1)).toDF("url", "text")
    val r = IncrementalNear.vsCorpus(batch, corpus).head()
    assert(r.getString(1) == "cA", s"tie must break to min url: $r")
    assert(r.getDouble(2) == 1.0)
  }

  test("vsCorpus: hot buckets drop whole (cap), probe then reads novel") {
    import spark.implicits._
    // two identical corpus docs put 2 members in every bucket; cap 1
    // retires those buckets entirely
    val corpus = Seq(("c1", t1), ("c2", t1)).toDF("url", "text")
    val batch = Seq(("b", t1)).toDF("url", "text")
    val dropped = IncrementalNear.vsCorpus(batch, corpus,
      hotBucketCap = 1).head()
    assert(dropped.getBoolean(3), "capped buckets must not produce matches")
    val kept = IncrementalNear.vsCorpus(batch, corpus,
      hotBucketCap = 2).head()
    assert(!kept.getBoolean(3) && kept.getString(1) == "c1")
  }

  test("vsCorpus validates knobs") {
    import spark.implicits._
    val d = Seq(("u", t1)).toDF("url", "text")
    intercept[IllegalArgumentException] {
      IncrementalNear.vsCorpus(d, d, tau = 0.0)
    }
    intercept[IllegalArgumentException] {
      IncrementalNear.vsCorpus(d, d, hotBucketCap = 0)
    }
  }
}
