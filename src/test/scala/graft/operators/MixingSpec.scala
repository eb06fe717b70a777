package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("stratified sample: deterministic, rate-accurate, allowlist drops absent strata") {
    import spark.implicits._
    val docs = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "es"))
      .toDF("doc_id", "lang")
    val strata = Map("en" -> 0.5)
    val a = Mixing.stratifiedSample(docs, "lang", "doc_id", strata).collect()
    val b = Mixing.stratifiedSample(docs, "lang", "doc_id", strata).collect()
    // pure function of (id, seed): reruns identical (retry-safe at scale)
    assert(a.map(_.getLong(0)).sorted.sameElements(b.map(_.getLong(0)).sorted))
    // es absent from the map → dropped entirely
    assert(a.forall(_.getString(1) == "en"))
    // Bernoulli(0.5) over 2000 en docs: expect ~1000, tolerate 5 sigma (±112)
    assert(math.abs(a.length - 1000) < 115, s"got ${a.length} of 2000 at f=0.5")
  }

  test("stratified sample: f=1 keeps every row, f=0 keeps none, seed changes the draw") {
    import spark.implicits._
    val docs = (0 until 500).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    assert(Mixing.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 1.0)).count() == 500)
    assert(Mixing.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 0.0)).count() == 0)
    val s1 = Mixing.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 0.5), seed = 1)
      .collect().map(_.getLong(0)).toSet
    val s2 = Mixing.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 0.5), seed = 2)
      .collect().map(_.getLong(0)).toSet
    assert(s1 != s2)
  }

  test("sequence packing: per-shard running totals cut at the budget") {
    import spark.implicits._
    // one shard (ids ≡ 0 mod 4), token counts 100, 100, 100 with budget 256:
    // doc 0 starts seq 0 offset 0, doc 4 seq 0 offset 100, doc 8 seq 0
    // offset 200 (straddles into seq 1), next doc starts at 300 → seq 1
    val docs = Seq((0L, 100), (4L, 100), (8L, 100), (12L, 100))
      .toDF("doc_id", "n_tok")
    val out = Mixing.packSequences(docs, "doc_id", col("n_tok"), budget = 256, nShards = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((0L, 0L)))
    assert(out(4L) == ((0L, 100L)))
    assert(out(8L) == ((0L, 200L)))
    assert(out(12L) == ((1L, 44L))) // 300 tokens before → seq 1, offset 300-256
  }

  test("sequence packing: shards pack independently and cover all docs") {
    import spark.implicits._
    val docs = (0 until 1000).map(i => (i.toLong, 50 + (i % 7))).toDF("doc_id", "n_tok")
    val out = Mixing.packSequences(docs, "doc_id", col("n_tok"), budget = 512, nShards = 8)
    assert(out.count() == 1000)
    // every (shard, seq) run is contiguous: offsets within a shard follow
    // tokens_before = sum of earlier docs' counts in id order
    val rows = out.collect().map(r =>
      (r.getInt(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var before = 0L
      rs.sortBy(_._2).foreach { case (_, _, n, seq, off) =>
        assert(seq == before / 512 && off == before % 512)
        before += n
      }
    }
    // offsets never reach the budget
    assert(rows.forall(_._5 < 512))
  }

  test("capPerStratum keeps the k order-smallest rows per stratum") {
    import spark.implicits._
    val docs = (0 until 100).map(i => (i.toLong, s"src${i % 4}")).toDF("id", "src")
    val out = Mixing.capPerStratum(docs, "src", k = 5, col("id"))
      .collect().map(r => r.getString(1) -> r.getLong(0))
    assert(out.length == 20)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val s = src.stripPrefix("src").toInt
      // the 5 smallest ids of stratum s are s, s+4, ..., s+16
      assert(rows.map(_._2).sorted.toSeq == (0 until 5).map(j => (s + 4 * j).toLong))
    }
    // under-full strata pass through whole
    val small = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    assert(Mixing.capPerStratum(small, "src", k = 5, col("id")).count() == 3)
    intercept[IllegalArgumentException] { Mixing.capPerStratum(small, "src", 0, col("id")) }
    intercept[IllegalArgumentException] { Mixing.capPerStratum(small, "src", 1) }
  }

  test("capPerStratum plans a WindowGroupLimit (map-side limit before the exchange)") {
    import spark.implicits._
    val docs = (0 until 100).map(i => (i.toLong, s"src${i % 4}")).toDF("id", "src")
    val plan = Mixing.capPerStratum(docs, "src", k = 5, col("id"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank-filter rewrite to plan WindowGroupLimit:\n$plan")
  }

  test("epoch sampling: floor copies always, fractional extra at the draw rate, allowlist") {
    import spark.implicits._
    val docs = (0 until 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "es"))
      .toDF("doc_id", "lang")
    val out = Mixing.epochSample(docs, "lang", "doc_id",
      Map("en" -> 2.5, "zh" -> 1.0), seed = 7L).cache()
    try {
      // es absent → dropped entirely
      assert(out.where(col("lang") === "es").count() == 0)
      // zh: exactly one copy each, epoch 0
      assert(out.where(col("lang") === "zh").count() == 1000)
      assert(out.where(col("lang") === "zh" && col("epoch") =!= 0).count() == 0)
      // en: 2 or 3 copies per doc; total ≈ 2500 (Bernoulli(0.5) on 1000
      // docs, 5σ ≈ 79); epochs are 0..n-1 (contiguous from 0)
      val perDoc = out.where(col("lang") === "en")
        .groupBy("doc_id").count().collect().map(_.getLong(1))
      assert(perDoc.forall(n => n == 2 || n == 3))
      val total = perDoc.sum
      assert(math.abs(total - 2500L) < 82, s"en copies $total of expected ~2500")
      val epochs = out.where(col("lang") === "en" && col("doc_id") === 0L)
        .select("epoch").collect().map(_.getInt(0)).sorted
      assert(epochs.sameElements(0 until epochs.length))
      // pure function of (id, seed): rerun identical
      val again = Mixing.epochSample(docs, "lang", "doc_id",
        Map("en" -> 2.5, "zh" -> 1.0), seed = 7L)
      assert(again.exceptAll(out).count() == 0 && out.exceptAll(again).count() == 0)
    } finally out.unpersist()
  }
}
