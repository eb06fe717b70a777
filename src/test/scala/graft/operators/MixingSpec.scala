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

  test("score-weighted sampling: p=0 drops, p>=1 keeps all, mid-p hits the rate, deterministic") {
    import spark.implicits._
    val docs = (0 until 4000).map(i => (i.toLong,
      if (i < 1000) 0.0 else if (i < 2000) 1.0 else if (i < 3000) 1.5 else 0.25))
      .toDF("doc_id", "p")
    val out = Mixing.sampleByProb(docs, "doc_id", col("p"), seed = 5L).cache()
    try {
      assert(out.where(col("p") === 0.0).count() == 0)
      assert(out.where(col("p") === 1.0).count() == 1000, "p=1 keeps every row")
      assert(out.where(col("p") === 1.5).count() == 1000, "p>1 clamps to keep-all")
      // Bernoulli(0.25) over 1000: 5σ ≈ 68
      val quarter = out.where(col("p") === 0.25).count()
      assert(math.abs(quarter - 250L) < 70, s"p=0.25 kept $quarter of ~250")
      val again = Mixing.sampleByProb(docs, "doc_id", col("p"), seed = 5L)
      assert(again.exceptAll(out).count() == 0 && out.exceptAll(again).count() == 0)
      // a garbage negative score must DROP, not slip past the hex compare
      val neg = Mixing.sampleByProb(
        docs.withColumn("p", col("p") - lit(2.0)), "doc_id", col("p"), seed = 5L)
      assert(neg.count() == 0, "negative probabilities must keep nothing")
      // no shuffle: pure filter
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"sampleByProb must not shuffle:\n$plan")
    } finally out.unpersist()
  }

  test("budget solver: weight = target/available, cap flags, allowlist drops absent strata") {
    import spark.implicits._
    // en: 10 docs × 100 tokens = 1000; zh: 2 × 50 = 100; es present but
    // not targeted → excluded from the solve entirely
    val docs = ((0 until 10).map(i => (i.toLong, "en", 100L)) ++
      Seq((100L, "zh", 50L), (101L, "zh", 50L), (200L, "es", 999L)))
      .toDF("doc_id", "lang", "toks")
    val w = Mixing.solveEpochWeights(docs, "lang", col("toks"),
      Map("en" -> 0.8, "zh" -> 0.2), budgetTokens = 2000L, maxEpochs = 3.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(w.keySet == Set("en", "zh"))
    // en: target 1600 over 1000 available → weight 1.6, uncapped
    val en = w("en")
    assert(en.getLong(1) == 1000L && en.getDouble(2) == 1600.0)
    assert(math.abs(en.getDouble(3) - 1.6) < 1e-12 && !en.getBoolean(4))
    assert(math.abs(en.getDouble(5) - 1600.0) < 1e-9)
    // zh: target 400 over 100 available → raw 4.0 > maxEpochs 3 → capped
    val zh = w("zh")
    assert(zh.getDouble(3) == 3.0 && zh.getBoolean(4))
    assert(math.abs(zh.getDouble(5) - 300.0) < 1e-9)
  }

  test("budgeted epoch sample realizes the target token mass in expectation") {
    import spark.implicits._
    val docs = (0 until 2000).map(i =>
      (i.toLong, if (i % 4 == 0) "wiki" else "web", 100L))
      .toDF("doc_id", "lang", "toks")
    // available: wiki 50k, web 150k; targets 0.5/0.5 of 200k → wiki needs
    // 2.0 epochs, web 2/3 of one epoch
    val out = Mixing.epochSampleByBudget(docs, "lang", "doc_id", col("toks"),
      Map("wiki" -> 0.5, "web" -> 0.5), budgetTokens = 200000L, seed = 3L)
    val mass = out.groupBy("lang").agg(sum("toks").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("wiki") == 100000L, "integral weight 2.0 is exact")
    // fractional 2/3 draw over 1500 docs: 5σ ≈ 6k tokens
    assert(math.abs(mass("web") - 100000L) < 6100, s"web mass ${mass("web")}")
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
