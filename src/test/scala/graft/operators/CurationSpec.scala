package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  // 12-word English filler that passes the quality gate.
  private def en(tag: String): String =
    s"the quick brown fox jumps over the lazy dog near $tag today"

  private def corpus() = {
    import spark.implicits._
    Seq(
      // survivors: one per source s0/s1 beyond the cap experiment below
      (1L, "s0", en("one")),
      (2L, "s0", en("two")),
      (3L, "s0", en("three")),
      (4L, "s1", en("four")),
      // language drop: German stopwords dominate
      (5L, "s1", "der die das und ist nicht ein mit auf für der die das und"),
      // quality drop: too short
      (6L, "s1", "the end"),
      // quality drop: mean word length out of band (still English via "the")
      (7L, "s1", ("the" +: Seq.fill(9)("x" * 30)).mkString(" ")),
      // exact duplicates of doc 1's text → dedup keeps doc 1 only
      (8L, "s0", en("one")),
      (9L, "s1", en("one")),
      // undetermined language: no stopwords at all
      (10L, "s1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "source", "text")
  }

  test("annotate computes pred_lang, n_words, mean_word_len") {
    val ann = Curation.annotate(corpus())
      .select("doc_id", "pred_lang", "n_words", "mean_word_len")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(ann(1L)._1 == "en")
    assert(ann(5L)._1 == "de")
    assert(ann(10L)._1 == "und")
    assert(ann(6L)._2 == 2L)
    assert(ann(7L)._1 == "en" && ann(7L)._3 > 12.0)
    assert(ann(1L)._2 == 12L)
  }

  test("curate drops each stage's planted rows and keeps the rest") {
    val out = Curation.curate(corpus(), capPerSource = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 5 lang-drop, 6/7 quality-drop, 10 und-drop, 8/9 dedup-collapse into 1
    assert(out == Set(1L, 2L, 3L, 4L))
  }

  test("per-source cap binds and keeps the lowest ids") {
    val out = Curation.curate(corpus(), capPerSource = 2)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // s0 has survivors 1,2,3 → cap 2 keeps 1,2; s1 keeps its only survivor 4
    assert(out == Set((1L, "s0"), (2L, "s0"), (4L, "s1")))
  }

  test("funnelStats reports the per-stage survivor counts") {
    val r = Curation.funnelStats(corpus(), capPerSource = 2).head()
    assert(r.getAs[Long]("n_input") == 10L)
    assert(r.getAs[Long]("n_lang") == 8L) // minus de(5) and und(10)
    assert(r.getAs[Long]("n_quality") == 6L) // minus short(6) and wide(7)
    assert(r.getAs[Long]("n_unique") == 4L) // 8,9 collapse into 1
    assert(r.getAs[Long]("n_final") == 3L) // cap 2 on s0 drops doc 3
  }

  test("dedup election keeps the lowest doc_id of a duplicate group") {
    import spark.implicits._
    val shuffled = corpus().orderBy(rand(7))
    val out = Curation.curate(shuffled).where(col("doc_id").isin(1L, 8L, 9L))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("one scan, two group-limit exchanges, per-row stages fused") {
    // cap 5 < the relation's maxRows — a cap that provably can't bind
    // (15 ≥ 10 local rows) makes the optimizer skip the group-limit
    // rewrite as useless, which is correct but not what we're pinning.
    val plan = Curation.curate(corpus(), capPerSource = 5)
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange".r.findAllIn(plan).size
    assert(nExchanges <= 2, s"expected <= 2 exchanges, got $nExchanges:\n$plan")
    val nLimits = "WindowGroupLimit".r.findAllIn(plan).size
    // dedup + cap, each with a partial (pre-exchange) and final instance
    assert(nLimits == 4, s"expected 4 WindowGroupLimit nodes, got $nLimits:\n$plan")
  }

  test("normalized chain collapses NFC twins and repeated-line copies; raw chain keeps both") {
    import spark.implicits._
    // doc 20 and its twin 21 render identically: 21 differs only by a
    // decomposed café form and an extra duplicated line
    val base = en("twenty")
    val docs = Seq(
      (20L, "s0", base + "\n" + base + "\ncafé note"),
      (21L, "s0", base + "\n" + base + "\n" + base + "\ncafé note"),
      (22L, "s1", en("other"))).toDF("doc_id", "source", "text")
    val norm = Curation.curateNormalized(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(norm == Set(20L, 22L), s"twin must collapse under the normalized chain: $norm")
    val raw = Curation.curate(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(raw == Set(20L, 21L, 22L), "raw digests differ, so the raw chain keeps both")
  }

  test("normalized chain keeps the two-exchange fused shape") {
    // a parquet round-trip: a local relation would constant-fold the
    // per-row stages at plan time, hiding what we're pinning
    val dir = java.nio.file.Files.createTempDirectory("curation-norm").toString
    corpus().write.mode("overwrite").parquet(dir)
    val plan = Curation
      .curateNormalized(spark.read.parquet(dir), capPerSource = 5)
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange".r.findAllIn(plan).size
    assert(nExchanges <= 2, s"normalize stage must fuse, got $nExchanges exchanges:\n$plan")
    assert(plan.contains("unicode_norm"), s"normalize stage missing from plan:\n$plan")
    val nScans = "Scan parquet".r.findAllIn(plan).size
    assert(nScans == 1, s"expected ONE corpus scan, got $nScans:\n$plan")
  }
}
