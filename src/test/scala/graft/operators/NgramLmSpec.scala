package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  // ---- driver-side reference: same tokenization, counts, quantization ----

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).toSeq

  private def grams(ws: Seq[String], n: Int): Seq[String] =
    if (ws.size < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq

  /** Spark's round() is HALF_UP (BigDecimal), NOT Math.round. */
  private def q(x: Double): Long =
    new JBigDecimal(x * 1000000L).setScale(0, RoundingMode.HALF_UP).longValue

  private def refScores(train: Seq[String], docs: Seq[(Long, String)],
      minCount: Long = 0L): Map[Long, (Long, Long, Long)] = {
    def counts(n: Int): Map[String, Long] =
      train.flatMap(t => grams(toks(t), n)).groupBy(identity)
        .view.mapValues(_.size.toLong).filter(_._2 >= minCount).toMap
    val (c1, c2, c3) = (counts(1), counts(2), counts(3))
    val t = train.map(toks(_).size.toLong).sum
    val v = c1.size.toLong
    val bo = NgramLm.BackoffMicro
    docs.map { case (id, text) =>
      val ws = toks(text)
      val pos = grams(ws, 3).map { g3 =>
        val p = g3.split(" ")
        val (a, b, w) = (p(0), p(1), p(2))
        val uni = q(math.log(c1.getOrElse(w, 0L) + 1.0) - math.log(t.toDouble + v))
        if (c3.contains(g3) && c2.contains(s"$a $b"))
          q(math.log(c3(g3).toDouble) - math.log(c2(s"$a $b").toDouble))
        else if (c2.contains(s"$b $w") && c1.contains(b))
          bo + q(math.log(c2(s"$b $w").toDouble) - math.log(c1(b).toDouble))
        else 2L * bo + uni
      }
      val s = pos.sum
      val n = pos.size.toLong
      // mirror the operator's engine-unambiguous positive-magnitude div
      id -> ((n, s, if (n > 0) -((-s) / n) else 0L))
    }.toMap
  }

  /** Fixture exercising all three backoff branches: trigrams seen in
    * training, bigram-only continuations, and out-of-vocabulary words. */
  private val trainTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps all day long",
    "a slow green turtle walks under the lazy dog",
    "the quick red fox jumps over a fence")
  private val scoreDocs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps", // in-model trigrams
    2L -> "quick brown turtle walks under", // bigram backoff mixes
    3L -> "zzz unknown words qqq entirely", // OOV double-backoff
    4L -> "the quick", // too short: 0 positions
    5L -> "lazy dog the quick brown fox sleeps all night") // mixed

  private def run(minCount: Long, parts: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val trainDf = trainTexts.toDF("text").repartition(parts)
    val docsDf = scoreDocs.toDF("doc_id", "text").repartition(parts)
    NgramLm.score(docsDf, NgramLm.train(trainDf, minCount = minCount))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("matches the reference recurrence exactly across partitionings") {
    val want = refScores(trainTexts, scoreDocs)
    for (parts <- Seq(1, 7)) assert(run(0L, parts) == want, s"parts=$parts")
  }

  test("all three backoff branches fire in the fixture") {
    // doc 1 hits the trigram branch (score > 2·backoff floor per pos),
    // doc 3 is pure OOV: every position scores 2·backoff + smoothed uni
    val got = run(0L, 4)
    val (n3, s3, _) = got(3L)
    assert(n3 == 3)
    val t = trainTexts.map(toks(_).size.toLong).sum
    val v = trainTexts.flatMap(toks).distinct.size.toLong
    val oov = 2L * NgramLm.BackoffMicro + q(math.log(1.0) - math.log(t.toDouble + v))
    assert(s3 == 3L * oov, s"pure-OOV doc must be exactly 3 oov positions: $got")
    assert(got(1L)._3 > got(3L)._3, "in-model doc must outscore OOV doc")
    assert(got(4L) == ((0L, 0L, 0L)), "short doc scores 0 over 0 positions")
  }

  test("hapax pruning changes scores consistently with the reference") {
    val want = refScores(trainTexts, scoreDocs, minCount = 2L)
    assert(run(2L, 5) == want)
  }

  test("plan: document text never crosses an Exchange (only gram keys shuffle)") {
    import spark.implicits._
    // parquet round-trip so ConvertToLocalRelation can't fold the claim away
    val dir = java.nio.file.Files.createTempDirectory("ngramlm").toString
    scoreDocs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/d")
    trainTexts.toDF("text").write.mode("overwrite").parquet(s"$dir/t")
    val out = NgramLm.score(spark.read.parquet(s"$dir/d"),
      NgramLm.train(spark.read.parquet(s"$dir/t")))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$plan")
    val textAttrs = "text#\\d+".r.findAllIn(plan).toSet
    assert(textAttrs.nonEmpty, s"no text attr found:\n$plan")
    assert(exchanges.forall(l => textAttrs.forall(a => !l.contains(a))),
      s"doc text crossed an Exchange:\n$plan")
  }

  test("training-slice lookalikes outscore non-lookalikes") {
    import spark.implicits._
    val train = (0 until 20).map(i => s"alpha beta gamma delta run $i").toDF("text")
    val docs = Seq(
      (1L, "alpha beta gamma delta run often"),
      (2L, "omega psi chi unrelated words here")).toDF("doc_id", "text")
    val got = NgramLm.score(docs, NgramLm.train(train))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) > got(2L))
  }
}
