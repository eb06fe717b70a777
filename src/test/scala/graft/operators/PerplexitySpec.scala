package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CCNet-style char-trigram perplexity scoring + tercile bucketing. */
class PerplexitySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("score: in-domain text beats garbage; short docs score 0.0") {
    import spark.implicits._
    val train = Seq(
      "the quick brown fox jumps over the lazy dog and the cat",
      "the dog and the fox play in the quick brown grass").toDF("text")
      .withColumn("doc_id", lit(0L))
    val tri = Perplexity.trainTrigrams(train)
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog"), // in-domain
      (2L, "zzq xvj qqp wkz jjx vvq"),              // out-of-vocabulary
      (3L, "ab")).toDF("doc_id", "text")            // too short: no trigram
    val r = Perplexity.score(
      docs, tri, Perplexity.contextCounts(tri), Perplexity.alphabetSize(train))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < r(2L), s"in-domain ${r(1L)} should beat garbage ${r(2L)}")
    assert(r(3L) == 0.0)
    assert(r(1L) > 0.0 && r(2L) > 0.0)
  }

  test("model normalizes: trigram probs of a context sum to <= 1 with smoothing") {
    import spark.implicits._
    val train = Seq("abcabcabd").toDF("text")
    val tri = Perplexity.trainTrigrams(train)
    val ctx = Perplexity.contextCounts(tri)
    val v = Perplexity.alphabetSize(train).head().getLong(0)
    // context "ab": abc ×2, abd ×1 → c2 = 3; V = 4 (a b c d)
    val probs = tri.join(ctx, substring(col("gram"), 1, 2) === col("g2"))
      .where(col("g2") === "ab")
      .select(((col("c3") + 1).cast("double") / (col("c2") + lit(v))).as("p"))
      .collect().map(_.getDouble(0))
    assert(v == 4L)
    assert(probs.length == 2)
    // (2+1)/(3+4) and (1+1)/(3+4); unseen mass = 2/7 covers the other 2 chars
    assert(math.abs(probs.sum - 5.0 / 7) < 1e-9)
  }

  test("bucketExact: deterministic terciles by (logppl, id)") {
    import spark.implicits._
    val scored = Seq(
      (1L, 0.5), (2L, 0.5), (3L, 1.0),
      (4L, 2.0), (5L, 3.0), (6L, 9.9)).toDF("doc_id", "logppl")
    val b = Perplexity.bucketExact(scored)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(b == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"))
  }

  test("bucketByThresholds: pure projection classification") {
    import spark.implicits._
    val scored = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("doc_id", "logppl")
    val b = Perplexity.bucketByThresholds(scored, 1.5, 2.5)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(b == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }
}
