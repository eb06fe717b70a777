package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def words(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("13-gram overlap flags exactly the docs sharing a window with the eval set") {
    import spark.implicits._
    val evalText = words(20, "e")
    val clean = words(30, "c")
    // doc 2 embeds a 13-word run from the eval text mid-document
    val leaked = words(5, "x") + " " + evalText.split(" ").slice(3, 16).mkString(" ") +
      " " + words(5, "y")
    val short = words(5, "s") // < 13 words: no grams at all
    val docs = Seq((1L, clean), (2L, leaked), (3L, short), (4L, evalText))
      .toDF("doc_id", "text")
    val bench = Seq((100L, evalText)).toDF("bench_id", "text")
    val out = Decontaminate.contaminated(docs, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out.size == 4, "every doc gets a verdict row")
    assert(out(1L) == ((0L, false)))
    assert(out(2L)._2 && out(2L)._1 == 1, s"one shared 13-gram window: ${out(2L)}")
    assert(out(3L) == ((0L, false)), "short docs have no grams and survive")
    // the eval text itself: 20 words -> 8 grams, all contaminated
    assert(out(4L) == ((8L, true)))
  }

  test("contaminationReport attributes each hit to its benchmark only") {
    import spark.implicits._
    val evalA = words(20, "a")
    val evalB = words(20, "b")
    // doc 1 leaks from A only, doc 2 from B only, doc 3 from both, 4 clean
    val fromA = evalA.split(" ").slice(2, 15).mkString(" ")
    val fromB = evalB.split(" ").slice(4, 17).mkString(" ")
    val docs = Seq(
      (1L, words(4, "x") + " " + fromA),
      (2L, fromB + " " + words(4, "y")),
      (3L, fromA + " zz " + fromB),
      (4L, words(30, "c"))).toDF("doc_id", "text")
    val bench = Seq(("evalA", evalA), ("evalB", evalB)).toDF("bench_id", "text")
    val got = Decontaminate.contaminationReport(docs, bench)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("bench_id")) ->
        r.getAs[Long]("n_hits")).toMap
    assert(got.keySet == Set((1L, "evalA"), (2L, "evalB"),
      (3L, "evalA"), (3L, "evalB")), s"got $got")
    assert(got((1L, "evalA")) == 1L && got((2L, "evalB")) == 1L)
    assert(got((3L, "evalA")) == 1L && got((3L, "evalB")) == 1L)
  }

  test("gram count is length - n + 1 and hashes are deterministic") {
    import spark.implicits._
    val df = Seq((1L, words(13, "w")), (2L, words(12, "w"))).toDF("doc_id", "text")
    val g = df.select(col("doc_id"),
      size(Decontaminate.gramHashes(col("text"), 13)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(g(1L) == 1 && g(2L) == 0)
  }

  test("bench gram table is broadcast (no corpus-side shuffle before the join)") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, words(20, s"d$i"))).toDF("doc_id", "text")
    val bench = Seq((0L, words(20, "b"))).toDF("bench_id", "text")
    val plan = Decontaminate.contaminated(docs, bench)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastExchange"), s"bench grams must broadcast:\n$plan")
  }

  test("over-threshold eval set degrades to a shuffle join with identical verdicts") {
    import spark.implicits._
    val docs = (0 until 20).map(i => (i.toLong, words(20, s"d$i"))).toDF("doc_id", "text")
    val bench = Seq((0L, words(40, "d3"))).toDF("bench_id", "text") // 28 grams > 2
    val gated = Decontaminate.contaminated(docs, bench, maxBroadcastGrams = 2L)
    val plan = gated.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastHashJoin"),
      s"an over-threshold eval set must not force a broadcast:\n$plan")
    val expect = Decontaminate.contaminated(docs, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = gated.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "gated and broadcast paths must agree")
  }

  test("bloom-gated decontamination returns exactly contaminated's verdicts") {
    import spark.implicits._
    val evalText = words(20, "e")
    val leaked = words(5, "x") + " " + evalText.split(" ").slice(3, 16).mkString(" ")
    val docs = Seq(
      (1L, words(30, "c")), (2L, leaked), (3L, words(5, "s")), (4L, evalText))
      .toDF("doc_id", "text")
    val bench = Seq((100L, evalText)).toDF("bench_id", "text")
    val bloom = Decontaminate.benchBloom(bench, expectedItems = 64)
    val gated = Decontaminate.contaminatedBloomGated(docs, bench, bloom).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val plain = Decontaminate.contaminated(docs, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(gated == plain)
    assert(gated.contains((2L, 1L, true)) && gated.contains((3L, 0L, false)))
  }

  test("bench bloom has no false negatives: resubmitted eval text flags fully") {
    import spark.implicits._
    val bench = (1 to 50).map(i => (i.toLong, words(40, s"b$i"))).toDF("bench_id", "text")
    val bloom = Decontaminate.benchBloom(bench, expectedItems = 4096)
    val docs = (1 to 50).map(i => (i.toLong, words(40, s"b$i"))).toDF("doc_id", "text")
    val out = Decontaminate.contaminatedBloomGated(docs, bench, bloom)
    // every doc IS an eval doc: 40 words -> 28 grams, all must hit
    assert(out.where(col("n_hits") === 28 && col("contaminated")).count() == 50,
      "a bloom false negative dropped a contaminated gram")
  }

  test("latestPerKey keeps the newest row per key, ties to max tiebreak") {
    import spark.implicits._
    val df = Seq(
      ("u1", 10L, 1L, "old"),
      ("u1", 20L, 2L, "new"),
      ("u2", 5L, 3L, "only"),
      ("u3", 7L, 4L, "tie-lo"),
      ("u3", 7L, 5L, "tie-hi")).toDF("url", "ts", "id", "payload")
    val out = ExactDedup.latestPerKey(df, "url", "ts", "id").collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("payload")).toMap
    assert(out == Map("u1" -> "new", "u2" -> "only", "u3" -> "tie-hi"))
  }

  test("bestPerKey keeps the max-score row per key, ties to MIN tiebreak") {
    import spark.implicits._
    val df = Seq(
      ("g1", 3L, 1L, "low"),
      ("g1", 9L, 2L, "best"),
      ("g1", 9L, 7L, "best-later"), // same score, larger tiebreak loses
      ("g2", -4L, 3L, "only-negative"), // negation round-trips negatives
      ("g3", 0L, 4L, "zero")).toDF("sha", "q", "id", "payload")
    val out = ExactDedup.bestPerKey(df, "sha", "q", "id").collect()
      .map(r => r.getAs[String]("sha") -> r.getAs[String]("payload")).toMap
    assert(out == Map("g1" -> "best", "g2" -> "only-negative", "g3" -> "zero"))
  }
}
