package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def md5Prefix3(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(2).map(b => f"$b%02x").mkString.take(3)
  }

  test("bigram buckets: adjacent pairs, md5-prefix keys, degenerate docs empty") {
    import spark.implicits._
    val out = Seq("alpha beta gamma", "solo", "", "A  b")
      .toDF("text")
      .select(Dsir.bigramBuckets(col("text")).as("b"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq(md5Prefix3("alpha beta"), md5Prefix3("beta gamma")))
    assert(out(1).isEmpty && out(2).isEmpty)
    // lowercased, multi-space split
    assert(out(3) == Seq(md5Prefix3("a b")))
  }

  test("weight table: total over the 4096-bucket space; smoothing constant on unseen buckets") {
    import spark.implicits._
    val target = Seq("physics physics lab").toDF("text") // 2 bigrams
    val raw = Seq("physics physics lab", "cat dog fish").toDF("text") // 4
    val w = Dsir.weights(target, raw)
    assert(w.count() == 4096L)
    // a bucket unseen in both slices carries the ct=cr=0 weight
    // round(1e6 * (ln(tr+V) − ln(tt+V))) with tt=2, tr=4, V=4096
    val expectUnseen = math.round(
      (math.log(4 + 4096.0) - math.log(2 + 4096.0)) * 1000000L)
    val seen = Set("physics physics", "physics lab", "cat dog", "dog fish")
      .map(md5Prefix3)
    val unseenRows = w.collect()
      .filter(r => !seen.contains(r.getString(0))).map(_.getLong(1)).toSet
    assert(unseenRows == Set(expectUnseen))
    // the target-only... (none here) — a bucket in both: ct=1, cr=1
    val both = w.where(col("bucket") === md5Prefix3("physics lab"))
      .collect()(0).getLong(1)
    val expectBoth = math.round((math.log(2.0) - math.log(2 + 4096.0) -
      math.log(2.0) + math.log(4 + 4096.0)) * 1000000L)
    assert(both == expectBoth)
  }

  test("score: target-vocab docs outweigh raw docs; held-out lookalikes surface") {
    import spark.implicits._
    // Laplace smoothing over the 4096-bucket space means a toy-sized
    // target mass drives EVERY weight negative (the +V denominator
    // dominates ln((ct+1)/(tt+V))); a discriminative fixture needs the
    // realistic proportion — a repeated-phrase target slice inside a much
    // larger raw corpus, exactly DSIR's intended regime
    val phrase = "quantum flux lattice readout"
    val corpus = ((0 until 300).map(i =>
      (i.toLong, s"common filler text number $i plus tail")) ++
      Seq((1000L, Seq.fill(40)(phrase).mkString(" ")), // the target slice
        (1001L, Seq.fill(10)(phrase).mkString(" ")), // held-out lookalike
        (1002L, ""))) // feature-free
      .toDF("doc_id", "text")
    val target = corpus.where(col("doc_id") === 1000L)
    val scored = Dsir.score(corpus, Dsir.weights(target, corpus))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(scored(1001L)._3, "held-out target lookalike must be pred_target")
    assert(scored(1002L) == ((0L, 0L, false)))
    val rawWeights = (0 until 300).map(i => scored(i.toLong))
    assert(rawWeights.forall(_._2 < scored(1001L)._2),
      "every raw doc must weigh below the target lookalike")
    assert(rawWeights.forall(!_._3),
      "filler docs must not be pred_target")
    // rerun bit-identical (integer arithmetic end to end)
    val again = Dsir.score(corpus, Dsir.weights(target, corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == scored.map { case (k, v) => k -> v._2 })
    assert(scored.size == 303, "one output row per doc")
  }
}
