package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def docs(texts: Seq[String], parts: Int = 4) = {
    import spark.implicits._
    texts.toDF("text").repartition(parts)
  }

  private val corpus =
    (0 until 200).map(i => s"alpha beta w$i gamma ${"delta " * (i % 3)}token$i".trim)

  test("identical corpora read zero drift; totals and buckets are right") {
    val r = Drift.report(docs(corpus), docs(corpus)).collect().head
    assert(r.getAs[Long]("kl_ab_micro") == 0L)
    assert(r.getAs[Long]("kl_ba_micro") == 0L)
    assert(r.getAs[Long]("js2_micro") == 0L)
    assert(r.getAs[Long]("n_tokens_a") == r.getAs[Long]("n_tokens_b"))
    val nb = r.getAs[Long]("buckets_active")
    assert(nb > 0 && nb <= Drift.Buckets)
  }

  test("disjoint BUCKET distributions saturate at 2*ln(2); hashing smooths disjoint vocab") {
    // few distinct tokens → few buckets per side, no cross-side collision
    // (verified by the assert): the one case where JS must hit its bound
    val a = Seq.fill(300)("aquamarine")
    val b = Seq.fill(300)("burgundy")
    val r = Drift.report(docs(a), docs(b)).collect().head
    val js2 = r.getAs[Long]("js2_micro")
    val sat = math.round(2.0 * math.log(2.0) * 1e6) // 1,386,294
    assert(r.getAs[Long]("buckets_active") == 2L)
    assert(math.abs(js2 - sat) <= 2, s"js2=$js2 vs $sat")
    // and the smoothing property itself: large disjoint vocabs spread over
    // the SAME 256 buckets read far below saturation (hash-uniform mass)
    val bigA = (0 until 400).map(i => s"left$i only$i here$i")
    val bigB = (0 until 400).map(i => s"right$i other$i there$i")
    val r2 = Drift.report(docs(bigA), docs(bigB)).collect().head
    val js2big = r2.getAs[Long]("js2_micro")
    assert(js2big > 0 && js2big < sat / 2, s"js2big=$js2big")
  }

  test("a real shift lands strictly between 0 and saturation; swap symmetry") {
    val b = corpus.take(100) ++ (0 until 100).map(i => s"novel$i phrases$i")
    val r1 = Drift.report(docs(corpus), docs(b)).collect().head
    val js2 = r1.getAs[Long]("js2_micro")
    assert(js2 > 10000 && js2 < 1386294, s"js2=$js2")
    val r2 = Drift.report(docs(b), docs(corpus)).collect().head
    assert(r2.getAs[Long]("js2_micro") == js2)
    assert(r2.getAs[Long]("kl_ab_micro") == r1.getAs[Long]("kl_ba_micro"))
    assert(r2.getAs[Long]("kl_ba_micro") == r1.getAs[Long]("kl_ab_micro"))
  }

  test("empty-side alarm: the report row arrives with null divergences") {
    import spark.implicits._
    val dead = Seq.empty[String].toDF("text")
      .unionByName(Seq("", null.asInstanceOf[String]).toDF("text"))
    val r = Drift.report(docs(corpus), dead).collect()
    assert(r.length == 1, "one row even when a side died")
    assert(r.head.getAs[Long]("n_tokens_b") == 0L)
    assert(r.head.getAs[Long]("n_tokens_a") > 0L)
    assert(r.head.isNullAt(r.head.fieldIndex("kl_ab_micro")))
    assert(r.head.isNullAt(r.head.fieldIndex("js2_micro")))
    // both sides empty: nothing to report at all
    assert(Drift.report(dead, dead).collect().isEmpty)
  }

  test("reportBy: per-key grain, one-sided keys drop, matches the single-key report") {
    import spark.implicits._
    val a = Seq(("h1", "alpha beta gamma"), ("h1", "alpha beta"),
      ("h2", "delta epsilon"), ("h3", "only in a")).toDF("host", "text")
    val b = Seq(("h1", "alpha beta gamma"), ("h1", "alpha beta"),
      ("h2", "delta zeta eta theta"), ("h4", "only in b")).toDF("host", "text")
    val got = Drift.reportBy(a.repartition(3), b.repartition(2), "host")
      .collect().map(r => r.getAs[String]("host") -> r).toMap
    // h3/h4 are one-sided → dropped; h1 unchanged → zero; h2 drifted
    assert(got.keySet == Set("h1", "h2"))
    assert(got("h1").getAs[Long]("js2_micro") == 0L)
    assert(got("h2").getAs[Long]("js2_micro") > 0L)
    // per-key result equals the single-corpus report restricted to that key
    val h2solo = Drift.report(
      a.where(col("host") === "h2"), b.where(col("host") === "h2"))
      .collect().head
    assert(got("h2").getAs[Long]("js2_micro") ==
      h2solo.getAs[Long]("js2_micro"))
    assert(got("h2").getAs[Long]("n_tokens_b") == 4L)
  }

  test("partition invariance: integer micro-nat sums are order-free") {
    val b = corpus.drop(50) ++ Seq.fill(30)("extra padding words")
    val base = Drift.report(docs(corpus, 1), docs(b, 1)).collect().head
    for (parts <- Seq(3, 17, 32)) {
      val r = Drift.report(docs(corpus, parts), docs(b, parts)).collect().head
      assert(r.getAs[Long]("js2_micro") == base.getAs[Long]("js2_micro"),
        s"parts=$parts")
      assert(r.getAs[Long]("kl_ab_micro") == base.getAs[Long]("kl_ab_micro"))
    }
  }
}
