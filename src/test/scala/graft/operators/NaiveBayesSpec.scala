package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("train: per-word class counts are token occurrences, not doc counts") {
    import spark.implicits._
    val labeled = Seq(
      (1, "good good prose"),
      (1, "good prose"),
      (0, "spam spam spam prose")).toDF("label", "text")
    val m = NaiveBayes.train(labeled).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("good") == ((3L, 0L)))
    assert(m("prose") == ((2L, 1L)))
    assert(m("spam") == ((0L, 3L)))
    val t = NaiveBayes.totals(NaiveBayes.train(labeled)).collect()(0)
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == ((5L, 4L, 3L)))
  }

  test("score: separable vocab → positive ham, negative spam; integer micro-llr matches a reference fold") {
    import spark.implicits._
    val labeled = Seq(
      (1, "alpha beta gamma"),
      (1, "alpha beta"),
      (0, "zork quux zork")).toDF("label", "text")
    val model = NaiveBayes.train(labeled)
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "zork zork quux"),
      (3L, "alpha zork"),
      (4L, ""),
      (5L, "neverseen tokens here")).toDF("doc_id", "text")
    val out = NaiveBayes.score(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    // reference fold in plain scala: tp=5, tn=3, v=5
    val (tp, tn, v) = (5.0, 3.0, 5.0)
    val counts = Map(
      "alpha" -> (2L, 0L), "beta" -> (2L, 0L), "gamma" -> (1L, 0L),
      "zork" -> (0L, 2L), "quux" -> (0L, 1L))
    def llr(w: String): Long = {
      val (cp, cn) = counts.getOrElse(w, (0L, 0L))
      math.round((math.log(cp + 1) - math.log(tp + v) -
        math.log(cn + 1) + math.log(tn + v)) * 1000000L)
    }
    def ref(ws: String*): Long = ws.map(llr).sum
    assert(out(1L) == ((ref("alpha", "beta"), true)))
    assert(out(2L) == ((ref("zork", "zork", "quux"), false)))
    assert(out(3L) == ((ref("alpha", "zork"), ref("alpha", "zork") > 0)))
    assert(out(4L) == ((0L, false))) // token-free doc
    // unseen tokens get the cp=cn=0 smoothing score, here ln(8)-ln(10) < 0
    assert(out(5L) == ((3L * llr("__unseen__"), false)))
    assert(out(1L)._1 > 0 && out(2L)._1 < 0)
  }

  test("score is a pure integer function: reruns bit-identical") {
    import spark.implicits._
    val labeled = (0 until 40).map(i =>
      (i % 2, if (i % 2 == 1) s"word$i common alpha" else s"junk$i common zork"))
      .toDF("label", "text")
    val docs = (0 until 60).map(i => (i.toLong, s"common alpha word${i % 7} tail$i"))
      .toDF("doc_id", "text")
    val model = NaiveBayes.train(labeled)
    val a = NaiveBayes.score(docs, model).orderBy("doc_id").collect().map(_.getLong(1))
    val b = NaiveBayes.score(docs, model).orderBy("doc_id").collect().map(_.getLong(1))
    assert(a.sameElements(b))
  }
}
