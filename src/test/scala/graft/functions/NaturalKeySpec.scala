package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class NaturalKeySpec extends AnyFunSuite {

  private def sgn(i: Int): Int = Integer.signum(i)

  test("reference comparator semantics (ViewModels/MainViewModel.cs:942-982)") {
    // digit runs numeric
    assert(NaturalKey.compare("doc2.html", "doc10.html") < 0)
    assert(NaturalKey.compare("doc10.html", "doc2.html") > 0)
    // '.' before everything
    assert(NaturalKey.compare(".hidden", "ahidden") < 0)
    assert(NaturalKey.compare("a.b", "a b") < 0) // '.' < ' '
    // case-insensitive
    assert(NaturalKey.compare("ABC", "abd") < 0)
    assert(sgn(NaturalKey.compare("ABC", "abc")) == 0)
    // length tiebreak (prefix)
    assert(NaturalKey.compare("a", "ab") < 0)
    // numeric equal, then continue
    assert(NaturalKey.compare("a2x", "a2y") < 0)
    // big numbers beyond Long
    assert(NaturalKey.compare("n99999999999999999999998", "n99999999999999999999999") < 0)
    // digit run vs non-digit char: digits sort between chars <'0' and >'9'
    assert(NaturalKey.compare("a!", "a5") < 0)
    assert(NaturalKey.compare("a5", "a_") < 0) // '_' = 0x5F > '9'
  }

  private def randomUrlish(r: scala.util.Random): String = {
    val pieces = Seq(
      () => r.alphanumeric.filter(_.isLetter).take(1 + r.nextInt(5)).mkString.toLowerCase,
      () => r.nextInt(100000).toString, // no leading zeros
      () => ".", () => "/", () => "-",
      () => if (r.nextBoolean()) "HTML" else "é中")
    (0 until 1 + r.nextInt(8)).map(_ => pieces(r.nextInt(pieces.length))()).mkString
  }

  test("property: key() ordering matches comparator on url-like strings") {
    val r = new scala.util.Random(42)
    (0 until 3000).foreach { _ =>
      val a = randomUrlish(r); val b = randomUrlish(r)
      assert(
        sgn(NaturalKey.compare(a, b)) ==
          sgn(NaturalKey.compareKeys(NaturalKey.key(a), NaturalKey.key(b))),
        s"for [$a] vs [$b]")
    }
  }

  test("property: key() is a total order consistent with comparator sort") {
    val r = new scala.util.Random(7)
    val xs = Vector.fill(300)(randomUrlish(r))
    val byCmp = xs.sortWith((a, b) => NaturalKey.compare(a, b) < 0)
    val byKey = xs.sortWith((a, b) =>
      NaturalKey.compareKeys(NaturalKey.key(a), NaturalKey.key(b)) < 0)
    // orders agree up to comparator-equal runs
    byCmp.zip(byKey).foreach { case (a, b) =>
      assert(sgn(NaturalKey.compare(a, b)) == 0, s"order diverged at [$a] vs [$b]")
    }
  }

  test("Spark BinaryType min elects the natural-order-min url") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val urls = Seq("b/doc10.html", "b/doc2.html", "a/doc100.html", ".top")
    val got = urls.toDF("url")
      .agg(min(struct(graft.functions.gf.natural_sort_key(col("url")).as("nk"),
        col("url"))).as("m"))
      .select(col("m.url")).as[String].head()
    assert(got == ".top")
  }
}
