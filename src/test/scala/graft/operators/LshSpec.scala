package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.gf

class LshSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val cfg = Lsh.Config()

  private def docsFrame(texts: Seq[(String, String)]) = {
    import spark.implicits._
    Lsh.withSignatures(
      texts.toDF("url", "text").withColumn("nk", gf.natural_sort_key(col("url"))),
      cfg)
  }

  private def randomDoc(r: scala.util.Random, n: Int): String =
    Seq.fill(n)(s"w${r.nextInt(500)}").mkString(" ")

  test("near-dup pairs found, random pairs not; verified jaccard is exact") {
    val r = new scala.util.Random(42)
    val base = randomDoc(r, 200)
    val toks = base.split(' '); toks(3) = "edited"; toks(77) = "words"
    val near = toks.mkString(" ")
    val docs = docsFrame(Seq(
      ("u1", base), ("u2", near), ("u3", randomDoc(r, 200)), ("u4", randomDoc(r, 150))))
    val cands = Lsh.candidatePairs(spark, docs, cfg)
    val edges = Lsh.verifiedEdges(cands, docs, cfg, tau = 0.8)
      .select("src", "dst").collect().map(x => (x.getString(0), x.getString(1)))
    assert(edges.toSet == Set(("u1", "u2")))
  }

  test("identical texts pair via same-sig star edges (linear, not quadratic)") {
    val r = new scala.util.Random(1)
    val t = randomDoc(r, 100)
    val many = (0 until 50).map(i => (f"u$i%03d", t))
    val docs = docsFrame(many)
    val cands = Lsh.candidatePairs(spark, docs, cfg)
    val stars = cands.where(col("same_sig")).count()
    val cross = cands.where(!col("same_sig")).count()
    assert(cross == 0)
    assert(stars == 49, s"expected 49 star edges, got $stars") // one per non-first member
    // all connect to the natural-order first member
    assert(cands.where(col("src") =!= "u000").count() == 0)
  }

  test("bucket cap bounds cross-sig pairs and reports drops") {
    val r = new scala.util.Random(2)
    // one hot bucket: same leading shingles force shared bands is hard to
    // guarantee; instead use a tiny cap against moderately-similar docs
    val base = randomDoc(r, 300)
    val variants = (0 until 30).map { i =>
      val toks = base.split(' ')
      toks(i) = s"v$i" // one distinct edit each → high mutual similarity
      (f"u$i%03d", toks.mkString(" "))
    }
    val smallCap = cfg.copy(bucketCap = 8)
    val docs = docsFrame(variants)
    val cands = Lsh.candidatePairs(spark, docs, smallCap)
    val nonStar = cands.where(!col("same_sig"))
    // with 30 distinct sigs in (mostly) shared buckets, pairs per bucket are
    // bounded by 8*7/2 = 28; across bands the distinct union stays well
    // below the uncapped 30*29/2 = 435
    val n = nonStar.count()
    assert(n > 0 && n < 435, s"pairs=$n")
    assert(nonStar.where(col("dropped") > 0).count() > 0, "drops must be reported")
  }

  test("est_jaccard prefilter keeps verification off dissimilar candidates") {
    val r = new scala.util.Random(3)
    val a = randomDoc(r, 200)
    val b = randomDoc(r, 200)
    val docs = docsFrame(Seq(("a", a), ("b", b)))
    // force-candidate the pair and verify: exact jaccard ≈ 0 → no edge
    import spark.implicits._
    val cands = Seq(("a", "b", false, 0L)).toDF("src", "dst", "same_sig", "dropped")
    assert(Lsh.verifiedEdges(cands, docs, cfg, tau = 0.8).count() == 0)
  }
}
