package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SetSimJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force truth: every pair (i<j) with round(J,6) ≥ tau. */
  private def brute(sets: Map[Long, Set[String]], tau: Double): Set[(Long, Long, Double)] =
    (for {
      (i, a) <- sets.toSeq; (j, b) <- sets.toSeq if i < j
      o = (a & b).size
      j6 = round6(o.toDouble / (a.size + b.size - o))
      if j6 >= tau
    } yield (i, j, j6)).toSet

  private def run(sets: Map[Long, Set[String]], tau: Double): Set[(Long, Long, Double)] = {
    import spark.implicits._
    val items = sets.toSeq.map { case (id, s) => (id, s.toSeq) }
      .toDF("item_id", "toks")
    SetSimJoin.similarPairs(items, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("exactness: prefix filter loses nothing vs brute force (two thresholds)") {
    // deterministic skewed vocab: token t_k appears in items with id % (k+2) == 0,
    // so low-k tokens are corpus-wide stopwords and high-k tokens are rare
    val sets = (0L until 120L).map { id =>
      id -> ((0 until 40).collect {
        case k if id % (k + 2) == 0 => s"t$k"
      }.toSet + s"self$id")
    }.toMap
    assert(run(sets, 0.8) == brute(sets, 0.8))
    val at6 = run(sets, 0.6)
    assert(at6 == brute(sets, 0.6))
    assert(at6.nonEmpty, "fixture produced no pairs — test is vacuous")
  }

  test("tau boundary at the IEEE ceil trap: |A|=4, |B|=5, J=0.8 exactly") {
    // ceil(5 * 0.8) must be 4, but 5*0.8 = 4.0000000000000002 in doubles —
    // a float ceil would compute 5, and the length filter
    // least >= ceil(tau * greatest) would drop this exact-boundary pair
    val sets = Map(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("a", "b", "c", "d", "e"))
    assert(run(sets, 0.8) == Set((1L, 2L, 0.8)))
  }

  test("keepEarliest: kept iff no tau-similar strictly-earlier item (chains drop both)") {
    import spark.implicits._
    // J(1,2)=5/6, J(2,3)=6/7 (both >= 0.8), J(1,3)=5/7 (< 0.8)
    val sets = Map(
      1L -> Set("a", "b", "c", "d", "e"),
      2L -> Set("a", "b", "c", "d", "e", "f"),
      3L -> Set("a", "b", "c", "d", "e", "f", "g"),
      9L -> Set("x", "y", "z"))
    val items = sets.toSeq.map { case (id, s) => (id, s.toSeq) }
      .toDF("item_id", "toks")
    val kept = SetSimJoin
      .keepEarliest(items, SetSimJoin.similarPairs(items, 0.8))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> false, 9L -> true))
  }

  test("multisetItems: weighted Jaccard exact vs brute force; repetition separates set-identical twins") {
    import spark.implicits._
    val bags = Map(
      1L -> Seq("a", "b", "c", "d", "e", "f", "g", "h"),
      2L -> Seq("a", "b", "c", "d", "e", "f", "g", "h", "a", "b"), // Σmin/Σmax = 8/10
      3L -> Seq("a", "a", "a", "b"),
      4L -> Seq("a", "b", "b", "b")) // set-J(3,4)=1.0 but weighted 2/6
    val items = bags.toSeq.toDF("item_id", "toks")
    val got = SetSimJoin
      .similarPairs(SetSimJoin.multisetItems(items), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def wj(a: Seq[String], b: Seq[String]): Double = {
      val ca = a.groupBy(identity).map { case (k, v) => k -> v.size }
      val cb = b.groupBy(identity).map { case (k, v) => k -> v.size }
      val keys = ca.keySet ++ cb.keySet
      val mn = keys.toSeq.map(k => math.min(ca.getOrElse(k, 0), cb.getOrElse(k, 0))).sum
      val mx = keys.toSeq.map(k => math.max(ca.getOrElse(k, 0), cb.getOrElse(k, 0))).sum
      round6(mn.toDouble / mx)
    }
    val want = (for {
      (i, a) <- bags.toSeq; (j, b) <- bags.toSeq if i < j
      v = wj(a, b) if v >= 0.8
    } yield (i, j, v)).toSet
    assert(got == want)
    // the tau-boundary twin survives; the set-identical (3,4) pair must NOT
    assert(want == Set((1L, 2L, 0.8)))
  }

  private def bruteCont(sets: Map[Long, Set[String]], tau: Double): Set[(Long, Long, Double)] =
    (for {
      (i, a) <- sets.toSeq; (j, b) <- sets.toSeq if i != j
      c6 = round6((a & b).size.toDouble / a.size)
      if c6 >= tau
    } yield (i, j, c6)).toSet

  test("containment: exact vs brute force; quote inside page found at cont=1, J tiny") {
    import spark.implicits._
    val sets = (0L until 80L).map { id =>
      id -> ((0 until 30).collect {
        case k if id % (k + 2) == 0 => s"t$k"
      }.toSet + s"self$id")
    }.toMap
    // plant: item 900 is a strict 3-token subset of item 0's set
    val withQuote = sets + (900L -> sets(0L).take(3))
    val items = withQuote.toSeq.map { case (i, s) => (i, s.toSeq) }.toDF("item_id", "toks")
    val got = SetSimJoin.containmentPairs(items, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == bruteCont(withQuote, 0.8))
    assert(got.contains((900L, 0L, 1.0)), "the planted quote must be found")
    // Jaccard at the same tau misses the quote (asymmetric by design)
    val jac = SetSimJoin.similarPairs(items, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 900L)) && !jac.contains((900L, 0L)))
  }

  /** Brute-force cross-table truth: every (probe, corpus) pair with
    * round(J,6) ≥ tau. */
  private def bruteAcross(
      p: Map[Long, Set[String]],
      c: Map[Long, Set[String]],
      tau: Double): Set[(Long, Long, Double)] =
    (for {
      (i, a) <- p.toSeq; (j, b) <- c.toSeq
      o = (a & b).size
      if a.nonEmpty && b.nonEmpty
      j6 = round6(o.toDouble / (a.size + b.size - o))
      if j6 >= tau
    } yield (i, j, j6)).toSet

  test("cross-table join: exact vs brute force, incl. probe-only tokens and shared ids") {
    import spark.implicits._
    // corpus with skewed vocab; probe = near-copies of some corpus items
    // (two junk tokens appended — tokens the corpus has NEVER seen, df 0),
    // plus genuinely novel items, plus an item REUSING a corpus id (the
    // R-S join must not treat id equality as identity)
    val corpus = (0L until 90L).map { id =>
      id -> ((0 until 35).collect {
        case k if id % (k + 2) == 0 => s"t$k"
      }.toSet + s"self$id")
    }.toMap
    val probe: Map[Long, Set[String]] =
      corpus.collect { case (id, s) if id % 6 == 0 =>
        (id + 1000L) -> (s ++ Set("zzznew1", "zzznew2"))
      } ++
        (0L until 10L).map(i => (2000L + i) -> Set(s"novel${i}a", s"novel${i}b")) +
        (3L -> corpus(4L)) // probe id 3 ≠ corpus item 3
    val pDf = probe.toSeq.map { case (i, s) => (i, s.toSeq) }.toDF("item_id", "toks")
    val cDf = corpus.toSeq.map { case (i, s) => (i, s.toSeq) }.toDF("item_id", "toks")
    val got = SetSimJoin.similarPairsAcross(pDf, cDf, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val truth = bruteAcross(probe, corpus, 0.8)
    assert(got == truth)
    assert(got.contains((3L, 4L, 1.0)), "exact copy under a different id must be found")
    assert(got.exists(_._1 >= 1000L), "planted near-copies must surface — vacuous otherwise")

    val novel = SetSimJoin.keepNovel(pDf, SetSimJoin.similarPairsAcross(pDf, cDf, 0.8))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val hitIds = truth.map(_._1)
    assert(novel == probe.keys.map(i => i -> !hitIds.contains(i)).toMap)
    assert(novel.exists(_._2) && novel.exists(!_._2), "both verdicts must occur")
  }

  test("cross-table tau boundary: |probe|=4 vs |corpus|=5 at J=0.8 exactly") {
    import spark.implicits._
    val pDf = Seq((1L, Seq("a", "b", "c", "d"))).toDF("item_id", "toks")
    val cDf = Seq((2L, Seq("a", "b", "c", "d", "e"))).toDF("item_id", "toks")
    val got = SetSimJoin.similarPairsAcross(pDf, cDf, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.8)))
  }

  test("empty and degenerate inputs") {
    import spark.implicits._
    val items = Seq(
      (1L, Seq.empty[String]), // empty token set: excluded, never a pair
      (2L, Seq("only")),
      (3L, Seq("only"))).toDF("item_id", "toks")
    val pairs = SetSimJoin.similarPairs(items, 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((2L, 3L, 1.0)))
    intercept[IllegalArgumentException] { SetSimJoin.similarPairs(items, 0.0) }
  }

  test("positional filter tightens candidates and loses no true pair") {
    import spark.implicits._
    // adversarial for the PLAIN prefix filter: every item carries 2
    // unique tokens (df 1 — they head the rare-first order, positions
    // 0-1) plus the same 14 common tokens, so each prefix (len 16,
    // tau 0.8 -> 4 tokens) ends with the 2 lowest common tokens at
    // positions 2-3. All C(40,2) pairs collide there, but overlap is 14
    // and J = 14/18 < 0.8 — none is true. The positional bound at
    // positions (2..3, 2..3) is 1 + min(13,12) = 13..14 < alpha = 15,
    // so the positional filter drops every one BEFORE verification.
    // Two appended identical items (shared tokens at position 0) must
    // survive it.
    val common = (0 until 14).map(k => s"c$k")
    val sets: Map[Long, Set[String]] =
      (0L until 40L).map { id =>
        id -> (common ++ Seq(s"u${id}a", s"u${id}b")).toSet
      }.toMap ++ Map(
        100L -> (common ++ Seq("twin1", "twin2")).toSet,
        101L -> (common ++ Seq("twin1", "twin2")).toSet)
    val items = sets.toSeq.map { case (i, s) => (i, s.toSeq) }
      .toDF("item_id", "toks")
    val loose = SetSimJoin
      .selfCandidates(items, 0.8, positional = false).count()
    val tight = SetSimJoin
      .selfCandidates(items, 0.8, positional = true).count()
    assert(tight < loose,
      s"positional filter must prune candidates: $tight !< $loose")
    // exactness: the verified pair set is the brute-force truth at two
    // thresholds (the identical twins are the only 0.8-pair)
    assert(run(sets, 0.8) == brute(sets, 0.8))
    assert(run(sets, 0.8).contains((100L, 101L, 1.0)))
    assert(run(sets, 0.5) == brute(sets, 0.5))
  }
}
