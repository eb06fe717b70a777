package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class EditSimJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Textbook DP Levenshtein — the spec's independent truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0) // d[i-1][j-1]
      d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(
          math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def brute(items: Map[Long, String], k: Int): Set[(Long, Long, Long)] =
    (for {
      (i, a) <- items.toSeq; (j, b) <- items.toSeq
      if i < j && a.nonEmpty && b.nonEmpty
      d = lev(a, b) if d <= k
    } yield (i, j, d.toLong)).toSet

  private def run(items: Map[Long, String], k: Int, q: Int = 2): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val df = items.toSeq.toDF("item_id", "s")
    EditSimJoin.editPairs(df, k, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  // deterministic URL-ish corpus with planted single-/double-edit copies
  private val urls: Map[Long, String] = {
    val base = (0L until 60L).map { i =>
      i -> s"https://s${i % 4}.example/d${i % 5}/doc$i.html"
    }
    val edited = (0L until 60L).collect {
      case i if i % 6 == 1 => (i + 1000L) -> ("x" + base(i.toInt)._2.drop(1)) // sub
      case i if i % 6 == 3 => (i + 2000L) -> base(i.toInt)._2.drop(1)         // del
      case i if i % 6 == 5 => (i + 3000L) -> (base(i.toInt)._2 + "zq")        // 2 ins
    }
    (base ++ edited).toMap
  }

  test("exactness: prefix+length filters lose nothing vs brute force (k=1,2; q=2,3)") {
    for (k <- Seq(1, 2); q <- Seq(2, 3)) {
      val got = run(urls, k, q)
      val want = brute(urls, k)
      assert(got == want, s"k=$k q=$q")
      assert(want.nonEmpty, s"vacuous fixture at k=$k")
    }
    // the k=2 set strictly contains the k=1 set (the double-edit plants)
    assert(brute(urls, 2).size > brute(urls, 1).size)
  }

  test("boundary: dist == k kept, k+1 dropped; dist values are exact") {
    val items = Map(
      1L -> "abcdef",
      2L -> "abcxef",   // 1 sub
      3L -> "abXYef",   // 2 subs from 1
      4L -> "abXYZQ")   // 2 subs from 3; 4 from 1 and 2
    assert(run(items, 2) == Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 2L), (3L, 4L, 2L)))
  }

  test("short keys: padding keeps single-char and sub-q strings joinable") {
    val items = Map(1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "ba", 5L -> "zzz")
    assert(run(items, 1) == brute(items, 1))
    assert(brute(items, 1).contains((1L, 2L, 1L)), "sanity: 'a'~'b' at ed 1")
  }

  test("empty strings are excluded by contract; nulls tolerated") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, ""), (3L, null.asInstanceOf[String]), (4L, "abd"))
      .toDF("item_id", "s")
    val got = EditSimJoin.editPairs(df, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L)))
  }

  test("candidates are a superset of true pairs and pruned vs the all-pairs square") {
    val cand = {
      import spark.implicits._
      val df = urls.toSeq.toDF("item_id", "s")
      EditSimJoin.candidates(df, 2, 2, "item_id", "s").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val want = brute(urls, 2).map { case (a, b, _) => (a, b) }
    assert(want.subsetOf(cand))
    val n = urls.size
    assert(cand.size < n.toLong * (n - 1) / 2, "prefix filter pruned nothing")
  }

  test("gram multiset identity: occurrence tokens make set-intersect equal multiset overlap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "aaab" vs "aabb": bigrams (padded q=2) differ but shared 'aa' counts once vs twice
    val df = Seq((1L, "aaab"), (2L, "aabb")).toDF("item_id", "s")
      .select(col("item_id"), EditSimJoin.gramTokens(col("s"), 2).as("ts"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L).size == m(1L).distinct.size, "occurrence tokens must be distinct")
    val shared = m(1L).toSet intersect m(2L).toSet
    // padded: ^Aa | aa aa ab b^B  vs  ^Aa | aa ab bb b^B — multiset overlap:
    // ^Aa(1) + aa(min 2,1 = 1) + ab(1) + b^B(1) = 4
    assert(shared.size == 4)
  }
}
