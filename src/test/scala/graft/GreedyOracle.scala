package graft

import graft.functions.{MinHashImpl, NaturalKey}
import graft.sources.Page

/** Sequential, single-threaded reimplementation of the reference's cluster
  * resolution semantics (`ViewModels/MainViewModel.cs:586-688, 694-781,
  * 996-1241`), scaled to the web predicates: docs scanned in natural url
  * order; the first still-unlabeled doc whose surviving candidate set is
  * non-empty becomes keep, the survivors delete; empty set ⇒ unique; docs
  * below minLen are ignored up front (strict `<`, `:603`).
  *
  * Duplicate predicate (the engine's "same shingle/signature config"):
  * exact text equality OR exact shingle-set Jaccard ≥ τ OR an exact common
  * substring of ≥ L chars. Emits the (seed, survivor) dup-pair list that the
  * recall gate measures the Spark pipeline against.
  */
object GreedyOracle {

  final case class Result(
      pairs: Vector[(String, String)],
      state: Map[String, String])

  def run(
      pages: Seq[Page],
      minLen: Int = 20,
      shingleK: Int = 5,
      seed: Long = 42L,
      tau: Double = 0.8,
      minSubstr: Int = 200): Result = {

    val ordered = pages.sortWith((a, b) => NaturalKey.compare(a.url, b.url) < 0).toArray
    val n = ordered.length
    val state = new Array[String](n) // null = idle

    (0 until n).foreach { i =>
      if (ordered(i).text.length < minLen) state(i) = "ignored"
    }

    // precompute shingle sets once (the reference's memoized lazy hashing,
    // FileEntryViewModel.cs:98-101)
    val shingles = ordered.map(p =>
      if (p.text.length < minLen) null
      else MinHashImpl.shingleHashes(p.text, shingleK, seed).toSet)

    def isDup(i: Int, j: Int): Boolean = {
      if (ordered(i).text == ordered(j).text) return true
      val si = shingles(i); val sj = shingles(j)
      val inter = si.intersect(sj).size
      val union = si.size + sj.size - inter
      if (union > 0 && inter.toDouble / union >= tau) return true
      MinHashImpl.commonSubstringAtLeast(ordered(i).text, ordered(j).text, minSubstr)
    }

    val pairs = Vector.newBuilder[(String, String)]
    (0 until n).foreach { i =>
      if (state(i) == null) {
        val survivors = (0 until n).filter(j =>
          j != i && state(j) != "ignored" && state(j) != "unique" && isDup(i, j))
        if (survivors.nonEmpty) {
          state(i) = "keep"
          survivors.foreach { j =>
            state(j) = "delete"
            pairs += ((ordered(i).url, ordered(j).url))
          }
        } else {
          state(i) = "unique"
        }
      }
    }
    Result(
      pairs.result(),
      ordered.indices.map(i => ordered(i).url -> state(i)).toMap)
  }
}
