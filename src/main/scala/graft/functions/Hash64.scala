package graft.functions

/** 64-bit hashing primitives used by all signature functions.
  *
  * Built from public-domain constructions: the splitmix64 finalizer
  * (Steele, Lea, Flood — "Fast Splittable Pseudorandom Number Generators",
  * OOPSLA 2014; reference C code placed in the public domain) and FNV-1a.
  * These are speed-oriented, non-cryptographic hashes: fine for shingles,
  * MinHash permutations and LSH bucket ids; exact-duplicate identity uses
  * `sha2` (see graft.operators.ExactDedup), mirroring the reference's
  * algorithm-strength menu (`ViewModels/MainViewModel.cs:25-38`).
  */
object Hash64 {

  /** splitmix64 mixing step: a strong 64->64 bit finalizer. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-16 code units of s[from, until), splitmix-finalized. */
  def hashChars(s: CharSequence, from: Int, until: Int, seed: Long): Long = {
    var h = 0xCBF29CE484222325L ^ mix(seed)
    var i = from
    while (i < until) {
      h = (h ^ (s.charAt(i).toLong & 0xFFFFL)) * 0x100000001B3L
      i += 1
    }
    mix(h)
  }

  /** FNV-1a over raw bytes, splitmix-finalized. */
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    var h = 0xCBF29CE484222325L ^ mix(seed)
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i).toLong & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    mix(h)
  }

  /** Order-free combine is NOT wanted here: this combine is order-sensitive. */
  @inline def combine(a: Long, b: Long): Long =
    mix(a ^ (b * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L))

  /** Deterministic stream of constants for permutation families. */
  def constants(n: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](n)
    var s = mix(seed ^ 0x5851F42D4C957F2DL)
    var i = 0
    while (i < n) { s = mix(s + 0x9E3779B97F4A7C15L); out(i) = s; i += 1 }
    out
  }
}
