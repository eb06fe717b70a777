package graft.functions

/** Natural ("explorer-style") total order over strings, as a
  * binary-comparable sort key.
  *
  * Semantics follow the reference comparator
  * (`ViewModels/MainViewModel.cs:942-982`):
  *   - `'.'` sorts before every other character;
  *   - runs of ASCII digits on both sides compare numerically
  *     (arbitrary precision);
  *   - otherwise characters compare case-insensitively by code unit;
  *   - when the common traversal exhausts one string, raw lengths decide.
  *
  * The comparator switches digit-vs-char mode per position, but a single
  * order-preserving byte encoding still exists because ASCII digits are a
  * contiguous code-point range: any non-digit char is either below '0' or
  * above '9', so digit *runs* order totally between those two char classes.
  *
  * Key layout, per token:
  *   0x01                      '.'
  *   0x03 <hi> <lo>            char with lowercase code unit < '0'
  *   0x04 <len:4BE> <digits>   digit run, leading zeros stripped
  *   0x05 <hi> <lo>            char with lowercase code unit > '9'
  * terminated by 0x00 <rawLength:4BE>, which encodes the final length
  * tiebreak (shorter raw string first when token streams tie).
  *
  * Documented deviation: the reference comparator is not a strict total
  * order when digit runs contain leading zeros (e.g. it reports
  * "a07" == "a7x"); this key is a strict refinement that agrees with the
  * comparator on all strings whose digit runs have no leading zeros
  * (the url domain used everywhere in this engine). Covered by
  * NaturalKeySpec property tests.
  *
  * Used for deterministic representative election: the cluster member with
  * the minimum key is `keep` — the Spark analog of "first in scan order
  * wins" (`ViewModels/MainViewModel.cs:877-882, 1226-1240`).
  */
object NaturalKey {

  /** Order-preserving binary key: unsigned-lexicographic compare of
    * key(a), key(b) == compare(a, b) on the no-leading-zero domain. */
  def key(s: String): Array[Byte] = {
    val n = s.length
    val out = new java.io.ByteArrayOutputStream(n * 2 + 8)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '.') {
        out.write(0x01)
        i += 1
      } else if (isAsciiDigit(c)) {
        var j = i
        while (j < n && isAsciiDigit(s.charAt(j))) j += 1
        var k = i
        while (k < j - 1 && s.charAt(k) == '0') k += 1 // strip leading zeros
        // all-zero run normalizes to the single digit '0'
        val len = j - k
        out.write(0x04)
        writeInt(out, len)
        var p = k
        while (p < j) { out.write(s.charAt(p)); p += 1 }
        i = j
      } else {
        val lc = Character.toLowerCase(c)
        out.write(if (lc < '0') 0x03 else 0x05)
        out.write((lc >>> 8) & 0xFF)
        out.write(lc & 0xFF)
        i += 1
      }
    }
    out.write(0x00)
    writeInt(out, n)
    out.toByteArray
  }

  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  /** Direct comparator with the reference's exact semantics; used by the
    * sequential test oracle and to property-test `key`. */
  def compare(a: String, b: String): Int = {
    var ai = 0; var bi = 0
    while (ai < a.length && bi < b.length) {
      val ca = a.charAt(ai); val cb = b.charAt(bi)
      if (ca == '.' && cb != '.') return -1
      if (cb == '.' && ca != '.') return 1
      if (isAsciiDigit(ca) && isAsciiDigit(cb)) {
        val sa = ai; val sb = bi
        while (ai < a.length && isAsciiDigit(a.charAt(ai))) ai += 1
        while (bi < b.length && isAsciiDigit(b.charAt(bi))) bi += 1
        val na = BigInt(a.substring(sa, ai))
        val nb = BigInt(b.substring(sb, bi))
        val cmp = na.compare(nb)
        if (cmp != 0) return cmp
      } else {
        val cmp = Character.toLowerCase(ca).compareTo(Character.toLowerCase(cb))
        if (cmp != 0) return cmp
        ai += 1; bi += 1
      }
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** Scan-order key with source priority: the reference's scan order is
    * source-folder *list order* first, natural name order second
    * (`ViewModels/MainViewModel.cs:68,539-557,877-882`), and that order
    * decides which cluster member is kept. Hosts earlier in `orderedHosts`
    * sort first; unlisted hosts rank after every listed one. The priority
    * index is prefixed as fixed-width hex (order-preserving: 0-9 < A-F in
    * ASCII), so the result is byte-comparable exactly like the plain key. */
  def sourcePriorityKey(
      url: org.apache.spark.sql.Column,
      orderedHosts: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val h = graft.operators.Scope.host(url)
    val idx = orderedHosts.zipWithIndex.foldRight(
      lit(orderedHosts.length): org.apache.spark.sql.Column) {
      case ((host, i), acc) => when(h === host, lit(i)).otherwise(acc)
    }
    concat(
      encode(lpad(hex(idx), 8, "0"), "UTF-8"),
      graft.functions.gf.natural_sort_key(url))
  }

  /** First 8 bytes of a natural key as an order-preserving signed long
    * (big-endian, zero-padded, sign-flipped for unsigned order): a compact
    * approximation of the natural order for the candidate-generation hot
    * path, where ORDER only decides pair orientation, star centers, and
    * cap membership — never representative election. Ties (keys sharing
    * their first 8 bytes) are broken by doc id in the consumer; full-key
    * order is used everywhere election semantics matter. */
  def prefix64(key: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < key.length) key(i) & 0xFFL else 0L)
      i += 1
    }
    v ^ Long.MinValue
  }

  /** Unsigned lexicographic byte-array compare (Spark BinaryType order). */
  def compareKeys(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val cmp = java.lang.Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
      if (cmp != 0) return cmp
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }
}
