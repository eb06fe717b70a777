package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.{MinHashImpl, TextExtract}

/** The input row shape from BASELINE.json `input_hint`:
  * a Common-Crawl-style web page. */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Ground-truth duplicate pair (kind ∈ exact | near | substring | skew). */
case class TruthPair(a: String, b: String, kind: String)

final case class Corpus(pages: Vector[Page], truth: Vector[TruthPair], shortUrls: Set[String])

/** Deterministic synthetic web-page corpus per FIXTURES.md §A (seed 42, no
  * external data, no wall clock). Class mix: 40% unique, 20% exact-dup
  * groups of 2–5, 20% near-dups at edit rates 1/3/8%, 10% substring dups
  * sharing a ≥200-char passage, 5% short (< minLen, `ignored` per the
  * strict `<` in `ViewModels/MainViewModel.cs:603`), 5% one boilerplate
  * repeated (hot-LSH-bucket "skew bomb").
  *
  * Every document is generated purely from (seed, doc slot), so the same
  * corpus can be materialized driver-side (tests, with truth pairs) or
  * distributed via mapPartitions over spark.range (bench at 200k docs)
  * with identical bytes.
  */
object SyntheticCorpus {

  val Seed = 42L
  val MinLen = 20
  val ShingleK = 5
  val JaccardTau = 0.8

  private val baseEpoch = 1767225600L // 2026-01-01T00:00:00Z, fixed (no wall clock)

  /** Deterministic pseudo-words incl. UTF-8 multi-byte chars. 50k words
    * (not the 1k first drafted in FIXTURES.md): with a 1k vocabulary the
    * background Jaccard between *unrelated* docs is high enough at ≥10⁶
    * docs that LSH bands collide quadratically (observed: 18M false
    * candidates at 1M docs) — a fixture artifact real web text does not
    * have. 50k words puts background shingle overlap near zero while
    * keeping generation cheap. */
  lazy val vocab: Array[String] = {
    val rnd = new scala.util.Random(Seed)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val accents = "éüöçñ中界テスト"
    Array.tabulate(50000) { i =>
      val len = 3 + rnd.nextInt(6)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        if (rnd.nextInt(20) == 0) sb.append(accents.charAt(rnd.nextInt(accents.length)))
        else sb.append(letters.charAt(rnd.nextInt(letters.length)))
      }
      // a few entity-escapable chars so the html round trip is non-trivial
      if (i % 97 == 0) sb.append("&x")
      if (i % 131 == 0) sb.append("<y'\"")
      sb.toString
    }
  }

  // ---- per-doc deterministic construction ----------------------------------

  /** Slot plan: maps a doc index to (class, group, member) — pure arithmetic,
    * identical on driver and executors. Layout for corpus size s:
    *   [0, u)            unique
    *   [u, u+e)          exact groups (consecutive, sizes cycling 2..5)
    *   [u+e, u+e+nd)     near groups (size 4: base + 3 clones @ 1%,3%,8%)
    *   [.., +sub)        substring pairs (size 2)
    *   [.., +short)      short docs
    *   [.., s)           skew: one text repeated
    */
  final case class Slot(cls: String, group: Int, member: Int, editPct: Int)

  final case class Layout(s: Int) {
    val nUnique = (s * 40) / 100
    val nExact = (s * 20) / 100
    val nNear = (s * 20) / 100
    val nSub = (s * 10) / 100
    val nShort = (s * 5) / 100
    val nSkew = s - nUnique - nExact - nNear - nSub - nShort

    def slot(i: Int): Slot = {
      if (i < nUnique) return Slot("unique", i, 0, 0)
      var j = i - nUnique
      if (j < nExact) {
        // group sizes cycle 2,3,4,5 → offsets via blocks of 14
        val block = j / 14
        val inBlock = j % 14
        val (g, m) =
          if (inBlock < 2) (block * 4, inBlock)
          else if (inBlock < 5) (block * 4 + 1, inBlock - 2)
          else if (inBlock < 9) (block * 4 + 2, inBlock - 5)
          else (block * 4 + 3, inBlock - 9)
        return Slot("exact", g, m, 0)
      }
      j -= nExact
      if (j < nNear) {
        val g = j / 4
        val m = j % 4
        val edit = m match { case 0 => 0; case 1 => 1; case 2 => 3; case 3 => 8 }
        return Slot("near", g, m, edit)
      }
      j -= nNear
      if (j < nSub) return Slot("substring", j / 2, j % 2, 0)
      j -= nSub
      if (j < nShort) return Slot("short", j, 0, 0)
      Slot("skew", 0, i, 0)
    }
  }

  private def rng(parts: Long*): scala.util.Random = {
    var h = Seed
    parts.foreach(p => h = graft.functions.Hash64.combine(h, p))
    new scala.util.Random(h)
  }

  private def words(r: scala.util.Random, n: Int): Vector[String] =
    Vector.fill(n)(vocab(r.nextInt(vocab.length)))

  private def baseText(cls: String, group: Int): String = {
    val r = rng(cls.hashCode.toLong, group.toLong, 1L)
    words(r, 50 + r.nextInt(351)).mkString(" ")
  }

  /** Apply ~pct% token substitutions (deterministic). */
  private def edit(text: String, pct: Int, group: Int, member: Int): String = {
    val toks = text.split(' ')
    val r = rng(0xED17L, group.toLong, member.toLong)
    val edits = math.max(1, toks.length * pct / 100)
    (0 until edits).foreach { _ =>
      toks(r.nextInt(toks.length)) = vocab(r.nextInt(vocab.length))
    }
    toks.mkString(" ")
  }

  /** The shared ≥200-char passage for substring group g. */
  private def passage(group: Int): String = {
    val r = rng(0x5B57L, group.toLong)
    var p = words(r, 40).mkString(" ")
    while (p.length < 220) p = p + " " + vocab(r.nextInt(vocab.length))
    p
  }

  def textFor(s: Int, i: Int): String = {
    val L = Layout(s)
    val sl = L.slot(i)
    sl.cls match {
      case "unique" => baseText("unique", sl.group)
      case "exact" => baseText("exact", sl.group)
      case "near" =>
        val base = baseText("near", sl.group)
        if (sl.member == 0) base else edit(base, sl.editPct, sl.group, sl.member)
      case "substring" =>
        val r = rng(0x50BL, sl.group.toLong, sl.member.toLong)
        val pre = words(r, 60 + r.nextInt(100)).mkString(" ")
        val post = words(r, 60 + r.nextInt(100)).mkString(" ")
        pre + " " + passage(sl.group) + " " + post
      case "short" =>
        val r = rng(0x5407L, sl.group.toLong)
        words(r, 1 + r.nextInt(2)).mkString(" ").take(MinLen - 1)
      case "skew" => baseText("skew", 0)
    }
  }

  /** urls exercise hosts (user-folder analog), dirs (folder analog) and
    * numeric natural-sort runs (doc2 vs doc10). */
  def urlFor(s: Int, i: Int): String = {
    val host = s"host${i % 7}.example"
    val dir = s"d${(i / 7) % 5}"
    s"https://$host/$dir/doc$i.html"
  }

  def pageFor(s: Int, i: Int): Page = {
    val text = textFor(s, i)
    val html =
      // NB: no text inside <title> — the extractor contract strips tags but
      // keeps all non-script/style text, so title text would (correctly)
      // surface in the extraction and break the round-trip invariant.
      ("<html><head><title></title><style>.a{x}</style></head><body>" +
        "<script>var x=1;</script><p>  " + TextExtract.escape(text) +
        "  </p></body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(urlFor(s, i), new Timestamp((baseEpoch + i) * 1000L), html, text, langFor(i))
  }

  private val langs = Array("en", "de", "fr")
  def langFor(i: Int): String = langs(i % 3)

  // ---- materialization ------------------------------------------------------

  /** Driver-side corpus with ground truth (test scale). Truth pairs:
    * exact/skew groups → all intra-group pairs; near groups → pairs whose
    * exact shingle-set Jaccard ≥ τ (recorded at generation so the recall
    * gate measures against real, not nominal, similarity); substring groups
    * → the planted pair. */
  def local(s: Int): Corpus = {
    val L = Layout(s)
    val pages = Vector.tabulate(s)(i => pageFor(s, i))
    val urlOf = Array.tabulate(s)(i => pages(i).url)
    val truth = Vector.newBuilder[TruthPair]

    // index docs by (cls, group)
    val byGroup = (0 until s).groupBy { i => val sl = L.slot(i); (sl.cls, sl.group) }
    byGroup.foreach { case ((cls, _), idxs) =>
      cls match {
        case "exact" | "skew" =>
          for (a <- idxs; b <- idxs if a < b)
            truth += TruthPair(urlOf(a), urlOf(b), if (cls == "skew") "skew" else "exact")
        case "near" =>
          for (a <- idxs; b <- idxs if a < b) {
            val j = MinHashImpl.exactJaccard(pages(a).text, pages(b).text, ShingleK, Seed)
            if (j >= JaccardTau) truth += TruthPair(urlOf(a), urlOf(b), "near")
          }
        case "substring" =>
          for (a <- idxs; b <- idxs if a < b)
            truth += TruthPair(urlOf(a), urlOf(b), "substring")
        case _ => ()
      }
    }
    val shortUrls = (0 until s).filter(i => L.slot(i).cls == "short").map(urlOf).toSet
    Corpus(pages, truth.result(), shortUrls)
  }

  /** Distributed materialization (bench scale): identical bytes to `local`,
    * generated inside executors from (s, id) only — no driver collect, no
    * shipping of document payloads through the driver. */
  def distributed(spark: SparkSession, s: Int, partitions: Int): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, s, 1, partitions).mapPartitions { it =>
      it.map(id => pageFor(s, id.toInt))
    }
  }
}
