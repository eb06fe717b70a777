package graft.operators

/** Embedded snapshot of the MULTI-LABEL public suffixes (the ICANN
  * section of the public suffix list — publicsuffix.org; the list itself
  * is public, MPL-2.0). Only multi-label entries are carried: single-label
  * TLDs need no table (the two-label fallback already handles them), and
  * the rare 4-label entries (`pvt.k12.<state>.us`) are out of snapshot
  * scope, documented here.
  *
  * Why this exists ([[Splits.registeredDomain]] is the only consumer):
  * the bare "last two host labels" rule collapses every site under a
  * multi-label TLD into one pseudo-domain — `bbc.co.uk` and
  * `argos.co.uk` both become `co.uk`, which (a) fuses unrelated sites
  * onto one side of a leak-free train/test split, (b) lets one
  * blocklisted UK site block or unblock strangers, and (c) pools
  * domain-quality means across thousands of sites. Consulting the
  * suffix table first restores per-site granularity exactly where the
  * two-label rule breaks.
  *
  * The snapshot is deliberately static and versioned with the code: a
  * 100 TB curation run must be reproducible, so the suffix table is an
  * input pinned at build time, not a network fetch (zero-egress clusters
  * are the norm for training-data work). Lookups compile to an `InSet`
  * hash probe inside the same codegen'd projection as the rest of the
  * url parsing — no join, no shuffle, nothing to skew.
  */
object PublicSuffix {

  /** US states + DC: each `<state>.us` is a public suffix, and the
    * `k12/cc/lib.<state>.us` school/college/library zones are the
    * everyday THREE-label entries. */
  private val usStates: Seq[String] = Seq(
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy")

  /** Two-label public suffixes (`co.uk`-class): a registrable domain
    * under one of these carries THREE labels. */
  val twoLabel: Seq[String] = (Seq(
    // United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    // Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au", "wa.au",
    // Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "health.nz",
    "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz", "org.nz",
    "parliament.nz", "school.nz",
    // South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    // Brazil (common zones)
    "adv.br", "art.br", "com.br", "edu.br", "eng.br", "gov.br", "ind.br",
    "inf.br", "jus.br", "leg.br", "med.br", "mil.br", "mus.br", "net.br",
    "org.br", "rec.br", "srv.br", "tv.br",
    // China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    // India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    // South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    // Taiwan
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    // Hong Kong / Singapore / Malaysia
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    // Thailand / Indonesia / Philippines / Vietnam
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "ngo.ph", "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    // Turkey / Israel / Gulf / Egypt
    "av.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr", "gen.tr",
    "gov.tr", "info.tr", "k12.tr", "mil.tr", "name.tr", "net.tr",
    "org.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    // Sub-Saharan Africa
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "ac.tz", "co.tz", "go.tz", "info.tz", "me.tz", "mil.tz", "mobi.tz",
    "ne.tz", "or.tz", "sc.tz", "tv.tz",
    "com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh",
    // Eastern Europe
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl",
    "org.pl", "waw.pl",
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    "co.hu", "info.hu", "org.hu", "priv.hu",
    "com.ro", "firm.ro", "info.ro", "nom.ro", "org.ro", "rec.ro",
    "store.ro", "tm.ro",
    "asn.lv", "com.lv", "conf.lv", "edu.lv", "gov.lv", "id.lv",
    "mil.lv", "net.lv", "org.lv",
    "gov.lt",
    "com.ee", "edu.ee", "fie.ee", "gov.ee", "lib.ee", "med.ee",
    "org.ee", "pri.ee", "riik.ee",
    // Western Europe
    "ac.at", "co.at", "gv.at", "or.at", "priv.at",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "edu.it", "gov.it",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "dep.no", "herad.no", "kommune.no", "mil.no", "priv.no", "stat.no",
    "parti.se", "pp.se", "press.se", "tm.se",
    "com.is", "edu.is", "gov.is", "int.is", "net.is", "org.is",
    // Latin America
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar", "tur.ar",
    "gob.cl", "gov.cl", "mil.cl",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve", "net.ve",
    "org.ve", "web.ve",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
    "k12.ec", "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo",
    "org.bo", "tv.bo",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do",
    "org.do", "sld.do", "web.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    // Canada federal + Pakistan / Bangladesh
    "gc.ca",
    "com.pk", "edu.pk", "gob.pk", "gov.pk", "net.pk", "org.pk",
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "mil.bd", "net.bd", "org.bd")
    ++ usStates.map(s => s"$s.us")).distinct.sorted

  /** Three-label public suffixes: the US school / community-college /
    * library zones (`k12/cc/lib.<state>.us`) — a registrable domain
    * under one of these carries FOUR labels. */
  val threeLabel: Seq[String] =
    usStates.flatMap(s => Seq(s"k12.$s.us", s"cc.$s.us", s"lib.$s.us")).sorted

  /** `'a', 'b', …` — the snapshot as a SQL IN-list body, interpolated
    * into the DuckDB oracle mirrors so engine and oracle provably share
    * ONE table. */
  def sqlInList(entries: Seq[String]): String =
    entries.map(e => s"'$e'").mkString(", ")

  /** Shared oracle fragment: the registered-domain CASE over a `host`
    * column reference and its `parts = string_split(host, '.')` list
    * reference (1-based DuckDB indexing; out-of-range indexes yield NULL,
    * which makes the suffix membership tests fall through exactly like
    * the engine's empty-slice path). Mirrors [[Splits.registeredDomain]]
    * branch for branch. */
  def registeredDomainCaseSql(host: String, parts: String): String = {
    val last2 = s"$parts[len($parts)-1] || '.' || $parts[len($parts)]"
    val last3 = s"$parts[len($parts)-2] || '.' || " + last2
    val last4 = s"$parts[len($parts)-3] || '.' || " + last3
    s"""CASE
       |  WHEN len($parts) >= 4 AND lower($last3) IN (${sqlInList(threeLabel)})
       |    THEN $last4
       |  WHEN len($parts) = 3 AND lower($last3) IN (${sqlInList(threeLabel)})
       |    THEN NULL
       |  WHEN len($parts) >= 3 AND lower($last2) IN (${sqlInList(twoLabel)})
       |    THEN $last3
       |  WHEN len($parts) = 2 AND lower($host) IN (${sqlInList(twoLabel)})
       |    THEN NULL
       |  WHEN len($parts) <= 2 THEN $host
       |  ELSE $last2
       |END""".stripMargin
  }
}
