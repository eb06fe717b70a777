package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Config persistence (O29): the reference saves every query parameter
  * across sessions (`ViewModels/MainViewModel.cs:70-79, 350-387`); the
  * engine serializes DedupConfig as JSON beside its checkpoints so a resumed
  * run can prove it is resuming the same query (the config hash is also
  * stamped into every stage manifest).
  *
  * Hand-rolled (de)serialization: the offline sandbox has no JSON library
  * on the compile classpath beyond Spark's shaded ones, and the format is a
  * flat record.
  */
object ConfigIO {

  def toJson(c: DedupConfig): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"minLen":${c.minLen},"shingleK":${c.shingleK},"numHashes":${c.numHashes},""" +
      s""""bands":${c.bands},"rowsPerBand":${c.rowsPerBand},"seed":${c.seed},""" +
      s""""jaccardTau":${c.jaccardTau},"minSharedBands":${c.minSharedBands},""" +
      s""""hamMax":${c.hamMax},"minSubstr":${c.minSubstr},"anchorK":${c.anchorK},""" +
      s""""bucketCap":${c.bucketCap},"scope":${q(c.scope)},"algo":${q(c.algo)},""" +
      s""""enableNear":${c.enableNear},"enableSubstr":${c.enableSubstr},""" +
      s""""sourcePriority":${c.sourcePriority.map(q).mkString("[", ",", "]")},""" +
      s""""verifyExtract":${c.verifyExtract}}"""
  }

  private val num = """"(\w+)":(-?[\d.]+)""".r
  private val str = """"(\w+)":"((?:[^"\\]|\\.)*)"""".r
  private val bool = """"(\w+)":(true|false)""".r
  private val arr = """"sourcePriority":\[([^\]]*)\]""".r
  private val arrItem = """"((?:[^"\\]|\\.)*)"""".r

  def fromJson(json: String): DedupConfig = {
    // strip the array before scalar matching so its items can't be
    // mistaken for top-level string fields
    val priority = arr.findFirstMatchIn(json).map(_.group(1)) match {
      case Some(items) => arrItem.findAllMatchIn(items).map(
        _.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      case None => Nil
    }
    val scalars = arr.replaceAllIn(json, "")
    val ns = num.findAllMatchIn(scalars).map(m => m.group(1) -> m.group(2)).toMap
    val ss = str.findAllMatchIn(scalars).map(m =>
      m.group(1) -> m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")).toMap
    val bs = bool.findAllMatchIn(scalars).map(m => m.group(1) -> (m.group(2) == "true")).toMap
    val d = DedupConfig()
    DedupConfig(
      minLen = ns.get("minLen").map(_.toInt).getOrElse(d.minLen),
      shingleK = ns.get("shingleK").map(_.toInt).getOrElse(d.shingleK),
      numHashes = ns.get("numHashes").map(_.toInt).getOrElse(d.numHashes),
      bands = ns.get("bands").map(_.toInt).getOrElse(d.bands),
      rowsPerBand = ns.get("rowsPerBand").map(_.toInt).getOrElse(d.rowsPerBand),
      seed = ns.get("seed").map(_.toLong).getOrElse(d.seed),
      jaccardTau = ns.get("jaccardTau").map(_.toDouble).getOrElse(d.jaccardTau),
      minSharedBands = ns.get("minSharedBands").map(_.toInt).getOrElse(d.minSharedBands),
      hamMax = ns.get("hamMax").map(_.toInt).getOrElse(d.hamMax),
      minSubstr = ns.get("minSubstr").map(_.toInt).getOrElse(d.minSubstr),
      anchorK = ns.get("anchorK").map(_.toInt).getOrElse(d.anchorK),
      bucketCap = ns.get("bucketCap").map(_.toInt).getOrElse(d.bucketCap),
      scope = ss.getOrElse("scope", d.scope),
      algo = ss.getOrElse("algo", d.algo),
      enableNear = bs.getOrElse("enableNear", d.enableNear),
      enableSubstr = bs.getOrElse("enableSubstr", d.enableSubstr),
      sourcePriority = priority,
      verifyExtract = bs.getOrElse("verifyExtract", d.verifyExtract),
      runDir = None)
  }

  def save(c: DedupConfig, path: String): Unit =
    Files.write(Paths.get(path), toJson(c).getBytes(StandardCharsets.UTF_8))

  def load(path: String): DedupConfig =
    fromJson(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))

  /** Input validation (O30, `ViewModels/MainViewModel.cs:393-426, 507-515`):
    * reject source prefixes that nest or duplicate (a nested source would
    * double-count its pages). Case-insensitive prefix semantics like the
    * reference's `IsSubfolder`. */
  def validateSources(prefixes: Seq[String]): Unit = {
    val norm = prefixes.map(p => (if (p.endsWith("/")) p else p + "/").toLowerCase)
    norm.zipWithIndex.foreach { case (a, i) =>
      norm.zipWithIndex.foreach { case (b, j) =>
        if (i != j && a.startsWith(b)) {
          throw new IllegalArgumentException(
            s"source '${prefixes(i)}' is nested in or duplicates '${prefixes(j)}'")
        }
      }
    }
  }
}
