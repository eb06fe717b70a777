package graft

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("config json round trip preserves every field") {
    val c = DedupConfig(
      minLen = 30, shingleK = 7, numHashes = 64, bands = 16, rowsPerBand = 4,
      seed = 7L, jaccardTau = 0.75, estJPrefilter = 0.5, hamMax = 5,
      minSubstr = 150, anchorK = 40, bucketCap = 32, scope = "same_host",
      verifyExtract = true)
    val back = ConfigIO.fromJson(ConfigIO.toJson(c))
    assert(back == c.copy(runDir = None))
  }

  test("config hash changes when any parameter changes") {
    val base = DedupConfig()
    assert(base.hash == DedupConfig().hash)
    assert(base.hash != base.copy(shingleK = 6).hash)
    assert(base.hash != base.copy(jaccardTau = 0.81).hash)
  }

  test("save/load file round trip") {
    val p = java.nio.file.Files.createTempFile("graft_cfg", ".json").toString
    val c = DedupConfig(scope = "different_host", bucketCap = 99)
    ConfigIO.save(c, p)
    assert(ConfigIO.load(p) == c)
  }

  test("source validation rejects nested and duplicate prefixes") {
    ConfigIO.validateSources(Seq("https://a.com/x", "https://a.com/y", "https://b.com"))
    intercept[IllegalArgumentException] {
      ConfigIO.validateSources(Seq("https://a.com/x", "https://a.com/x/sub"))
    }
    intercept[IllegalArgumentException] {
      ConfigIO.validateSources(Seq("https://a.com/x", "HTTPS://A.COM/x/"))
    }
  }
}
