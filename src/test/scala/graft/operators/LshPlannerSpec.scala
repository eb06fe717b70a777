package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class LshPlannerSpec extends AnyFunSuite {

  test("threshold50 is the exact S-curve midpoint") {
    for ((b, r) <- Seq((32, 4), (16, 8), (8, 16), (20, 5))) {
      val t = LshPlanner.threshold50(b, r)
      assert(math.abs(LshPlanner.sCurve(t, b, r) - 0.5) < 1e-12)
    }
  }

  test("the MMDS approximation tracks the exact midpoint") {
    for ((b, r) <- Seq((32, 4), (16, 8), (8, 16))) {
      val exact = LshPlanner.threshold50(b, r)
      val approx = LshPlanner.thresholdApprox(b, r)
      assert(math.abs(exact - approx) / exact < 0.15)
    }
  }

  test("sCurve is monotone in s and spans (0,1)") {
    val ps = (0 to 100).map(i => LshPlanner.sCurve(i / 100.0, 32, 4))
    assert(ps.head == 0.0 && math.abs(ps.last - 1.0) < 1e-12)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
  }

  test("error masses move in opposite directions with band count") {
    // more bands → curve shifts left → more false positives, fewer misses
    val (fpLo, fnLo) = LshPlanner.errorMass(8, 16, target = 0.5)
    val (fpHi, fnHi) = LshPlanner.errorMass(32, 4, target = 0.5)
    assert(fpHi > fpLo && fnHi < fnLo)
  }

  test("pick recovers the engine default at the 0.5 target") {
    val p = LshPlanner.pick(128, target = 0.5)
    assert(p.bands == 32 && p.rowsPerBand == 4)
    val cfg = p.toConfig(numHashes = 128)
    assert(cfg.bands == 32 && cfg.rowsPerBand == 4 && cfg.numHashes == 128)
  }

  test("pick shifts to fewer bands for a high-precision 0.8 target") {
    val p = LshPlanner.pick(128, target = 0.8)
    assert(p.bands == 8 && p.rowsPerBand == 16)
  }

  test("weighting misses heavily shifts the pick back toward recall") {
    val p = LshPlanner.pick(128, target = 0.8, fpWeight = 1.0, fnWeight = 10.0)
    assert(p.bands > 8)
  }

  test("planTable emits one row per divisor pair") {
    val rows = LshPlanner.planTable(graft.TestSpark.spark, 128).collect()
    assert(rows.length == 8) // 128 = 2^7 → 8 divisors
    val byBands = rows.map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(byBands(32) == 0.3826) // rounded closed form
    assert(byBands(1) == 0.994599)
  }
}
