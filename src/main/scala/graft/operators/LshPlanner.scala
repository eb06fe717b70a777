package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MinHash-LSH parameter planner: given a signature budget (`nPerm`
  * permutations) and a target Jaccard threshold, choose the (bands,
  * rowsPerBand) factorisation whose collision curve best separates
  * pairs above the threshold from pairs below it.
  *
  * The machinery is the standard S-curve analysis (Leskovec, Rajaraman
  * & Ullman, "Mining of Massive Datasets" ch. 3; Indyk & Motwani 1998):
  * a pair with Jaccard similarity `s` lands in the same bucket of at
  * least one of `b` bands of `r` rows with probability
  * `1 - (1 - s^r)^b`. The curve's midpoint (P = 1/2) has the closed
  * form `(1 - 2^(-1/b))^(1/r)`, and the planner's quality measure is
  * the false-positive / false-negative mass on either side of the
  * target threshold under a uniform similarity prior — the integrals
  * ∫₀ᵗ P(s) ds and ∫ₜ¹ (1 - P(s)) ds (Simpson's rule; the prior is a
  * neutral default, callers with a measured pair-similarity histogram
  * should weight the integrand by it).
  *
  * Everything here is driver-side arithmetic over the O(d(nPerm))
  * divisor pairs — the planner CONFIGURES the distributed job
  * ([[Lsh.Config]]), it never touches data. The engine's default
  * (32 bands × 4 rows over 128 permutations, `Lsh.Config`) is the
  * planner's own pick for a 0.5 target: s50 = 0.38, i.e. catch
  * near-dups well below the 0.8-Jaccard web-dup convention — recall
  * over precision, because a missed duplicate is unrecoverable while a
  * false candidate costs one verify comparison.
  */
object LshPlanner {

  /** P(pair becomes an LSH candidate | Jaccard = s) for b bands × r rows. */
  def sCurve(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** The similarity at which the S-curve crosses 1/2 (exact closed form). */
  def threshold50(b: Int, r: Int): Double =
    math.pow(1.0 - math.pow(0.5, 1.0 / b), 1.0 / r)

  /** The MMDS rule-of-thumb midpoint (1/b)^(1/r) — kept for
    * cross-checking [[threshold50]]; the two agree within a few percent
    * everywhere the curve is usable. */
  def thresholdApprox(b: Int, r: Int): Double =
    math.pow(1.0 / b, 1.0 / r)

  /** (falsePositiveMass, falseNegativeMass) around `target` under a
    * uniform similarity prior: fp = ∫₀ᵗ P(s) ds (pairs below the
    * threshold that still become candidates — wasted verify work),
    * fn = ∫ₜ¹ (1 - P(s)) ds (true near-dups LSH never pairs up — lost
    * recall). Composite Simpson with `steps` panels per side. */
  def errorMass(
      b: Int,
      r: Int,
      target: Double,
      steps: Int = 2048): (Double, Double) = {
    require(target > 0.0 && target < 1.0, s"target must be in (0,1), got $target")
    def simpson(lo: Double, hi: Double, f: Double => Double): Double = {
      val n = steps
      val h = (hi - lo) / n
      var acc = f(lo) + f(hi)
      var i = 1
      while (i < n) {
        acc += f(lo + i * h) * (if (i % 2 == 1) 4.0 else 2.0)
        i += 1
      }
      acc * h / 3.0
    }
    val fp = simpson(0.0, target, s => sCurve(s, b, r))
    val fn = simpson(target, 1.0, s => 1.0 - sCurve(s, b, r))
    (fp, fn)
  }

  /** One candidate factorisation of the permutation budget. */
  final case class Plan(
      bands: Int,
      rowsPerBand: Int,
      s50: Double,
      fpMass: Double,
      fnMass: Double) {
    def cost(fpWeight: Double, fnWeight: Double): Double =
      fpWeight * fpMass + fnWeight * fnMass
    def toConfig(numHashes: Int, seed: Long = 0x5EEDL): Lsh.Config =
      Lsh.Config(numHashes = numHashes, bands = bands, rowsPerBand = rowsPerBand, seed = seed)
  }

  /** Every (b, r) with b*r == nPerm, ascending b. */
  def plans(nPerm: Int, target: Double): Seq[Plan] = {
    require(nPerm > 0, s"nPerm must be positive, got $nPerm")
    (1 to nPerm).filter(nPerm % _ == 0).map { b =>
      val r = nPerm / b
      val (fp, fn) = errorMass(b, r, target)
      Plan(b, r, threshold50(b, r), fp, fn)
    }
  }

  /** The factorisation minimising `fpWeight*fp + fnWeight*fn` at the
    * target threshold. Ties (exactly equal cost) break toward more
    * bands — the higher-recall side. */
  def pick(
      nPerm: Int,
      target: Double,
      fpWeight: Double = 1.0,
      fnWeight: Double = 1.0): Plan =
    plans(nPerm, target).minBy(p => (p.cost(fpWeight, fnWeight), -p.bands))

  /** The plan table as a DataFrame for reporting — (bands,
    * rows_per_band, s50) with s50 rounded to 6 places so the DuckDB
    * oracle (pow over the same divisor pairs) matches bit-for-bit.
    * The error-mass columns stay Scala-side: a 2048-term float sum has
    * no deterministic cross-engine ordering guarantee. */
  def planTable(spark: SparkSession, nPerm: Int): DataFrame = {
    import spark.implicits._
    plans(nPerm, target = 0.5)
      .map(p => (p.bands, p.rowsPerBand,
        BigDecimal(p.s50).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("bands", "rows_per_band", "s50")
  }
}
