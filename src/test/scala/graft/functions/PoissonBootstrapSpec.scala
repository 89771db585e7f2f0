package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins a43's truncated-Poisson(1) sampler contract WITHOUT Spark:
  *
  *  1. the inverse-CDF threshold literals baked into BOTH engines' query
  *     text equal c_k = e⁻¹·Σ_{i≤k} 1/i! recomputed here with the same
  *     IEEE operation sequence (a typo'd literal would silently bias
  *     every replicate identically in both engines — the oracle compare
  *     CANNOT catch it, only this recomputation can);
  *  2. weights simulated through [[Det.fracHost]] with the same
  *     thresholds have mean ≈ 1 and mass ≈ Poisson(1) per class — the
  *     a41 treatment for the bootstrap's randomness source.
  */
class PoissonBootstrapSpec extends AnyFunSuite {

  // c_k = e⁻¹·Σ_{i≤k} 1/i!, accumulated exactly as the literals were
  // derived: float division by the exact integer factorial, then +=
  private val cdf: Seq[Double] = {
    val e = math.exp(-1.0)
    var fact = 1L
    var tot = 0.0
    (0 to 5).map { k =>
      if (k > 0) fact *= k
      tot += e / fact.toDouble
      tot
    }
  }

  private def weight(u: Double): Int = {
    val i = cdf.indexWhere(u < _)
    if (i < 0) 6 else i
  }

  test("oracle SQL thresholds are the recomputed CDF, bit-for-bit") {
    val sql = graft.SparkEntry.oracleSql("a43_bootstrap_ci")
    val lits = raw"WHEN u < (0\.\d+) THEN (\d)".r
      .findAllMatchIn(sql).map(m => m.group(1).toDouble -> m.group(2).toInt)
      .toSeq
    assert(lits.map(_._2) == (0 to 5), "six CASE arms in order")
    lits.zip(cdf).foreach { case ((parsed, k), expected) =>
      assert(parsed == expected, s"threshold c_$k drifted from e⁻¹·Σ 1/i!")
    }
  }

  test("keyed-LCG truncated-Poisson weights: mean ≈ 1, Poisson(1) mass") {
    // the a43 draw shape: one uniform per (row, replicate) slot
    val n = 100000
    val ws = (0 until n).map(i => weight(Det.fracHost(i.toLong, 53L)))
    val mean = ws.sum.toDouble / n
    // truncation folds tail mass 5.9e-4 into w=6 (raises the mean by
    // ~2e-4); the LCG's own uniformity is the dominant error term here
    assert(math.abs(mean - 1.0) < 0.02, s"weight mean $mean")
    assert(ws.max <= 6 && ws.min >= 0)
    val p0 = ws.count(_ == 0).toDouble / n
    val p1 = ws.count(_ == 1).toDouble / n
    assert(math.abs(p0 - math.exp(-1.0)) < 0.01, s"P(w=0) = $p0")
    assert(math.abs(p1 - math.exp(-1.0)) < 0.01, s"P(w=1) = $p1")
  }
}
