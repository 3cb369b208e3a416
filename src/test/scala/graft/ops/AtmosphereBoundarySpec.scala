package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 boundary-distance proof for the radio atmosphere family
  * (q_c5_vapor, q_c6_atten, q_c7_trans).
  *
  * These three queries compare `round(x, 6)` of values containing ONE
  * engine-native transcendental chain (exp / pow / sin — everything else
  * is IEEE-exact ±·×÷√ in identical operand order). Shared rounding of
  * independently computed transcendentals is not oracle-safe in general
  * (PLANS.md finding 37): if the two engines' libm differ by an ulp and
  * the true value sits within an ulp of a …×.5e-6 boundary, round-6 sends
  * them to different sides.
  *
  * For THESE queries, however, the transcendental inputs come from finite
  * modular grids that do not grow with scale factor (verified for the
  * driver corpora: l_quantity is integral 1..50 at sf0.001/0.01/0.1;
  * l_partkey % 60/30/100, l_orderkey % 85, l_suppkey % 200 are integer
  * residues by construction). This spec ENUMERATES every reachable input
  * combination, computes the exact double each engine targets, and proves
  * the distance to the nearest rounding boundary exceeds 1000 ulps — so a
  * few-ulp cross-libm divergence can never flip the rounded value, at any
  * scale factor. That turns "passes by luck of the data" into "cannot
  * flip on this data domain, proven by exhaustion".
  *
  * (q_pipeline_atmosphere is NOT coverable this way — its compared value
  * multiplies unbounded `DATA` into the transmission — so it instead runs
  * integer-exact end to end: shared exp/sin literal tables, fixed-point
  * 2ʲ·expNano(r) transmission, integer micro rounding — PLANS.md
  * finding 47.)
  */
class AtmosphereBoundarySpec extends AnyFunSuite {

  /** Distance from v to the nearest round-6 decision boundary (odd
    * multiples of 0.5e-6), in units of ulp(v). */
  private def boundaryUlps(v: Double): Double = {
    val scaled = v * 1e6
    val frac = scaled - math.floor(scaled)
    val distToHalf = math.abs(frac - 0.5) / 1e6 // back to value units
    distToHalf / Math.ulp(v)
  }

  private val MinUlps = 1000.0

  test("q_c5_vapor: every reachable Buck vapor density is >1000 ulps from a boundary") {
    // rho = 216.7 * ((rh/100) * (1.0007+3.46e-6)*6.1121 * exp(17.502*t/(t+240.97))) / (273.15+t)
    // rh = 20 + pk%60 in 20..79; t = l_quantity in 1..50 (integral).
    var worst = Double.MaxValue
    for (rhI <- 20 to 79; t <- 1 to 50) {
      val tk = 273.15 + t
      val c = tk - 273.15
      val eS = (1.0007 + 3.46e-6) * 6.1121 * math.exp(17.502 * c / (c + 240.97))
      val rho = 216.7 * ((rhI / 100.0) * eS) / tk
      worst = math.min(worst, boundaryUlps(rho))
    }
    assert(worst > MinUlps, s"closest c5 boundary distance: $worst ulps")
  }

  test("q_c6_atten: every reachable ITU attenuation is >1000 ulps from a boundary") {
    // f = (10+pk%30)/10; elev = 5+ok%85; rp = (900+sk%200)/1013;
    // rt = 288/(273.15+qty); rho = 7.5. 30*85*200*50 = 25.5M combos.
    var worst = Double.MaxValue
    var fI = 0
    while (fI < 30) {
      val f = (10.0 + fI) / 10.0
      val f2 = f * f
      var elevI = 0
      while (elevI < 85) {
        val sinel = math.sin(math.toRadians(5.0 + elevI))
        var rpI = 0
        while (rpI < 200) {
          val rp = (900.0 + rpI) / 1013.0
          var qty = 1
          while (qty <= 50) {
            val rt = 288.0 / (273.15 + qty)
            val rho = 7.5
            val gammaO = (7.27 * rt / (f2 + 0.351 * rp * rp * rt * rt) +
              7.5 / ((f - 57.0) * (f - 57.0) + 2.44 * rp * rp * math.pow(rt, 5))) *
              f2 * rp * rp * rt * rt * 1e-3
            val gammaW = (3.27e-2 * rt + 1.67e-3 * rho * math.pow(rt, 7) / rp +
              7.7e-4 * math.sqrt(f) +
              3.79 / ((f - 22.235) * (f - 22.235) + 9.81 * rp * rp * rt) +
              11.73 * rt / ((f - 183.31) * (f - 183.31) + 11.85 * rp * rp * rt) +
              4.01 * rt / ((f - 325.153) * (f - 325.153) + 10.44 * rp * rp * rt)) *
              f2 * rho * rp * rt * 1e-4
            val hW = 1.6 * (1.0 + 3.0 / ((f - 22.2) * (f - 22.2) + 5.0))
            val atten = (gammaO * 6.0 + gammaW * hW) / sinel
            val d = boundaryUlps(atten)
            if (d < worst) worst = d
            qty += 1
          }
          rpI += 1
        }
        elevI += 1
      }
      fI += 1
    }
    assert(worst > MinUlps, s"closest c6 boundary distance: $worst ulps")
  }

  test("q_c7_trans: every reachable transmission is >1000 ulps from a boundary") {
    // trans = 10^(-(pk%100 / 10)/10), pk%100 in 0..99.
    var worst = Double.MaxValue
    for (g <- 0 to 99) {
      val trans = math.pow(10.0, -(g / 10.0) / 10.0)
      // g = 0 gives exactly 1.0 — frac 0, maximally far from .5 boundaries.
      worst = math.min(worst, boundaryUlps(trans))
    }
    assert(worst > MinUlps, s"closest c7 boundary distance: $worst ulps")
  }
}
