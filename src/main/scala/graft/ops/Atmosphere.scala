package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** C5–C8 — atmospheric gaseous-attenuation correction
  * (ref atmosphere_correction.py:25-86; stage disabled in the reference
  * driver, main.py:31-32, but part of its surface).
  *
  * No UDF anywhere: the scalar pieces (C5 vapor density, C6 attenuation at
  * one frequency, C7 dB→transmission) are plain Column math, and the full
  * per-channel correction (C8) runs in the fused codegen'd
  * [[graft.functions.ItuCorrect]] kernel — a custom Catalyst Expression,
  * the one place a HOF/unrolled Column formulation cannot survive a real
  * 512–4096-channel axis (see the kernel's scaladoc).
  */
object Atmosphere {

  /** C5 — Buck saturation vapor pressure → water vapor density (g/m³)
    * (ref atmosphere_correction.py:25-45). `tempK` in Kelvin, `rh` in %.
    *
    * Reference quirk (SURVEY §7.5.3): the branch test is
    * `temperature + 273.15 >= 0` with temperature already in Kelvin, so the
    * below-freezing Buck variant and the `return 0` fallback are unreachable;
    * only the above-freezing formula is live, and that is what is
    * implemented. (C = T − 273.15.)
    */
  def waterVaporDensity(tempK: Column, rh: Column): Column = {
    val c = tempK - lit(273.15)
    val eS = lit((1.0007 + 3.46e-6) * 6.1121) * exp(lit(17.502) * c / (c + lit(240.97)))
    val e = (rh / lit(100.0)) * eS
    lit(216.7) * e / tempK
  }

  /** C6 — ITU-R P.676 gaseous attenuation, slant path, approximate method
    * (ref atmosphere_correction.py:47-57 calls `itur.models.itu676.
    * gaseous_attenuation_slant_path(..., mode='approx')`).
    *
    * Reimplemented from the published recommendation's approximate-method
    * lineage (Rec. ITU-R P.676 Annex 2 approximation, valid f < 57 GHz —
    * ample for the reference's ~1.4 GHz band): specific attenuations
    *
    *   γ_o = [7.27·r_t/(f² + 0.351·r_p²·r_t²) + 7.5/((f−57)² + 2.44·r_p²·r_t⁵)]
    *         · f²·r_p²·r_t² · 10⁻³                                  [dB/km]
    *   γ_w = [3.27e−2·r_t + 1.67e−3·ρ·r_t⁷/r_p + 7.7e−4·√f
    *          + 3.79/((f−22.235)² + 9.81·r_p²·r_t)
    *          + 11.73·r_t/((f−183.31)² + 11.85·r_p²·r_t)
    *          + 4.01·r_t/((f−325.153)² + 10.44·r_p²·r_t)] · f²·ρ·r_p·r_t · 10⁻⁴
    *
    * with r_p = p/1013, r_t = 288/T, equivalent heights h_o = 6 km and
    * h_w = 1.6·(1 + 3.0/((f−22.2)² + 5)) km (clear air), and slant path
    * A = (γ_o·h_o + γ_w·h_w)/sin(elev) for 5° ≤ elev ≤ 90°.
    *
    * @param fGHz element column (frequency in GHz) — bind inside a transform
    * @return attenuation in dB for that frequency/row
    */
  def gaseousAttenuationDb(
      fGHz: Column, elevDeg: Column, rho: Column, pressure: Column, tempK: Column): Column = {
    val rp = pressure / lit(1013.0)
    val rt = lit(288.0) / tempK
    val f2 = fGHz * fGHz
    val gammaO = (lit(7.27) * rt / (f2 + lit(0.351) * rp * rp * rt * rt) +
      lit(7.5) / ((fGHz - lit(57.0)) * (fGHz - lit(57.0)) + lit(2.44) * rp * rp * pow(rt, 5))) *
      f2 * rp * rp * rt * rt * lit(1e-3)
    val gammaW = (lit(3.27e-2) * rt + lit(1.67e-3) * rho * pow(rt, 7) / rp +
      lit(7.7e-4) * sqrt(fGHz) +
      lit(3.79) / ((fGHz - lit(22.235)) * (fGHz - lit(22.235)) + lit(9.81) * rp * rp * rt) +
      lit(11.73) * rt / ((fGHz - lit(183.31)) * (fGHz - lit(183.31)) + lit(11.85) * rp * rp * rt) +
      lit(4.01) * rt / ((fGHz - lit(325.153)) * (fGHz - lit(325.153)) + lit(10.44) * rp * rp * rt)) *
      f2 * rho * rp * rt * lit(1e-4)
    val hO = lit(6.0)
    val hW = lit(1.6) * (lit(1.0) + lit(3.0) / ((fGHz - lit(22.2)) * (fGHz - lit(22.2)) + lit(5.0)))
    (gammaO * hO + gammaW * hW) / sin(radians(elevDeg))
  }

  /** C7 — dB → transmission: 10^(−g/10) (ref atmosphere_correction.py:55). */
  def dbToTransmission(gDb: Column): Column = pow(lit(10.0), -gDb / lit(10.0))

  /** C8 + composition — apply the inverse transmission per channel
    * (ref atmosphere_correction.py:59-86): per row, compute the per-channel
    * transmission over the (literal, header-derived) GHz axis from that row's
    * weather columns, then `DATA /= transmission` element-wise.
    */
  def correct(
      df: DataFrame,
      freqsGHz: Array[Double],
      dataCol: String = "DATA"): DataFrame = {
    // Per-row weather scalars stay Column expressions (computed once per
    // row, codegen'd); the per-channel ITU attenuation + division run in the
    // fused [[graft.functions.ItuCorrect]] kernel — one JIT-compiled loop
    // over the literal axis, valid at any channel width. (Every Column-level
    // alternative fails at a real 512–4096-channel axis: HOF lambdas
    // evaluate the ITU tree interpreted per element, and per-channel
    // unrolling blows up analysis/codegen — see the kernel's scaladoc for
    // measurements.) Same op order and libm calls as the Column
    // formulation; values agree to <= 1 ulp (Math.pow intrinsic variance),
    // absorbed by the oracles' 6-decimal rounding.
    val tempK = col("TAMBIENT") + lit(273.15)
    val rho = waterVaporDensity(tempK, col("HUMIDITY"))
    val rp = col("PRESSURE") / lit(1013.0)
    val rt = lit(288.0) / tempK
    val sinel = sin(radians(col("ELEVATIO")))
    df.withColumn(dataCol,
      graft.functions.AtmosphereKernels.ituCorrect(col(dataCol), freqsGHz, rho, rp, rt, sinel))
  }
}
