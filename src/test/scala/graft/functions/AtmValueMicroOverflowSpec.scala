package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[AtmosphereKernels.atmValueMicro]]'s failure-mode parity with the
  * DuckDB oracle (ADVICE r12, medium): the oracle computes
  * `num = dc·2^j·er + 50000` in HUGEINT and only error()s past
  * [[AtmosphereKernels.NumBound]] (~9.2e23); the JVM kernel must therefore
  * NOT throw in the window where the int64 product overflows but the wide
  * num is still under the bound — it falls back to BigInt and returns the
  * same value_micro the oracle would — and MUST throw past the bound.
  */
class AtmValueMicroOverflowSpec extends AnyFunSuite {

  // Fixture-shaped atmosphere inputs; attenuation scales as base/sinel
  // exactly (the division is attenuationDbExact's final op), so solving
  // sinel = base/targetDb hits any target attenuation bit-independently
  // of the gamma terms.
  private val (data, rho, rp, rt, f) = (0.01, 7.5, 900.0 / 1013.0, 288.0 / 293.15, 22.0)
  private val base = AtmosphereKernels.attenuationDbExact(rho, rp, rt, 1.0, f)

  /** The oracle's HUGEINT num for these inputs, via the same public steps. */
  private def wideNum(sinel: Double): (BigInt, Long) = {
    val aa = AtmosphereKernels.attenuationDbExact(rho, rp, rt, sinel, f)
    val an = Math.round(aa * 1.0e9)
    val yn = ((BigInt(an) * FixedPointExp.Ln10Nano) / BigInt(10000000000L)).toLong
    val j = yn / FixedPointLog.Ln2Nano
    val r = yn - j * FixedPointLog.Ln2Nano
    val er = FixedPointExp.expNanoEval(r)
    val dc = Math.round(data * 100.0)
    ((BigInt(dc) << j.toInt) * er + 50000, j)
  }

  test("int64-overflow window: returns the oracle's HUGEINT-computed value, no throw") {
    val sinel = base / 120.0 // ~120 dB → j≈40: dc·2^j·er > Long.Max but ≤ NumBound
    val (num, j) = wideNum(sinel)
    assert(j <= 60)
    assert(num > BigInt(Long.MaxValue), s"fixture not in the overflow window (num=$num)")
    assert(num <= AtmosphereKernels.NumBound, s"fixture past the bound (num=$num)")
    assert(AtmosphereKernels.atmValueMicro(data, rho, rp, rt, sinel, f) ==
      (num / 100000).toLong)
  }

  test("past NumBound: aborts with the oracle's message") {
    val sinel = base / 165.0 // ~165 dB → j≈54: num > NumBound, still j ≤ 60
    val (num, j) = wideNum(sinel)
    assert(j <= 60)
    assert(num > AtmosphereKernels.NumBound, s"fixture not past the bound (num=$num)")
    val e = intercept[ArithmeticException](
      AtmosphereKernels.atmValueMicro(data, rho, rp, rt, sinel, f))
    assert(e.getMessage.contains("value_micro exceeds int64"))
  }

  test("negative overflow window: returns the oracle's truncated quotient, no throw") {
    // DuckDB's HUGEINT // truncates toward zero exactly like BigInt `/`
    // (-7 // 2 = -3), so a large-NEGATIVE num whose quotient still fits
    // int64 must return the same value — not throw, not wrap.
    val sinel = base / 120.0
    val (posNum, _) = wideNum(sinel)
    val num = -posNum + 100000 // mirror of the positive fixture, in-range
    assert(num < BigInt(Long.MinValue), s"fixture not in the negative window (num=$num)")
    assert((num / 100000).isValidLong)
    assert(AtmosphereKernels.atmValueMicro(-data, rho, rp, rt, sinel, f) ==
      ((-posNum + 100000) / 100000).toLong)
  }

  test("below int64: aborts like the oracle's CAST conversion error, never wraps") {
    // Oracle: num <= NumBound holds for any negative num, so it reaches
    // CAST(num // 100000 AS BIGINT) and raises out-of-range; the kernel
    // must abort too (silent BigInt.toLong wrapping returned garbage).
    val sinel = base / 165.0
    val (posNum, _) = wideNum(sinel)
    assert(-posNum + 100000 < BigInt(Long.MinValue) * 100000)
    val e = intercept[ArithmeticException](
      AtmosphereKernels.atmValueMicro(-data, rho, rp, rt, sinel, f))
    assert(e.getMessage.contains("value_micro below int64"))
  }

  test("fast path unchanged: in-range value agrees with the BigInt recomputation") {
    val sinel = base / 30.0 // ~30 dB — long fast path
    val (num, _) = wideNum(sinel)
    assert(num <= BigInt(Long.MaxValue))
    assert(AtmosphereKernels.atmValueMicro(data, rho, rp, rt, sinel, f) ==
      (num / 100000).toLong)
  }
}
