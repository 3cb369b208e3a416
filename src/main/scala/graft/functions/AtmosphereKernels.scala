package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{array, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** C6+C7+C8 fused as ONE codegen'd kernel: per channel,
  * `DATA[i] / 10^(−A(f_i)/10)` with A the ITU-R P.676 approximate slant-path
  * attenuation (see [[graft.ops.Atmosphere.gaseousAttenuationDb]] for the
  * published-formula provenance).
  *
  * Why a custom Expression (SURVEY §7.4 revisited): the correction is
  * per-(row × channel) over a LITERAL frequency axis. Every Column-level
  * formulation fails at a real 512–4096-channel axis — a HOF lambda
  * (`transform`/`zip_with`) evaluates the whole ITU tree INTERPRETED per
  * element (measured 63 s for 128 ch × 100k rows at local[16]; hoisting the
  * per-row scalars still leaves 41 s), and unrolling per-channel expressions
  * only works for tiny axes (thousands of trees blow up analysis/codegen,
  * and an inlined Generate falls out of JIT compilation). This kernel is
  * one compact generated loop calling one static method — JIT-compiled,
  * O(channels) per row, any axis width.
  *
  * The per-row weather scalars (ρ, r_p, r_t, sin elev) stay Column
  * expressions computed once per row and passed in as children.
  */
case class ItuCorrect(
    data: Expression,
    freqs: Expression,
    rho: Expression,
    rp: Expression,
    rt: Expression,
    sinElev: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(data, freqs, rho, rp, rt, sinElev)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "itu_correct"

  /** Mirrors the unrolled Column form exactly: output length = axis length;
    * element i is null when DATA lacks it, DATA[i] is null (masked NaN), or
    * any weather scalar is null — the same propagation the per-channel
    * `element_at(DATA, i+1) / trans_i` expressions produce.
    */
  override def eval(input: InternalRow): Any = {
    val d = data.eval(input)
    val fq = freqs.eval(input)
    if (d == null || fq == null) return null
    val rhoV = rho.eval(input)
    val rpV = rp.eval(input)
    val rtV = rt.eval(input)
    val seV = sinElev.eval(input)
    val scalarsOk = rhoV != null && rpV != null && rtV != null && seV != null
    val da = d.asInstanceOf[ArrayData]
    val fa = fq.asInstanceOf[ArrayData]
    val n = fa.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (scalarsOk && i < da.numElements() && !da.isNullAt(i) && !fa.isNullAt(i)) {
        out(i) = da.getDouble(i) / AtmosphereKernels.transmission(
          fa.getDouble(i), rhoV.asInstanceOf[Double], rpV.asInstanceOf[Double],
          rtV.asInstanceOf[Double], seV.asInstanceOf[Double])
      } else {
        out(i) = null
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dG = data.genCode(ctx)
    val fG = freqs.genCode(ctx)
    val rhoG = rho.genCode(ctx)
    val rpG = rp.genCode(ctx)
    val rtG = rt.genCode(ctx)
    val seG = sinElev.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val arr = ctx.freshName("arr")
    val ok = ctx.freshName("scalarsOk")
    ev.copy(code = code"""
      ${dG.code}
      ${fG.code}
      ${rhoG.code}
      ${rpG.code}
      ${rtG.code}
      ${seG.code}
      boolean ${ev.isNull} = ${dG.isNull} || ${fG.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        final boolean $ok = !(${rhoG.isNull} || ${rpG.isNull} || ${rtG.isNull} || ${seG.isNull});
        final int $n = ${fG.value}.numElements();
        final Object[] $arr = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if ($ok && $i < ${dG.value}.numElements()
              && !${dG.value}.isNullAt($i) && !${fG.value}.isNullAt($i)) {
            $arr[$i] = ${dG.value}.getDouble($i) / graft.functions.AtmosphereKernels.transmission(
              ${fG.value}.getDouble($i), ${rhoG.value}, ${rpG.value}, ${rtG.value}, ${seG.value});
          } else {
            $arr[$i] = null;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      }
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ItuCorrect =
    copy(data = newChildren(0), freqs = newChildren(1), rho = newChildren(2),
      rp = newChildren(3), rt = newChildren(4), sinElev = newChildren(5))
}

/** q_pipeline_atmosphere's whole per-channel correction as ONE kernel call
  * (PLANS.md findings 45/47): data·10^(A/10) in exact integer micro units.
  * The double part ([[AtmosphereKernels.attenuationDbExact]]) uses only
  * ±·×÷ and IEEE-correctly-rounded sqrt, in the exact op order the DuckDB
  * oracle's alias chain spells — bit-identical `aa` by construction. The
  * integer part (Math.round lift, nano-nat bridge, 2ʲ·expNano(r) range
  * reduction, half-up micro division) is the same integer arithmetic the
  * oracle runs in BIGINT/HUGEINT. Inlined as Column trees this projection
  * was JIT-warmup-bimodal (3.5 s warm vs 20-40 s un-JIT'd first run) and
  * the decimal(38,0) steps ran on BigDecimal per row; the kernel is a
  * compact JIT-friendly method with long fast paths.
  *
  * Rounding windows (documented, not hidden): Math.round(x) vs DuckDB's
  * round(double) can disagree only within ~1 ulp of a .5 boundary — for
  * `an` (magnitude ≥ 1e5) that is a ≤1e-11 relative window, and for
  * `dc` the input is within 1 ulp of an integer (TPC-H centi-units), 0.5
  * away from any boundary. Same class of window the retired Column
  * `round(·, 0)` carried; empirically zero flips across all runs.
  *
  * Overflow: j > 60 (attenuation past 180 dB) or a 2ʲ·er product past
  * int64 throws — the oracle's error() CASEs abort the same inputs.
  */
case class AtmValueMicro(
    data: Expression,
    rho: Expression,
    rp: Expression,
    rt: Expression,
    sinElev: Expression,
    fGHz: Expression) extends Expression {

  override def children: Seq[Expression] =
    Seq(data, rho, rp, rt, sinElev, fGHz)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "atm_value_micro"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else AtmosphereKernels.atmValueMicro(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double],
      vs(4).asInstanceOf[Double], vs(5).asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val childCode = cs.map(_.code.toString).mkString("\n")
    val anyNull = cs.map(_.isNull).mkString(" || ")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.AtmosphereKernels.atmValueMicro(
          ${cs.map(_.value).mkString(", ")});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AtmValueMicro =
    copy(data = newChildren(0), rho = newChildren(1), rp = newChildren(2),
      rt = newChildren(3), sinElev = newChildren(4), fGHz = newChildren(5))
}

object AtmosphereKernels {

  /** [[AttenuationDb]]'s body — every op in the exact order the DuckDB
    * oracle's alias chain spells (rt2/rt4/rt5/rt7 multiplication steps,
    * left-associated sums/products); javac/JIT never fuse or reassociate
    * plain double ops, so the result is bit-identical to the oracle's.
    */
  def attenuationDbExact(
      rho: Double, rp: Double, rt: Double, sinel: Double, f: Double): Double = {
    val rt2 = rt * rt
    val rt4 = rt2 * rt2
    val rt5 = rt4 * rt
    val rt7 = (rt4 * rt2) * rt
    val f2 = f * f
    val go = (7.27 * rt / (f2 + 0.351 * rp * rp * rt * rt) +
      7.5 / ((f - 57.0) * (f - 57.0) + 2.44 * rp * rp * rt5)) *
      f2 * rp * rp * rt * rt * 1e-3
    val gw = (3.27e-2 * rt + 1.67e-3 * rho * rt7 / rp +
      7.7e-4 * Math.sqrt(f) +
      3.79 / ((f - 22.235) * (f - 22.235) + 9.81 * rp * rp * rt) +
      11.73 * rt / ((f - 183.31) * (f - 183.31) + 11.85 * rp * rp * rt) +
      4.01 * rt / ((f - 325.153) * (f - 325.153) + 10.44 * rp * rp * rt)) *
      f2 * rho * rp * rt * 1e-4
    val hw = 1.6 * (1.0 + 3.0 / ((f - 22.2) * (f - 22.2) + 5.0))
    (go * 6.0 + gw * hw) / sinel
  }

  /** [[AtmValueMicro]]'s integer tail: see the expression scaladoc.
    * Ln10Nano/Ln2Nano are [[FixedPointExp.Ln10Nano]]/[[FixedPointLog
    * .Ln2Nano]]; the oracle's [[NumBound]] ceiling is enforced here via a
    * BigInt widening that mirrors the oracle's HUGEINT num, so both
    * engines abort on identical inputs (same message on the error() side;
    * the below-int64 negative window mirrors the oracle's CAST conversion
    * error with a JVM ArithmeticException).
    */
  def atmValueMicro(data: Double, rho: Double, rp: Double, rt: Double,
      sinel: Double, f: Double): Long = {
    val aa = attenuationDbExact(rho, rp, rt, sinel, f)
    val an = Math.round(aa * 1.0e9)
    // yn = an·ln10 / 1e10 nano-nats; long fast path while an·Ln10Nano
    // fits int64 (an ≤ 4e9 ⇔ A ≤ 4 dB — every realistic row), BigInt
    // above it, same truncation (the lnNanoEval discipline).
    val yn =
      if (an >= 0 && an <= 4000000000L)
        an * FixedPointExp.Ln10Nano / 10000000000L
      else
        ((BigInt(an) * FixedPointExp.Ln10Nano) / BigInt(10000000000L)).toLong
    val j = yn / FixedPointLog.Ln2Nano
    if (j > 60)
      throw new ArithmeticException(
        "q_pipeline_atmosphere: 2^j overflow (attenuation > 180 dB)")
    val r = yn - j * FixedPointLog.Ln2Nano
    val er = FixedPointExp.expNanoEval(r)
    val dc = Math.round(data * 100.0)
    // num = dc·2^j·er + 50000 — long fast path; when the int64 product
    // overflows, fall back to BigInt exactly as the oracle computes num in
    // HUGEINT, and apply the oracle's own ceiling ([[NumBound]]) so both
    // engines abort on the SAME inputs (the oracle returns a valid
    // value_micro up to num ≤ ~9.2e23; only past that does it error()).
    val fast =
      try Some(Math.addExact(
        Math.multiplyExact(Math.multiplyExact(dc, 1L << j.toInt), er), 50000L))
      catch { case _: ArithmeticException => None }
    fast match {
      case Some(num) => num / 100000L
      case None =>
        val wide = (BigInt(dc) << j.toInt) * er + 50000
        if (wide > NumBound)
          throw new ArithmeticException(
            "q_pipeline_atmosphere: value_micro exceeds int64")
        // BigInt / truncates toward zero exactly like DuckDB's HUGEINT //.
        // Below int64 (possible only for large-NEGATIVE dc) the oracle's
        // CAST(num // 100000 AS BIGINT) raises a conversion error — abort
        // here too rather than silently wrapping in toLong.
        val q = wide / 100000
        if (!q.isValidLong)
          throw new ArithmeticException(
            "q_pipeline_atmosphere: value_micro below int64")
        q.toLong
    }
  }

  /** The atmosphere oracle's num ceiling (`AtmNumBound` in the DuckDB SQL,
    * single-sourced here): num ≤ this ⇒ num//100000 fits int64; above it
    * BOTH engines abort with the same message.
    */
  val NumBound: BigInt = BigInt("922337203685477000000000")

  /** [[AtmValueMicro]] as a Column. */
  def atmValueMicroCol(data: Column, rho: Column, rp: Column, rt: Column,
      sinElev: Column, fGHz: Column): Column =
    GraftColumnBridge.column(AtmValueMicro(
      GraftColumnBridge.expression(data.cast("double")),
      GraftColumnBridge.expression(rho.cast("double")),
      GraftColumnBridge.expression(rp.cast("double")),
      GraftColumnBridge.expression(rt.cast("double")),
      GraftColumnBridge.expression(sinElev.cast("double")),
      GraftColumnBridge.expression(fGHz.cast("double"))))

  /** 10^(−A/10) with A per Rec. ITU-R P.676 approximation — same op order
    * as the Column form in [[graft.ops.Atmosphere.gaseousAttenuationDb]] /
    * `dbToTransmission`, which the DuckDB oracles mirror textually. Values
    * agree with the Column form to <= 1 ulp (Math.pow's JIT intrinsic may
    * legally differ in the last bit between call sites; the oracles' 6-
    * decimal rounding absorbs it). Static so BOTH the interpreted eval and
    * the generated code call this exact bytecode.
    */
  def transmission(f: Double, rho: Double, rp: Double, rt: Double, sinel: Double): Double = {
    val f2 = f * f
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
    math.pow(10.0, -atten / 10.0)
  }

  /** `DATA / transmission(axis)` as one codegen'd kernel call. */
  def ituCorrect(
      data: Column,
      freqsGHz: Array[Double],
      rho: Column,
      rp: Column,
      rt: Column,
      sinElev: Column): Column = {
    val freqArr = array(freqsGHz.map(lit(_)).toIndexedSeq: _*)
    GraftColumnBridge.column(ItuCorrect(
      GraftColumnBridge.expression(data.cast("array<double>")),
      GraftColumnBridge.expression(freqArr),
      GraftColumnBridge.expression(rho.cast("double")),
      GraftColumnBridge.expression(rp.cast("double")),
      GraftColumnBridge.expression(rt.cast("double")),
      GraftColumnBridge.expression(sinElev.cast("double"))))
  }
}
