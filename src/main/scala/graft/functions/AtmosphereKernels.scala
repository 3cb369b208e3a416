package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{array, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

object AtmosphereKernels {

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
