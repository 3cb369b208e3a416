package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Catalyst expressions for the fixed-point transcendental kernels.
  *
  * Why expressions and not Column trees: the integer log/exp algorithms are
  * 30-50 sequential steps with 31-46-branch comparison ladders. Emitted as
  * nested Columns they become 10⁴-10⁶-node trees; even emitted as projected
  * step CHAINS they make Janino compile megabytes of generated code —
  * measured 30-140 s of one-time whole-stage-codegen compilation PER QUERY
  * (q_sample_doremi 0.44 s → 164 s; PLANS.md finding 45). Each expression
  * here instead generates ONE static call into the JVM kernel
  * ([[FixedPointLog.lnNanoEval]] etc. — a tight JIT-compiled loop), so the
  * generated code is a line long, whole-stage codegen stays intact, and the
  * per-row cost is the loop itself.
  *
  * Exactness contract: the JVM kernels are step-for-step the SAME integer
  * algorithm the DuckDB oracle runs as a lateral-alias chain
  * ([[FixedPointLog.lnNanoDuckSteps]] / [[FixedPointExp.expNanoDuckSteps]])
  * — every multiply, compare and truncating divide in the same order, with
  * the retired Column emitters' CLAMP semantics (u = max(·, 1), never a
  * positivity require): FixedPointLogSpec pins bit-identity on grids that
  * cover every ladder branch. Long fast paths fall back to BigInt exactly
  * where the emitters used DECIMAL/HUGEINT, with identical truncation.
  *
  * Null semantics: null in → null out (nullSafeEval / nullSafeCodeGen).
  * Every call site feeds coalesced counts, so no compared value sees this;
  * the retired emitters' greatest(null, 1) = 1 junk path was equally
  * unreachable.
  */
object FixedPointKernels {

  abstract class FixedPointBinary extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    /** Fully-qualified static JVM kernel, e.g.
      * "graft.functions.FixedPointLog.lnNanoEval". */
    protected def kernel: String
    protected def evalKernel(p: Long, q: Long): Long
    override def nullSafeEval(p: Any, q: Any): Any =
      evalKernel(p.asInstanceOf[Long], q.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (p, q) => s"$kernel($p, $q)")
  }

  /** ln(p/q)·10⁹, narrow domain p/q ∈ (0, 2] — [[FixedPointLog.lnNanoEval]]. */
  case class LnNanoExpr(left: Expression, right: Expression)
      extends FixedPointBinary {
    override def prettyName: String = "ln_nano"
    override protected def kernel: String =
      "graft.functions.FixedPointLog.lnNanoEval"
    override protected def evalKernel(p: Long, q: Long): Long =
      FixedPointLog.lnNanoEval(p, q)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LnNanoExpr =
      copy(left = newLeft, right = newRight)
  }

  /** ln(p/q)·10⁹, wide domain p/q ∈ (0, 2⁴⁶] — [[FixedPointLog.lnNanoWideEval]]. */
  case class LnNanoWideExpr(left: Expression, right: Expression)
      extends FixedPointBinary {
    override def prettyName: String = "ln_nano_wide"
    override protected def kernel: String =
      "graft.functions.FixedPointLog.lnNanoWideEval"
    override protected def evalKernel(p: Long, q: Long): Long =
      FixedPointLog.lnNanoWideEval(p, q)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LnNanoWideExpr =
      copy(left = newLeft, right = newRight)
  }

  /** e^(x/10⁹)·10⁹ for x ∈ [0, 2·10⁹] — [[FixedPointExp.expNanoEval]]
    * (domain-guarded: throws in BOTH engines past 2 nats). */
  case class ExpNanoExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "exp_nano"
    override def nullSafeEval(x: Any): Any =
      FixedPointExp.expNanoEval(x.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.FixedPointExp.expNanoEval($x)")
    override protected def withNewChildInternal(newChild: Expression): ExpNanoExpr =
      copy(child = newChild)
  }
}
