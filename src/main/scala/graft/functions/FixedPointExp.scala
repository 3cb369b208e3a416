package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point natural exponential over exact integers — the companion of
  * [[FixedPointLog]] for operators whose compared output multiplies by
  * `exp(x)` (DoReMi's exponentiated-gradient domain weights).
  *
  * Why: `round(exp(x), 6)` computed independently by two engines flips at
  * a rounding boundary whenever their `exp` implementations disagree by an
  * ulp — the exact mechanism that hash-FAILED `q_text_qmodel_calibration`
  * in the round-10 driver run (PLANS.md finding 37). Both engines instead
  * run the SAME integer-only Taylor evaluation (multiply / truncating
  * divide — bit-exact everywhere), so the result is identical by
  * construction.
  *
  * Algorithm, for x ≥ 0 in nano units (x/10⁹ ∈ [0, 2] — ENFORCED):
  *   e^(x/10⁹)·10⁹ ≈ Σ_{k=0..24} t_k,  t_0 = 10⁹,
  *   t_{k+1} = ⌊t_k · x / ((k+1)·10⁹)⌋
  * Each term is one multiply and one truncating divide; at x ≤ 2·10⁹ the
  * largest intermediate is t_2·x ≤ 2·10⁹ · 2·10⁹ = 4·10¹⁸ < 2⁶³, and
  * t_24 ≤ 2²⁴/24! · 10⁹ ≈ 0 — the truncated tail is below one nano.
  *
  * Accuracy ≈ 24 nano (one truncation per term) — far below the micro
  * reporting grain; and because every step is integer, accuracy is a
  * QUALITY property, not a correctness one.
  *
  * The domain guard fails loudly in BOTH engines (raise_error / error()):
  * past x = 2·10⁹ the term products overflow int64 silently on the Spark
  * side while a HUGEINT oracle wouldn't — the [[graft.llm.CorpusDrift]]
  * bound discipline. Callers with larger exponents should range-reduce
  * (e^x = 2^j·e^r) before calling.
  *
  * Three parallel implementations from the same constants: [[expNanoRef]]
  * (plain JVM, the spec oracle), [[expNanoCol]] (Spark Columns), and
  * [[expNanoDuckSteps]] (DuckDB SQL text, lateral column aliases).
  */
object FixedPointExp {

  /** Nano scale 10⁹. */
  val Scale: Long = 1000000000L

  /** Domain ceiling: x/10⁹ ≤ 2 keeps every t_k·x product inside int64. */
  val MaxNano: Long = 2 * Scale

  /** round(ln 10 · 10⁹) — the dB→nats bridge constant, embedded
    * identically in both engines' plans (the [[FixedPointLog.Ln2Nano]]
    * discipline): 10^x = e^(x·ln10). */
  val Ln10Nano: Long = 2302585093L

  /** Taylor terms after t_0 (k = 1..24; t_24 < 1 nano at x = 2). */
  val Terms: Int = 24

  // ---------------------------------------------------------------- JVM ref

  /** Reference implementation. Returns e^(x/10⁹)·10⁹ for x ∈ [0, 2·10⁹]. */
  def expNanoRef(xNano: Long): Long = {
    require(xNano >= 0 && xNano <= MaxNano,
      s"expNanoRef domain is [0, $MaxNano] nano: $xNano")
    var t = Scale
    var s = Scale
    var k = 1
    while (k <= Terms) { t = t * xNano / (k * Scale); s += t; k += 1 }
    s
  }

  /** The per-row JVM kernel behind
    * [[graft.functions.FixedPointKernels.ExpNanoExpr]] — the [[expNanoRef]]
    * loop with the retired Column emitter's raise_error message on domain
    * violation (the spec pins the message prefix; DuckDB's error() guard
    * aborts the same way). */
  def expNanoEval(xNano: Long): Long = {
    if (xNano < 0 || xNano > MaxNano)
      throw new IllegalArgumentException(
        s"expNanoCol domain is [0, $MaxNano] nano: $xNano")
    var t = Scale
    var s = Scale
    var k = 1
    while (k <= Terms) { t = t * xNano / (k * Scale); s += t; k += 1 }
    s
  }

  // ------------------------------------------------------------- Spark side

  /** e^(x/10⁹)·10⁹ as a Spark Column (long nano input, domain-guarded).
    * One codegen'd call into [[expNanoEval]] — no `exp` anywhere, no
    * 24-term expression tree (PLANS.md finding 45). */
  def expNanoCol(xNano: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(FixedPointKernels.ExpNanoExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(xNano.cast("long"))))

  // ------------------------------------------------------------ DuckDB side

  /** The same algorithm as DuckDB SQL, emitted as `(expr, alias)` pairs
    * for a lateral-column-alias SELECT. `x` is a SQL fragment (BIGINT
    * nano); the final alias `<pre>_exp` is the nano result. The domain
    * guard mirrors the Spark raise_error with DuckDB error(). */
  def expNanoDuckSteps(x: String, pre: String): Seq[(String, String)] = {
    val guard = (s"CASE WHEN ($x) >= 0 AND ($x) <= $MaxNano THEN ($x) " +
      s"ELSE CAST(error('expNano domain is [0, $MaxNano] nano') AS BIGINT) END",
      s"${pre}_x")
    val terms = (1 to Terms).map { k =>
      val prev = if (k == 1) s"CAST($Scale AS BIGINT)" else s"${pre}_t${k - 1}"
      (s"$prev * ${pre}_x // ${k.toLong * Scale}", s"${pre}_t$k")
    }
    val total = s"CAST($Scale AS BIGINT) + " +
      (1 to Terms).map(k => s"${pre}_t$k").mkString(" + ")
    (guard +: terms) :+ ((total, s"${pre}_exp"))
  }
}
