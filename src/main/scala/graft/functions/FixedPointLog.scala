package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Fixed-point natural log over exact integer rationals — the kernel behind
  * oracle-exact divergence metrics ([[graft.llm.CorpusDrift]]'s per-word
  * Jensen–Shannon terms).
  *
  * Why: a value like `round(ln(a/m)·1e6)` computed independently by two
  * engines flips at a rounding boundary whenever their `ln` implementations
  * disagree by an ulp — with thousands of per-word terms summed, SOME word
  * lands on a boundary and the report hashes differently (round-10 verdict,
  * `q_corpus_drift`). The fix is to never compare an engine-native
  * transcendental: both engines run the SAME integer-only algorithm
  * (multiply / compare / truncating divide — bit-exact everywhere), so the
  * result is identical by construction, not by luck.
  *
  * Algorithm, for a rational p/q with p,q > 0 and p/q ∈ (0, 2]:
  *   1. fixed-point   u  = floor(p·2³⁰ / q)          (the only wide step:
  *      p·2³⁰ can exceed int64, so it runs in DECIMAL(38,0) on Spark and
  *      HUGEINT in DuckDB; the result is < 2³¹ and comes back to int64)
  *   2. normalize     m  = u·2ᵏ ∈ [2³⁰, 2³¹]         (k by a 31-branch
  *      comparison ladder — generated, identical in both engines)
  *   3. atanh series  z = (m−B)·B / (m+B),  ln(m/B) = 2·(z + z³/3 + … +
  *      z¹³/13) with every power floor-divided back to scale B = 2³⁰
  *      (z ≤ 1/3, so the truncated tail is < 5·10⁻⁹ nats)
  *   4. recombine     ln(p/q)·10⁹ ≈ lnm·10⁹/B − k·round(ln2·10⁹)
  *
  * Accuracy ≈ 10⁻⁸ nats (series tail + ~10 one-ulp truncations at scale
  * 2⁻³⁰) — far below the micro-nat reporting grain; and because every step
  * is integer, accuracy is a QUALITY property, not a correctness one.
  *
  * Bounds: callers must keep p, q ≤ ~2·10¹⁶ (int64 headroom in DuckDB's
  * hugeint→bigint narrowing and Spark's decimal(20,0) casts) — corpus word
  * counts satisfy this up to ~10⁸ total tokens per side.
  *
  * Three parallel implementations from the same constants: [[lnNanoRef]]
  * (plain JVM, the spec oracle), [[lnNanoCol]] (Spark Columns), and
  * [[lnNanoDuckSteps]] (DuckDB SQL text, emitted as lateral column aliases).
  */
object FixedPointLog {

  /** Fixed-point scale 2³⁰. */
  val Scale: Long = 1L << 30

  /** round(ln 2 · 10⁹) — the single transcendental constant, embedded
    * identically in both engines' plans (never recomputed per row). */
  val Ln2Nano: Long = 693147181L

  /** Odd divisors of the atanh series terms z³/3 … z¹³/13. */
  val SeriesOdd: Seq[Long] = Seq(3L, 5L, 7L, 9L, 11L, 13L)

  // ---------------------------------------------------------------- JVM ref

  /** Reference implementation (BigInt for the wide first step). Returns
    * ln(p/q) in nano-nats. Requires p, q > 0. */
  def lnNanoRef(p: Long, q: Long): Long = {
    require(p > 0 && q > 0, s"lnNanoRef needs positive p,q; got $p/$q")
    val u0 = ((BigInt(p) * Scale) / q).toLong
    val u = math.max(u0, 1L)
    var k = 0
    while (k < 30 && (u << k) < Scale) k += 1
    val m = u << k
    val z = (m - Scale) * Scale / (m + Scale)
    val z2 = z * z / Scale
    var t = z
    var s = z
    for (d <- SeriesOdd) { t = t * z2 / Scale; s += t / d }
    2 * s * 1000000000L / Scale - k * Ln2Nano
  }

  // ----------------------------------------------------------- plan kernels

  private val SeriesOddArr: Array[Long] = SeriesOdd.toArray

  /** Largest p with p·2³⁰ still inside int64 — the long fast-path bound;
    * beyond it the first step runs in BigInt, exactly where the retired
    * Column emitters used DECIMAL and the DuckDB chain uses HUGEINT. */
  private val MaxPShift: Long = Long.MaxValue >> 30

  /** m/k ladder + atanh series from fixed-point u ≥ 1 (the shared tail of
    * [[lnNanoEval]] and [[lnNanoWideEval]] — same arithmetic as
    * [[lnNanoRef]]'s tail). Returns ln(u/2³⁰)·10⁹ + j·ln2·10⁹. */
  private def seriesTail(u: Long, j: Int): Long = {
    var k = 0
    while (k < 30 && (u << k) < Scale) k += 1
    val m = u << k
    val z = (m - Scale) * Scale / (m + Scale)
    val z2 = z * z / Scale
    var t = z
    var s = z
    var i = 0
    while (i < SeriesOddArr.length) {
      t = t * z2 / Scale
      s += t / SeriesOddArr(i)
      i += 1
    }
    2 * s * 1000000000L / Scale - k * Ln2Nano + j * Ln2Nano
  }

  /** The narrow algorithm as the per-row JVM kernel behind
    * [[graft.functions.FixedPointKernels.LnNanoExpr]] — bit-identical to
    * [[lnNanoRef]] on its domain, with the retired Column emitter's CLAMP
    * (u = max(trunc(p·2³⁰/q), 1), no positivity require: a p ≤ 0 row yields
    * the same junk value both engines compute instead of aborting — callers
    * gate such rows out of compared output). q must be positive; q = 0
    * crashes loudly (ArithmeticException) where the emitter yielded silent
    * junk — strictly better, and unreachable from any call site. */
  def lnNanoEval(p: Long, q: Long): Long = {
    val u0 =
      if (p >= 0 && p <= MaxPShift) (p << 30) / q
      else ((BigInt(p) * Scale) / q).toLong
    seriesTail(math.max(u0, 1L), 0)
  }

  /** The wide algorithm as the per-row JVM kernel behind
    * [[graft.functions.FixedPointKernels.LnNanoWideExpr]] — bit-identical
    * to [[lnNanoWideRef]] on its domain, same clamp discipline as
    * [[lnNanoEval]], same loud guard past the 2⁴⁶ ratio ceiling. */
  def lnNanoWideEval(p: Long, q: Long): Long = {
    if ((p - 1) / (1L << (WideMaxJ + 1)) >= q)
      throw new IllegalArgumentException(WideGuardMsg + s" ($p/$q)")
    var j = 0
    var jj = WideMaxJ
    while (jj >= 1 && j == 0) { if ((p - 1) / (1L << jj) >= q) j = jj; jj -= 1 }
    val u =
      if (j > 0) {
        if (p >= 0 && p <= MaxPShift && q <= (Long.MaxValue >> j))
          (p << 30) / (q << j)
        else ((BigInt(p) * Scale) / (BigInt(q) << j)).toLong
      } else {
        val u0 =
          if (p >= 0 && p <= MaxPShift) (p << 30) / q
          else ((BigInt(p) * Scale) / q).toLong
        math.max(u0, 1L)
      }
    seriesTail(u, j)
  }

  // ------------------------------------------------------------- Spark side

  /** Spark's `div` (IntegralDivide): truncation-toward-zero integral
    * division, LongType result — same semantics as DuckDB's `//`, exact on
    * integers AND decimals (unlike `/`, which would route through doubles
    * and lose low bits above 2⁵³). */
  def idiv(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Signed floor division a ⌊/⌋ b (b > 0), exact at any int64 magnitude. */
  def fdiv(a: Column, b: Column): Column = idiv(a - pmod(a, b), b)

  /** Nano → micro with round-half-up (⌊(x+500)/1000⌋ — exact on any sign;
    * the shared grain step for compared micro-nat log terms). */
  def microOfNano(nano: Column): Column = fdiv(nano + lit(500L), lit(1000L))

  /** [[microOfNano]] as DuckDB SQL text (`//` truncates toward zero, so
    * the floor is spelled out with the positive-mod trick). */
  def microOfNanoDuck(nano: String): String =
    s"((($nano) + 500) - (((($nano) + 500) % 1000 + 1000) % 1000)) // 1000"

  /** JVM twin of [[microOfNano]] for spec oracles. */
  def microOfNanoRef(nano: Long): Long = Math.floorDiv(nano + 500L, 1000L)

  /** ln(p/q) in nano-nats as a Spark Column (p, q positive long columns,
    * p/q ∈ (0, 2]). One codegen'd call into [[lnNanoEval]] — no `ln`/`exp`
    * anywhere, no expression-tree ladder (PLANS.md finding 45). */
  def lnNanoCol(p: Column, q: Column): Column =
    GraftColumnBridge.column(FixedPointKernels.LnNanoExpr(
      GraftColumnBridge.expression(p.cast("long")),
      GraftColumnBridge.expression(q.cast("long"))))

  // ----------------------------------------------------------- wide-domain ln

  /** Max binary pre-halvings in the wide variant: ratios up to 2⁴⁶ (≈7·10¹³)
    * — enough for ln(N/df)-shaped corpus statistics at any realistic scale
    * (10¹³ docs), guarded loudly beyond. */
  val WideMaxJ: Int = 45

  private val WideGuardMsg =
    s"lnNanoWide: ratio p/q exceeds 2^${WideMaxJ + 1}"

  /** ln(p/q) for p/q ∈ (0, 2⁴⁶] — [[lnNanoRef]] with a binary pre-reduction:
    * the largest j with p/q > 2ʲ (integer form: (p−1) div 2ʲ ≥ q) gives
    * p/(q·2ʲ) ∈ (1, 2], the core series runs there, and j·ln2 is added
    * back. No branch fires for p/q ≤ 2, so the wide variant is BIT-EQUAL
    * to [[lnNanoRef]] on the narrow domain — the two can mix freely in one
    * query family. Same integer ops in all three engines ⇒ identical by
    * construction. */
  def lnNanoWideRef(p: Long, q: Long): Long = {
    require(p > 0 && q > 0, s"lnNanoWideRef needs positive p,q; got $p/$q")
    require((p - 1) / (1L << (WideMaxJ + 1)) < q, WideGuardMsg + s" ($p/$q)")
    var j = 0
    var jj = WideMaxJ
    while (jj >= 1 && j == 0) { if ((p - 1) / (1L << jj) >= q) j = jj; jj -= 1 }
    val u =
      if (j > 0) ((BigInt(p) * Scale) / (BigInt(q) << j)).toLong
      else math.max(((BigInt(p) * Scale) / q).toLong, 1L)
    var k = 0
    while (k < 30 && (u << k) < Scale) k += 1
    val m = u << k
    val z = (m - Scale) * Scale / (m + Scale)
    val z2 = z * z / Scale
    var t = z
    var s = z
    for (d <- SeriesOdd) { t = t * z2 / Scale; s += t / d }
    2 * s * 1000000000L / Scale - k * Ln2Nano + j * Ln2Nano
  }

  /** [[lnNanoWideRef]] as a Spark Column — one codegen'd call into
    * [[lnNanoWideEval]] (PLANS.md finding 45; the j-branch division runs
    * in BigInt exactly where the retired Column emitter used
    * decimal(38,0), with identical truncation). */
  def lnNanoWideCol(p: Column, q: Column): Column =
    GraftColumnBridge.column(FixedPointKernels.LnNanoWideExpr(
      GraftColumnBridge.expression(p.cast("long")),
      GraftColumnBridge.expression(q.cast("long"))))

  /** Appends `out` = ln(p/q)·10⁹ (the narrow [[lnNanoRef]] algorithm,
    * p/q ∈ (0, 2]) to `df`. Kept as the frame-level entry point from the
    * retired projected-step-chain era (PLANS.md findings 43/45) — today
    * it is just [[lnNanoCol]], whose kernel expression is equally cheap
    * on any frame size. */
  def withLnNano(df: org.apache.spark.sql.DataFrame, p: Column, q: Column,
      out: String): org.apache.spark.sql.DataFrame =
    df.withColumn(out, lnNanoCol(p, q))

  /** Appends `out` = ln(p/q)·10⁹ (the wide [[lnNanoWideRef]] algorithm)
    * to `df`. Frame-level twin of [[withLnNano]] — today just
    * [[lnNanoWideCol]] (PLANS.md finding 45). */
  def withLnNanoWide(df: org.apache.spark.sql.DataFrame, p: Column, q: Column,
      out: String): org.apache.spark.sql.DataFrame =
    df.withColumn(out, lnNanoWideCol(p, q))

  // ------------------------------------------------------------ DuckDB side

  /** The same algorithm as DuckDB SQL, emitted as `(expr, alias)` pairs for
    * a lateral-column-alias SELECT (each step may reference earlier
    * aliases). `p` is widened to HUGEINT internally (the `p·2³⁰` product
    * would overflow BIGINT for counts above 2³³ — the Spark kernel's
    * BigInt fallback succeeds there, so the oracle must too) and the
    * quotient narrowed back to BIGINT (p/q ∈ (0, 2] ⇒ u ≤ 2³¹, always
    * fits); the final alias `<pre>_ln` is the nano-nat result. */
  def lnNanoDuckSteps(p: String, q: String, pre: String): Seq[(String, String)] =
    (s"CAST(greatest((CAST(($p) AS HUGEINT) * $B) // ($q), 1) AS BIGINT)",
      s"${pre}_u") +: duckSeriesTail(pre, jTerm = "")

  private def B = Scale

  /** The m/k ladders + atanh series from alias `<pre>_u` onward — the tail
    * shared by [[lnNanoDuckSteps]] and [[lnNanoWideDuckSteps]] (`jTerm` is
    * the wide variant's `+ <pre>_j * ln2` recombination, empty otherwise). */
  private def duckSeriesTail(pre: String, jTerm: String): Seq[(String, String)] = {
    val mLadder = (s"WHEN ${pre}_u >= $B THEN ${pre}_u" +:
      (1 to 30).map(j => s"WHEN ${pre}_u >= ${B >> j} THEN ${pre}_u * ${1L << j}"))
      .mkString("CASE ", " ", " END")
    val kLadder = (s"WHEN ${pre}_u >= $B THEN 0" +:
      (1 to 30).map(j => s"WHEN ${pre}_u >= ${B >> j} THEN $j"))
      .mkString("CASE ", " ", " END")
    val powers = SeriesOdd.indices.map { i =>
      val prev = if (i == 0) s"${pre}_z" else s"${pre}_t${2 * i + 1}"
      (s"$prev * ${pre}_z2 // $B", s"${pre}_t${2 * i + 3}")
    }
    val sumS = s"${pre}_z + " + SeriesOdd.zipWithIndex
      .map { case (d, i) => s"${pre}_t${2 * i + 3} // $d" }.mkString(" + ")
    Seq(
      (mLadder, s"${pre}_m"),
      (kLadder, s"${pre}_k"),
      (s"((${pre}_m - $B) * $B) // (${pre}_m + $B)", s"${pre}_z"),
      (s"${pre}_z * ${pre}_z // $B", s"${pre}_z2")) ++
      powers :+
      ((s"($sumS) * 2000000000 // $B - ${pre}_k * CAST($Ln2Nano AS BIGINT)$jTerm",
        s"${pre}_ln"))
  }

  /** [[lnNanoWideCol]] as DuckDB SQL steps (HUGEINT carries the q·2ʲ
    * products). Same aliases contract as [[lnNanoDuckSteps]]. */
  def lnNanoWideDuckSteps(p: String, q: String, pre: String): Seq[(String, String)] = {
    val guard =
      s"WHEN ((($p) - 1) // ${1L << (WideMaxJ + 1)}) >= ($q) THEN " +
        s"CAST(error('$WideGuardMsg') AS BIGINT)"
    val uBranches = (WideMaxJ to 1 by -1).map { j =>
      s"WHEN ((($p) - 1) // ${1L << j}) >= ($q) THEN " +
        s"CAST((CAST(($p) AS HUGEINT) * $B) // (CAST(($q) AS HUGEINT) * ${1L << j}) AS BIGINT)"
    }
    val jBranches = (WideMaxJ to 1 by -1).map { j =>
      s"WHEN ((($p) - 1) // ${1L << j}) >= ($q) THEN $j"
    }
    val uCase = (guard +: uBranches)
      .mkString("CASE ", " ",
        s" ELSE CAST(greatest((CAST(($p) AS HUGEINT) * $B) // ($q), 1) AS BIGINT) END")
    val jCase = (guard +: jBranches).mkString("CASE ", " ", " ELSE 0 END")
    Seq((uCase, s"${pre}_u"), (jCase, s"${pre}_j")) ++
      duckSeriesTail(pre, jTerm = s" + ${pre}_j * CAST($Ln2Nano AS BIGINT)")
  }
}
