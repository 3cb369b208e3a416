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
    * p/q ∈ (0, 2]). Pure integer expression tree — no `ln`/`exp` anywhere. */
  def lnNanoCol(p: Column, q: Column): Column = {
    val pB = p.cast("decimal(20,0)") * lit(Scale).cast("decimal(10,0)")
    val u = greatest(idiv(pB, q.cast("decimal(20,0)")), lit(1L))
    seriesFromU(u)
  }

  /** Up-ladder + atanh series over the fixed-point value `u` (long,
    * u·2⁻³⁰ ∈ (0, 2]) — the shared tail of [[lnNanoCol]] and
    * [[lnNanoWideCol]]. Returns ln(u/2³⁰)·10⁹. */
  private def seriesFromU(u: Column): Column = {
    // Normalization ladder: m = u·2^k ∈ [2^30, 2^31]; k = #doublings.
    val m = (1 to 30).foldLeft(when(u >= lit(Scale), u)) { (acc, j) =>
      acc.when(u >= lit(Scale >> j), u * lit(1L << j))
    }
    val k = (1 to 30).foldLeft(when(u >= lit(Scale), lit(0L))) { (acc, j) =>
      acc.when(u >= lit(Scale >> j), lit(j.toLong))
    }
    val z = idiv((m - lit(Scale)) * lit(Scale), m + lit(Scale))
    val z2 = idiv(z * z, lit(Scale))
    val terms = SeriesOdd.scanLeft(z)((t, _) => idiv(t * z2, lit(Scale)))
    val s = terms.head + SeriesOdd.zip(terms.tail)
      .map { case (d, t) => idiv(t, lit(d)) }.reduce(_ + _)
    idiv(s * lit(2000000000L), lit(Scale)) - k * lit(Ln2Nano)
  }

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

  /** [[lnNanoWideRef]] as ONE Spark Column expression. The j-branch divides
    * q UP in decimal(38,0) (q·2ʲ ≤ 9.2·10¹⁸·2⁴⁵ < 10³³ — exact), so no bit
    * of p is ever dropped; each branch's quotient lands in [2³⁰, 2³¹) and
    * the shared series tail runs unchanged.
    *
    * WARNING — tree size: the series ladders re-embed the 46-branch `u`
    * CASE ~60×, giving a ~10⁶-node expression. Fine as a single standalone
    * column (specs, one-off projections); in a real query plan use
    * [[withLnNanoWide]], which materializes each step as a projected
    * column and keeps the plan linear. */
  def lnNanoWideCol(p: Column, q: Column): Column = {
    val pB = p.cast("decimal(38,0)") * lit(Scale).cast("decimal(10,0)")
    val qD = q.cast("decimal(38,0)")
    def uAt(j: Int): Column =
      idiv(pB, qD * lit(java.math.BigDecimal.valueOf(1L << j)))
    val guard = idiv(p - lit(1L), lit(1L << (WideMaxJ + 1))) >= q
    val u = (WideMaxJ - 1 to 1 by -1).foldLeft(
        when(guard, raise_error(lit(WideGuardMsg)).cast("long"))
          .when(idiv(p - lit(1L), lit(1L << WideMaxJ)) >= q, uAt(WideMaxJ))) { (acc, j) =>
        acc.when(idiv(p - lit(1L), lit(1L << j)) >= q, uAt(j))
      }
      .otherwise(greatest(idiv(pB, qD), lit(1L)))
    val j = (WideMaxJ - 1 to 1 by -1).foldLeft(
        when(guard, raise_error(lit(WideGuardMsg)).cast("long"))
          .when(idiv(p - lit(1L), lit(1L << WideMaxJ)) >= q, lit(WideMaxJ.toLong))) { (acc, jj) =>
        acc.when(idiv(p - lit(1L), lit(1L << jj)) >= q, lit(jj.toLong))
      }
      .otherwise(lit(0L))
    seriesFromU(u) + j * lit(Ln2Nano)
  }

  /** Appends `out` = ln(p/q)·10⁹ (the [[lnNanoWideRef]] algorithm) to `df`
    * as a CHAIN of projected steps — u, j, m, k, z, z², the six series
    * powers — each computed once per row and referenced by attribute, the
    * Spark mirror of [[lnNanoWideDuckSteps]]'s lateral-alias chain. A
    * single nested Column would re-embed the 46-branch wide ladder inside
    * the 31-branch series ladders (~10⁶ nodes — analysis OOM); this keeps
    * the plan linear (~10³ nodes), and CollapseProject leaves the steps
    * separate because each is non-cheap and multiply-referenced. `p` and
    * `q` should be cheap expressions (attributes / literals / small
    * arithmetic). Intermediates are dropped.
    */
  def withLnNanoWide(df: org.apache.spark.sql.DataFrame, p: Column, q: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    def c(suffix: String): String = s"__${out}_$suffix"
    val guard = idiv(p - lit(1L), lit(1L << (WideMaxJ + 1))) >= q
    val pB = p.cast("decimal(38,0)") * lit(Scale).cast("decimal(10,0)")
    val qD = q.cast("decimal(38,0)")
    def uAt(j: Int): Column =
      idiv(pB, qD * lit(java.math.BigDecimal.valueOf(1L << j)))
    val uExpr = (WideMaxJ - 1 to 1 by -1).foldLeft(
        when(guard, raise_error(lit(WideGuardMsg)).cast("long"))
          .when(idiv(p - lit(1L), lit(1L << WideMaxJ)) >= q, uAt(WideMaxJ))) { (acc, j) =>
        acc.when(idiv(p - lit(1L), lit(1L << j)) >= q, uAt(j))
      }
      .otherwise(greatest(idiv(pB, qD), lit(1L)))
    val jExpr = (WideMaxJ - 1 to 1 by -1).foldLeft(
        when(guard, raise_error(lit(WideGuardMsg)).cast("long"))
          .when(idiv(p - lit(1L), lit(1L << WideMaxJ)) >= q, lit(WideMaxJ.toLong))) { (acc, jj) =>
        acc.when(idiv(p - lit(1L), lit(1L << jj)) >= q, lit(jj.toLong))
      }
      .otherwise(lit(0L))
    val u = col(c("u"))
    val mExpr = (1 to 30).foldLeft(when(u >= lit(Scale), u)) { (acc, j) =>
      acc.when(u >= lit(Scale >> j), u * lit(1L << j))
    }
    val kExpr = (1 to 30).foldLeft(when(u >= lit(Scale), lit(0L))) { (acc, j) =>
      acc.when(u >= lit(Scale >> j), lit(j.toLong))
    }
    var d = df.withColumn(c("u"), uExpr).withColumn(c("j"), jExpr)
      .withColumn(c("m"), mExpr).withColumn(c("k"), kExpr)
      .withColumn(c("z"),
        idiv((col(c("m")) - lit(Scale)) * lit(Scale), col(c("m")) + lit(Scale)))
      .withColumn(c("z2"), idiv(col(c("z")) * col(c("z")), lit(Scale)))
    var prev = c("z")
    for (i <- SeriesOdd.indices) {
      val t = c(s"t${2 * i + 3}")
      d = d.withColumn(t, idiv(col(prev) * col(c("z2")), lit(Scale)))
      prev = t
    }
    val s = col(c("z")) + SeriesOdd.zipWithIndex
      .map { case (dv, i) => idiv(col(c(s"t${2 * i + 3}")), lit(dv)) }
      .reduce(_ + _)
    val drops = Seq("u", "j", "m", "k", "z", "z2").map(c) ++
      SeriesOdd.indices.map(i => c(s"t${2 * i + 3}"))
    d.withColumn(out,
        idiv(s * lit(2000000000L), lit(Scale))
          - col(c("k")) * lit(Ln2Nano) + col(c("j")) * lit(Ln2Nano))
      .drop(drops: _*)
  }

  // ------------------------------------------------------------ DuckDB side

  /** The same algorithm as DuckDB SQL, emitted as `(expr, alias)` pairs for
    * a lateral-column-alias SELECT (each step may reference earlier
    * aliases). `p` and `q` are SQL fragments that must already be HUGEINT
    * (or safely within BIGINT); the final alias `<pre>_ln` is the nano-nat
    * result. */
  def lnNanoDuckSteps(p: String, q: String, pre: String): Seq[(String, String)] =
    (s"greatest((($p) * $B) // ($q), 1)", s"${pre}_u") +: duckSeriesTail(pre, jTerm = "")

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
