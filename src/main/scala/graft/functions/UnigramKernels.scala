package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer kernels (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model): Viterbi segmentation for apply,
  * forward–backward expected counts for the EM E-step. Same discipline as
  * [[BpeKernels]]: the piece table is DATA baked into the expression via
  * `ctx.addReferenceObj`, the per-row work is one compiled loop, and the
  * expressions participate in whole-stage codegen — the corpus tokenizes
  * as a pure map with no UDF boundary.
  *
  * All indexing is in CODE POINTS (surrogate-safe), matching
  * [[BpeImpl.segment]]'s symbol alphabet.
  */
/** The trained artifact at kernel runtime: piece → log-probability, the
  * max piece length (in code points) bounding the inner loops, and the
  * OOV single-code-point fallback score (keeps Viterbi total and
  * segmentation defined on any input; an unknown code point costs
  * `unkLp` and emits itself as one token). Top-level class: codegen
  * references it by its Java binary name.
  */
final class UnigramTable(
    val lp: java.util.HashMap[String, java.lang.Double],
    val maxLen: Int,
    val unkLp: Double,
    /** piece → id, ids dense in piece-ascending order — the vocab a token
      * sink stores; OOV segments (unknown singles) have no id and encode
      * as -1 (callers decide whether to keep a sentinel or drop).
      */
    val ids: java.util.HashMap[String, Integer]) extends Serializable

object UnigramImpl {

  type Table = UnigramTable

  def tableOf(pieces: Seq[(String, Double)]): Table = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    var maxLen = 1
    pieces.foreach { case (p, s) =>
      m.put(p, s)
      val n = p.codePointCount(0, p.length)
      if (n > maxLen) maxLen = n
    }
    // OOV fallback: far below any real piece so it never beats one, finite
    // so any input still segments.
    var minLp = 0.0
    pieces.foreach { case (_, s) => if (s < minLp) minLp = s }
    val ids = new java.util.HashMap[String, Integer](pieces.size * 2)
    pieces.map(_._1).sorted.zipWithIndex.foreach { case (p, i) => ids.put(p, i) }
    new UnigramTable(m, maxLen, minLp - 30.0, ids)
  }

  private def cps(word: String): Array[String] = {
    val a = word.codePoints().toArray
    val out = new Array[String](a.length)
    var i = 0
    while (i < a.length) { out(i) = new String(Character.toChars(a(i))); i += 1 }
    out
  }

  /** The shared lattice scaffolding (ONE definition — viterbi, the
    * E-step and the sampler must never drift apart): the piece text at
    * (j, j+l) over the code-point array, and its (alpha-scaled) score —
    * unknown SINGLES fall back to `unkLp`, unknown multi-code-point
    * spans are non-viable (−Inf).
    */
  private def pieceAt(c: Array[String], j: Int, l: Int): String = {
    val sb = new java.lang.StringBuilder()
    var k = j
    while (k < j + l) { sb.append(c(k)); k += 1 }
    sb.toString
  }

  private def lpOf(t: Table, piece: String, l: Int, alpha: Double): Double = {
    val b = t.lp.get(piece)
    if (b != null) b.doubleValue() * alpha
    else if (l == 1) t.unkLp * alpha
    else Double.NegativeInfinity
  }

  /** Viterbi segmentation of ONE word: the piece sequence maximizing the
    * summed log-probability. `best[i]` scans ending pieces from length 1
    * up and updates on STRICTLY greater score, so ties resolve to the
    * shortest final piece — deterministic, documented.
    */
  def viterbi(word: String, t: Table): Array[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Array.empty[String]
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // length of the piece ending at i
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var l = 1
      val lMax = math.min(t.maxLen, i)
      while (l <= lMax) {
        val lp = lpOf(t, pieceAt(c, i - l, l), l, 1.0)
        if (lp != Double.NegativeInfinity) {
          val s = best(i - l) + lp
          if (s > best(i)) { best(i) = s; back(i) = l }
        }
        l += 1
      }
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var pos = n
    while (pos > 0) {
      val l = back(pos)
      out += pieceAt(c, pos - l, l)
      pos -= l
    }
    out.reverseIterator.toArray
  }

  private def logsumexp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Forward–backward expected piece counts of ONE word (the EM E-step
    * contribution): for every in-vocabulary piece occurrence (j, j+l),
    * gamma = exp(alpha(j) + lp + beta(j+l) − logZ), summed per piece.
    * Unknown single code points participate at `unkLp` (keeping Z finite
    * on any word) but are NOT emitted — they are not vocabulary pieces.
    * Returns (piece, gamma) pairs, piece-ascending for determinism.
    */
  def expectedCounts(word: String, t: Table): Array[(String, Double)] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Array.empty[(String, Double)]
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      alpha(i) = Double.NegativeInfinity
      var l = 1
      val lMax = math.min(t.maxLen, i)
      while (l <= lMax) {
        val lp = lpOf(t, pieceAt(c, i - l, l), l, 1.0)
        if (lp != Double.NegativeInfinity)
          alpha(i) = logsumexp(alpha(i), alpha(i - l) + lp)
        l += 1
      }
      i += 1
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return Array.empty[(String, Double)]
    beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      beta(i) = Double.NegativeInfinity
      var l = 1
      val lMax = math.min(t.maxLen, n - i)
      while (l <= lMax) {
        val lp = lpOf(t, pieceAt(c, i, l), l, 1.0)
        if (lp != Double.NegativeInfinity)
          beta(i) = logsumexp(beta(i), lp + beta(i + l))
        l += 1
      }
      i -= 1
    }
    val acc = new java.util.TreeMap[String, java.lang.Double]()
    var j = 0
    while (j < n) {
      var l = 1
      val lMax = math.min(t.maxLen, n - j)
      while (l <= lMax) {
        val piece = pieceAt(c, j, l)
        if (t.lp.get(piece) != null) {
          val lp = t.lp.get(piece).doubleValue()
          val g = math.exp(alpha(j) + lp + beta(j + l) - z)
          val prev = acc.get(piece)
          acc.put(piece, if (prev == null) g else prev.doubleValue() + g)
        }
        l += 1
      }
      j += 1
    }
    val out = new Array[(String, Double)](acc.size())
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = (e.getKey, e.getValue.doubleValue()); k += 1
    }
    out
  }

  private def words(t: UTF8String): Array[String] =
    SigImpl.trimSpaces(t.toString).split("\\s+", -1)

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) from a counter-mode splitmix64 stream. */
  private def unit(seed: Long, ctr: Int): Double =
    ((splitmix64(seed + ctr) >>> 11).toDouble) / (1L << 53).toDouble

  /** SAMPLED segmentation of ONE word from p(seg)^alpha (Kudo 2018
    * subword regularization, forward-filtering backward-sampling):
    * forward alphas under alpha-scaled piece scores, then draw each
    * ending piece backwards with probability ∝ exp(F(i−l) + alpha·lp −
    * F(i)). The stream is COUNTER-MODE splitmix64 seeded by
    * (seed, polynomial word hash) — fully deterministic per (word, seed),
    * engine- and partitioning-independent, so augmentation epochs are
    * reproducible by construction. alpha → ∞ concentrates on the Viterbi
    * path; alpha = 0 samples segmentations uniformly by count mass.
    */
  def sampleSeg(word: String, t: Table, alpha: Double, seed: Long): Array[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Array.empty[String]
    val f = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      f(i) = Double.NegativeInfinity
      var l = 1
      val lMax = math.min(t.maxLen, i)
      while (l <= lMax) {
        val lp = lpOf(t, pieceAt(c, i - l, l), l, alpha)
        if (lp != Double.NegativeInfinity) f(i) = logsumexp(f(i), f(i - l) + lp)
        l += 1
      }
      i += 1
    }
    if (f(n) == Double.NegativeInfinity) return Array(word)
    var h = 0L
    var k = 0
    while (k < word.length) { h = h * 131 + word.charAt(k).toLong; k += 1 }
    val base = splitmix64(seed ^ h)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var pos = n
    var ctr = 0
    while (pos > 0) {
      val u = unit(base, ctr); ctr += 1
      // walk lengths ascending, accumulating normalized posteriors; the
      // fp-slack fallback must land on a VIABLE length (the posteriors
      // sum to ~1 with float error, and an unconditional lMax could name
      // a multi-cp span absent from the vocabulary — a zero-probability,
      // id-less piece)
      var acc = 0.0
      var chosen = -1
      var lastViable = -1
      var l = 1
      val lMax = math.min(t.maxLen, pos)
      while (l <= lMax && chosen < 0) {
        val lp = lpOf(t, pieceAt(c, pos - l, l), l, alpha)
        if (lp != Double.NegativeInfinity) {
          lastViable = l
          acc += math.exp(f(pos - l) + lp - f(pos))
          if (u < acc) chosen = l
        }
        l += 1
      }
      if (chosen < 0) chosen = lastViable // fp slack: last viable length
      out += pieceAt(c, pos - chosen, chosen)
      pos -= chosen
    }
    out.reverseIterator.toArray
  }

  /** Sampled token sequence of a TEXT (per-word FFBS, word order kept). */
  def sampleTokens(t: UTF8String, table: Table, alpha: Double, seed: Long): ArrayData = {
    val w = words(t)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < w.length) {
      sampleSeg(w(i), table, alpha, seed).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Total unigram token count of a TEXT (whitespace words, each Viterbi-
    * segmented).
    */
  def count(t: UTF8String, table: Table): Int = {
    val w = words(t)
    var n = 0
    var i = 0
    while (i < w.length) { n += viterbi(w(i), table).length; i += 1 }
    n
  }

  /** Full unigram token sequence of a TEXT, word order preserved. */
  def tokens(t: UTF8String, table: Table): ArrayData = {
    val w = words(t)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < w.length) {
      viterbi(w(i), table).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Token IDS of a TEXT: Viterbi pieces mapped through the dense
    * piece-ascending vocabulary; an OOV single (no id) encodes -1.
    */
  def tokenIds(t: UTF8String, table: Table): ArrayData = {
    val w = words(t)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < w.length) {
      viterbi(w(i), table).foreach { s =>
        val id = table.ids.get(s)
        out += (if (id == null) -1 else id.intValue())
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** E-step pairs of ONE WORD as (piece, gamma) structs. */
  def estep(t: UTF8String, table: Table): ArrayData = {
    val pairs = expectedCounts(t.toString, table)
    val out = new Array[AnyRef](pairs.length)
    var i = 0
    while (i < pairs.length) {
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(pairs(i)._1), pairs(i)._2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Kernel expression carrying the piece table as a codegen reference
  * object (the piece list is query data, not a compile-time constant).
  */
abstract class UnigramKernelExpression extends UnaryExpression {
  def pieces: Seq[(String, Double)]
  @transient protected lazy val table: UnigramImpl.Table =
    UnigramImpl.tableOf(pieces)

  protected def javaCall(c: String, tableRef: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      "graft.functions.UnigramTable")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${javaCall(c, ref)};")
  }
}

case class UnigramTokenCount(child: Expression, pieces: Seq[(String, Double)])
    extends UnigramKernelExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "unigram_token_count"
  override def nullSafeEval(input: Any): Any =
    UnigramImpl.count(input.asInstanceOf[UTF8String], table)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.UnigramImpl.count($c, $t)"
  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
}

case class UnigramTokens(child: Expression, pieces: Seq[(String, Double)])
    extends UnigramKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_tokens"
  override def nullSafeEval(input: Any): Any =
    UnigramImpl.tokens(input.asInstanceOf[UTF8String], table)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.UnigramImpl.tokens($c, $t)"
  override protected def withNewChildInternal(newChild: Expression): UnigramTokens =
    copy(child = newChild)
}

case class UnigramTokenIds(child: Expression, pieces: Seq[(String, Double)])
    extends UnigramKernelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_token_ids"
  override def nullSafeEval(input: Any): Any =
    UnigramImpl.tokenIds(input.asInstanceOf[UTF8String], table)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.UnigramImpl.tokenIds($c, $t)"
  override protected def withNewChildInternal(newChild: Expression): UnigramTokenIds =
    copy(child = newChild)
}

case class UnigramSampleTokens(child: Expression, pieces: Seq[(String, Double)],
    alpha: Double, seed: Long) extends UnigramKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_sample_tokens"
  override def nullSafeEval(input: Any): Any =
    UnigramImpl.sampleTokens(input.asInstanceOf[UTF8String], table, alpha, seed)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.UnigramImpl.sampleTokens($c, $t, ${alpha}D, ${seed}L)"
  override protected def withNewChildInternal(newChild: Expression): UnigramSampleTokens =
    copy(child = newChild)
}

case class UnigramEStep(child: Expression, pieces: Seq[(String, Double)])
    extends UnigramKernelExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("g", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "unigram_estep"
  override def nullSafeEval(input: Any): Any =
    UnigramImpl.estep(input.asInstanceOf[UTF8String], table)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.UnigramImpl.estep($c, $t)"
  override protected def withNewChildInternal(newChild: Expression): UnigramEStep =
    copy(child = newChild)
}

object UnigramKernels {
  private def unary(f: Expression => Expression)(text: Column): Column =
    GraftColumnBridge.column(f(GraftColumnBridge.expression(text.cast("string"))))

  def unigramTokenCount(text: Column, pieces: Seq[(String, Double)]): Column =
    unary(UnigramTokenCount(_, pieces))(text)

  def unigramTokens(text: Column, pieces: Seq[(String, Double)]): Column =
    unary(UnigramTokens(_, pieces))(text)

  def unigramEStep(word: Column, pieces: Seq[(String, Double)]): Column =
    unary(UnigramEStep(_, pieces))(word)

  def unigramTokenIds(text: Column, pieces: Seq[(String, Double)]): Column =
    unary(UnigramTokenIds(_, pieces))(text)

  def unigramSampleTokens(text: Column, pieces: Seq[(String, Double)],
      alpha: Double, seed: Long): Column =
    unary(UnigramSampleTokens(_, pieces, alpha, seed))(text)
}
