package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass byte-pair-encoding kernels: apply a trained merge list to text
  * in a single compiled loop per row (the [[SigKernels]] discipline — no
  * per-token UDF, participates in whole-stage codegen via
  * `ctx.addReferenceObj` for the rank table).
  *
  * The merge list is DATA (produced by [[graft.llm.Bpe.train]]'s
  * distributed pair-count loop), baked into the expression instance —
  * exactly how a production pipeline ships a tokenizer: train once, apply
  * as a broadcast-small pure map over the corpus.
  */
object BpeImpl {

  /** Rank table from an ordered merge list: key "a b" → merge priority
    * (lower = earlier = higher priority). Symbols never contain whitespace
    * (words are whitespace-tokenized first), so the space join is
    * unambiguous.
    */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    merges.foreach { case (a, b) => m.put(a + " " + b, i); i += 1 }
    m
  }

  /** Greedy BPE segmentation of ONE word: start from code-point symbols;
    * repeatedly merge every left-to-right non-overlapping occurrence of the
    * present pair with the best (lowest) rank, until no adjacent pair is in
    * the table. The standard apply algorithm — merge ORDER is priority
    * order, not text order, so "abc" with ranks {bc:0, ab:1} becomes
    * [a, bc].
    */
  def segment(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    var syms = {
      val cps = word.codePoints().toArray
      val a = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) { a(i) = new String(Character.toChars(cps(i))); i += 1 }
      a
    }
    var done = ranks.isEmpty
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // Ranks are UNIQUE (index in the merge list), so rank == bestRank
        // identifies the best pair without re-concatenating for a string
        // compare — one lookup per position in this pass, not two plus
        // two concats (this kernel is the per-row hot loop of the bpe /
        // packing / fertility families; allocation here is the cost).
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          var merged = false
          if (j < syms.length - 1) {
            val r = ranks.get(syms(j) + " " + syms(j + 1))
            if (r != null && r.intValue() == bestRank) {
              out += syms(j) + syms(j + 1); j += 2; merged = true
            }
          }
          if (!merged) { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  private def words(t: UTF8String): Array[String] =
    SigImpl.trimSpaces(t.toString).split("\\s+", -1)

  /** Total BPE token count of a TEXT (whitespace words, each segmented). */
  def count(t: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    val w = words(t)
    var n = 0
    var i = 0
    while (i < w.length) { n += segment(w(i), ranks).length; i += 1 }
    n
  }

  /** Full BPE token sequence of a TEXT, word order preserved. */
  def tokens(t: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val w = words(t)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < w.length) {
      segment(w(i), ranks).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Adjacent segment pairs ("a b") of ONE WORD under the current merges,
    * with multiplicity — the training loop's per-word pair emitter.
    */
  def pairs(t: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val syms = segment(t.toString, ranks)
    if (syms.length < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](syms.length - 1)
    var i = 0
    while (i < syms.length - 1) {
      out(i) = UTF8String.fromString(syms(i) + " " + syms(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Kernel expression carrying the rank table as a codegen reference object
  * (the merge list is query data, not a compile-time constant).
  */
abstract class BpeKernelExpression extends UnaryExpression {
  def merges: Seq[(String, String)]
  @transient protected lazy val ranks: java.util.HashMap[String, Integer] =
    BpeImpl.ranksOf(merges)

  /** Java call over (child UTF8String variable, ranks field name). */
  protected def javaCall(c: String, ranksRef: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${javaCall(c, ref)};")
  }
}

case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends BpeKernelExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"
  override def nullSafeEval(input: Any): Any =
    BpeImpl.count(input.asInstanceOf[UTF8String], ranks)
  override protected def javaCall(c: String, r: String): String =
    s"graft.functions.BpeImpl.count($c, $r)"
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends BpeKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"
  override def nullSafeEval(input: Any): Any =
    BpeImpl.tokens(input.asInstanceOf[UTF8String], ranks)
  override protected def javaCall(c: String, r: String): String =
    s"graft.functions.BpeImpl.tokens($c, $r)"
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

case class BpeWordPairs(child: Expression, merges: Seq[(String, String)])
    extends BpeKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_word_pairs"
  override def nullSafeEval(input: Any): Any =
    BpeImpl.pairs(input.asInstanceOf[UTF8String], ranks)
  override protected def javaCall(c: String, r: String): String =
    s"graft.functions.BpeImpl.pairs($c, $r)"
  override protected def withNewChildInternal(newChild: Expression): BpeWordPairs =
    copy(child = newChild)
}

object BpeKernels {
  private def unary(f: Expression => Expression)(text: Column): Column =
    GraftColumnBridge.column(f(GraftColumnBridge.expression(text.cast("string"))))

  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    unary(BpeTokenCount(_, merges))(text)

  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    unary(BpeTokens(_, merges))(text)

  def bpeWordPairs(word: Column, merges: Seq[(String, String)]): Column =
    unary(BpeWordPairs(_, merges))(word)
}
