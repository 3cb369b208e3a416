package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer kernels (Schuster & Nakajima 2012; the BERT
  * tokenizer, Devlin et al. 2019): greedy longest-match-first
  * segmentation against a piece vocabulary where non-word-initial pieces
  * carry the `##` continuation prefix. Completes the tokenizer trio next
  * to [[BpeKernels]] (merge-rank greedy) and [[UnigramKernels]] (Viterbi)
  * — the three production subword schemes, one codegen discipline: the
  * vocabulary is DATA baked in via `ctx.addReferenceObj`, the per-row
  * work is one compiled loop, no UDF boundary, no shuffle.
  *
  * Semantics (the HuggingFace `WordPiece` contract):
  *   - text splits on whitespace into words;
  *   - each word segments greedily: at each position take the LONGEST
  *     vocabulary piece (`##`-prefixed when not at word start);
  *   - if no piece matches at some position, the WHOLE word becomes one
  *     `unk` token (classic WordPiece, not a per-char fallback).
  *
  * All indexing is in code points (surrogate-safe): piece boundaries
  * never split a supplementary character.
  */
final class WordPieceTable(
    val vocab: java.util.HashSet[String],
    /** longest piece length in code points, `##` prefix NOT counted */
    val maxLen: Int,
    val unk: String) extends Serializable

object WordPieceImpl {

  type Table = WordPieceTable

  def tableOf(pieces: Seq[String], unk: String): Table = {
    val set = new java.util.HashSet[String](pieces.size * 2)
    var maxLen = 1
    pieces.foreach { p =>
      require(p.nonEmpty, "empty piece in WordPiece vocabulary")
      set.add(p)
      val body = if (p.startsWith("##")) p.substring(2) else p
      val n = body.codePointCount(0, body.length)
      if (n > maxLen) maxLen = n
    }
    new WordPieceTable(set, maxLen, unk)
  }

  /** Greedy longest-match segmentation of ONE word; `Array(unk)` when the
    * word cannot be covered.
    */
  def segment(word: String, t: Table): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val n = word.length
    var i = 0 // char index, always on a code-point boundary
    while (i < n) {
      // Longest piece starting at i: scan candidate end from the farthest
      // code-point boundary down.
      var e = i
      var cps = 0
      while (e < n && cps < t.maxLen) {
        e += Character.charCount(word.codePointAt(e))
        cps += 1
      }
      var hit: String = null
      while (hit == null && e > i) {
        val cand =
          if (i == 0) word.substring(i, e)
          else "##" + word.substring(i, e)
        if (t.vocab.contains(cand)) hit = cand
        else {
          // step e back one code point
          e -= 1
          if (e > i && Character.isLowSurrogate(word.charAt(e))) e -= 1
        }
      }
      if (hit == null) return Array(t.unk)
      out += hit
      i = e
    }
    out.toArray
  }

  private def words(t: UTF8String): Array[String] =
    SigImpl.trimSpaces(t.toString).split("\\s+", -1)

  /** Total WordPiece token count of a TEXT (whitespace words, each
    * segmented; an uncoverable word counts 1 — its `unk`).
    */
  def count(t: UTF8String, table: Table): Int = {
    val w = words(t)
    var n = 0
    var i = 0
    while (i < w.length) {
      if (w(i).nonEmpty) n += segment(w(i), table).length
      i += 1
    }
    n
  }

  /** Full WordPiece token sequence of a TEXT, word order preserved. */
  def tokens(t: UTF8String, table: Table): ArrayData = {
    val w = words(t)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < w.length) {
      if (w(i).nonEmpty)
        segment(w(i), table).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Kernel expression carrying the vocabulary as a codegen reference
  * object (the vocab is query data, not a compile-time constant).
  */
abstract class WordPieceKernelExpression extends UnaryExpression {
  def pieces: Seq[String]
  def unk: String
  @transient protected lazy val table: WordPieceImpl.Table =
    WordPieceImpl.tableOf(pieces, unk)

  protected def javaCall(c: String, tableRef: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceTable", table,
      "graft.functions.WordPieceTable")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${javaCall(c, ref)};")
  }
}

case class WordPieceTokenCount(child: Expression, pieces: Seq[String], unk: String)
    extends WordPieceKernelExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "wordpiece_token_count"
  override def nullSafeEval(input: Any): Any =
    WordPieceImpl.count(input.asInstanceOf[UTF8String], table)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.WordPieceImpl.count($c, $t)"
  override protected def withNewChildInternal(newChild: Expression): WordPieceTokenCount =
    copy(child = newChild)
}

case class WordPieceTokens(child: Expression, pieces: Seq[String], unk: String)
    extends WordPieceKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_tokens"
  override def nullSafeEval(input: Any): Any =
    WordPieceImpl.tokens(input.asInstanceOf[UTF8String], table)
  override protected def javaCall(c: String, t: String): String =
    s"graft.functions.WordPieceImpl.tokens($c, $t)"
  override protected def withNewChildInternal(newChild: Expression): WordPieceTokens =
    copy(child = newChild)
}

object WordPieceKernels {
  private def unary(f: Expression => Expression)(text: Column): Column =
    GraftColumnBridge.column(f(GraftColumnBridge.expression(text.cast("string"))))

  def wordpieceTokenCount(text: Column, pieces: Seq[String],
      unk: String = "[UNK]"): Column =
    unary(WordPieceTokenCount(_, pieces, unk))(text)

  def wordpieceTokens(text: Column, pieces: Seq[String],
      unk: String = "[UNK]"): Column =
    unary(WordPieceTokens(_, pieces, unk))(text)
}
