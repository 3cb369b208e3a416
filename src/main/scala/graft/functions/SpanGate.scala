package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass known-boilerplate span removal: given a fixed set of k-token
  * grams (a [[graft.llm.SubstringDedup.duplicatedGrams]] artifact), strip
  * every token covered by an occurrence of any of them from a text — the
  * stateless per-row form of span dedup, usable identically in batch and
  * Structured Streaming (pure map, no shuffle, no state).
  */
object SpanGateImpl {

  def gramSet(grams: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](grams.size * 2)
    grams.foreach(s.add)
    s
  }

  /** Tokens covered by any k-gram occurrence present in `grams` are
    * dropped; survivors re-join with single spaces. A text with NO covered
    * position returns VERBATIM (same contract as the relational
    * removeSpans); a fully-covered text returns "".
    */
  def clean(t: UTF8String, grams: java.util.HashSet[String], k: Int): UTF8String = {
    val str = SigImpl.trimSpaces(t.toString)
    val w = str.split("\\s+", -1)
    if (w.length < k || grams.isEmpty) return t
    val covered = new Array[Boolean](w.length)
    var any = false
    var i = 0
    while (i <= w.length - k) {
      val sb = new java.lang.StringBuilder(w(i))
      var j = 1
      while (j < k) { sb.append(' ').append(w(i + j)); j += 1 }
      if (grams.contains(sb.toString)) {
        any = true
        var p = i
        while (p < i + k) { covered(p) = true; p += 1 }
      }
      i += 1
    }
    if (!any) return t
    // concat_ws semantics: a separator before every element but the first
    // (an empty token still claims its separator), so the relational
    // removeSpans and this kernel agree byte for byte.
    val out = new java.lang.StringBuilder()
    var first = true
    var p = 0
    while (p < w.length) {
      if (!covered(p)) {
        if (!first) out.append(' ')
        out.append(w(p))
        first = false
      }
      p += 1
    }
    UTF8String.fromString(out.toString)
  }
}

case class RemoveKnownSpans(child: Expression, grams: Seq[String], k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  @transient private lazy val set: java.util.HashSet[String] = SpanGateImpl.gramSet(grams)
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_known_spans"
  override def nullSafeEval(input: Any): Any =
    SpanGateImpl.clean(input.asInstanceOf[UTF8String], set, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanGrams", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanGateImpl.clean($c, $ref, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): RemoveKnownSpans =
    copy(child = newChild)
}

object SpanGate {
  def removeKnownSpans(text: Column, grams: Seq[String], k: Int): Column =
    GraftColumnBridge.column(
      RemoveKnownSpans(GraftColumnBridge.expression(text.cast("string")), grams, k))
}

/** One-pass hashed-linear score: tokenize, poly-fingerprint each token to
  * a weight bucket, sum micro-unit weights — the whole classifier score in
  * one compiled loop per ROW. Same values as the exploded
  * [[graft.llm.QualityModel.scoreBy]] aggregation (spec-pinned), but a
  * PURE MAP: no explode, no shuffle, stateless — the scale path for
  * applying a trained model to 100 TB, and the streaming-gate form.
  */
object HashedLinearScoreImpl {
  def score(t: UTF8String, w: Array[Long]): Long = {
    val n = w.length
    // UTF8String.toLowerCase = Spark's `lower(...)` exactly (Java
    // Locale-based lowercasing differs on Unicode edge cases)
    val toks = SigImpl.trimSpaces(t.toLowerCase.toString).split("\\s+", -1)
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      sum += w((SigImpl.polyFp(toks(i)) % n).toInt)
      i += 1
    }
    sum
  }
}

case class HashedLinearScore(child: Expression, weightsMicro: Array[Long])
    extends UnaryExpression {
  require(weightsMicro.nonEmpty, "weights must be non-empty")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hashed_linear_score"
  override def nullSafeEval(input: Any): Any =
    HashedLinearScoreImpl.score(input.asInstanceOf[UTF8String], weightsMicro)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qmodelWeights", weightsMicro, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedLinearScoreImpl.score($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}
