package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** A FROZEN Stupid-Backoff bigram LM — the deployable artifact of
  * [[graft.llm.TextAnalysis.bigramBackoffScoreAgainst]]'s training side.
  * CCNet's production shape is exactly this: the LM is trained once on the
  * reference corpus and shipped to every worker as a binary (their KenLM
  * file); scoring is then a pure per-document function with NO joins and
  * NO state, which is what lets the same gate run over a batch backfill
  * and a live stream unchanged.
  *
  * Size discipline: the maps are O(reference vocab + reference bigram
  * vocab) — the trained artifact, not the corpus (same boundedness
  * argument as a benchmark gram catalog or a BPE merge list). The flat
  * `"prev w"` bigram key is unambiguous because tokens are `\s+`-split:
  * no token contains whitespace.
  */
final case class FrozenLm(
    unigrams: Map[String, Long],
    bigrams: Map[String, Long],
    total: Long,
    alphaNum: Long,
    alphaDen: Long) extends Serializable {
  @transient lazy val cuMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }
  @transient lazy val cbMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](bigrams.size * 2)
    bigrams.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }
}

/** Static scoring loops — BIT-IDENTICAL to the relational formulation:
  * same tokenization (lower → trim → `\s+`-split, Spark's limit = -1),
  * same fixed-point integer log per position (FixedPointLog.lnNanoRef —
  * the one algorithm all three engines run) with the shared half-up
  * nano→micro grain step BEFORE the sum. q_lm_frozen pins kernel ==
  * join-pipeline against the same DuckDB oracle.
  */
object LmImpl {

  private def toks(t: UTF8String): Array[String] =
    t.toLowerCase.trim.toString.split("\\s+", -1)

  def logpMicro(t: UTF8String, lm: FrozenLm): Long = {
    import FixedPointLog.{lnNanoRef, microOfNanoRef}
    val ts = toks(t)
    var sum = 0L; var i = 0; var prev: String = null
    while (i < ts.length) {
      val w = ts(i)
      val cbw = if (prev != null) lm.cbMap.get(prev + " " + w) else null
      if (cbw != null) {
        val cprev = lm.cuMap.get(prev) // bigram seen ⇒ prev seen
        sum += microOfNanoRef(lnNanoRef(cbw.longValue(), cprev.longValue()))
      } else {
        val cw = lm.cuMap.get(w)
        val c = if (cw == null) 1L else cw.longValue()
        sum += microOfNanoRef(lnNanoRef(lm.alphaNum * c, lm.alphaDen * lm.total))
      }
      prev = w; i += 1
    }
    sum
  }

  def bigramHits(t: UTF8String, lm: FrozenLm): Long = {
    val ts = toks(t)
    var hits = 0L; var i = 1
    while (i < ts.length) {
      if (lm.cbMap.get(ts(i - 1) + " " + ts(i)) != null) hits += 1
      i += 1
    }
    hits
  }
}

/** Kernel expressions carrying the frozen LM as a codegen reference object
  * (the LM is query data, not a compile-time constant) — one linear pass
  * per document inside whole-stage codegen.
  */
abstract class LmKernelExpression extends UnaryExpression {
  def lm: FrozenLm
  override def dataType: DataType = LongType
  protected def javaCall(c: String, ref: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("frozenLm", lm, "graft.functions.FrozenLm")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${javaCall(c, ref)};")
  }
}

case class LmLogpMicro(child: Expression, lm: FrozenLm) extends LmKernelExpression {
  override def prettyName: String = "lm_logp_micro"
  override def nullSafeEval(input: Any): Any =
    LmImpl.logpMicro(input.asInstanceOf[UTF8String], lm)
  override protected def javaCall(c: String, r: String): String =
    s"graft.functions.LmImpl.logpMicro($c, $r)"
  override protected def withNewChildInternal(newChild: Expression): LmLogpMicro =
    copy(child = newChild)
}

case class LmBigramHits(child: Expression, lm: FrozenLm) extends LmKernelExpression {
  override def prettyName: String = "lm_bigram_hits"
  override def nullSafeEval(input: Any): Any =
    LmImpl.bigramHits(input.asInstanceOf[UTF8String], lm)
  override protected def javaCall(c: String, r: String): String =
    s"graft.functions.LmImpl.bigramHits($c, $r)"
  override protected def withNewChildInternal(newChild: Expression): LmBigramHits =
    copy(child = newChild)
}

object LmKernels {
  private def unary(f: Expression => Expression)(text: Column): Column =
    GraftColumnBridge.column(f(GraftColumnBridge.expression(text.cast("string"))))

  /** Per-document Stupid-Backoff log-probability in integer micro-nats. */
  def lmLogpMicro(text: Column, lm: FrozenLm): Column =
    unary(LmLogpMicro(_, lm))(text)

  /** Per-document count of positions whose bigram the LM has seen. */
  def lmBigramHits(text: Column, lm: FrozenLm): Column =
    unary(LmBigramHits(_, lm))(text)
}
