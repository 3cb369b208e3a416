package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftColumnBridge}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the bounded-memory
  * counterpart of [[graft.ops.Profiling.heavyHitters]]'s exact hash
  * aggregate. The exact path shuffles one partial row per DISTINCT value
  * per partition; over a web-scale token stream (10¹⁰⁺ distinct terms)
  * that aggregate state is itself the bottleneck. The sketch replaces it
  * with a fixed `d×w` counter grid: partials merge by element-wise sum
  * (one 32 KB buffer per partition crosses the wire, regardless of
  * cardinality), estimates only ever OVER-count (min over d rows), and a
  * second pass keeps rows whose term clears the threshold — so the exact
  * confirm aggregates only the cleared slice and the final answer equals
  * the exact one. See [[graft.ops.Profiling.cmsHeavyHitters]].
  *
  * Hash family: row r maps term t to `((2r+1)·polyFp(t) + 31r+7) mod P
  * mod w` — the [[SigImpl.minhashPoly]] family, shared verbatim between
  * the aggregator (build) and the codegen'd estimate expression (probe),
  * and restatable in SQL if an oracle ever needs the raw grid.
  */
object CmsImpl {
  val P = 1000000007L

  def index(term: String, r: Int, w: Int): Int = {
    val h = ((2L * r + 1) * SigImpl.polyFp(term) + (31L * r + 7)) % P
    (h % w).toInt
  }

  def estimate(term: UTF8String, sketch: Array[Long], d: Int, w: Int): Long = {
    val s = term.toString
    var m = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = sketch(r * w + index(s, r, w))
      if (c < m) m = c
      r += 1
    }
    m
  }
}

/** Mergeable CMS build: `Aggregator[term, grid, grid]` with map-side
  * partials — `d·w` longs per partition cross the shuffle, never the
  * distinct-value set.
  */
class CmsAgg(d: Int, w: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  require(d >= 1 && w >= 2, s"need d >= 1, w >= 2, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(acc: Array[Long], term: String): Array[Long] = {
    if (term != null) {
      var r = 0
      while (r < d) { acc(r * w + CmsImpl.index(term, r, w)) += 1; r += 1 }
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Array[Long] = acc
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Codegen'd probe: `cms_estimate(term)` against a FROZEN grid riding the
  * expression via `addReferenceObj` (the [[BpeKernels]] discipline — no
  * per-row array literal in the plan, no broadcast-variable plumbing).
  * Estimates are exact-or-over, never under.
  */
case class CmsEstimate(child: Expression, sketch: Array[Long], d: Int, w: Int)
    extends UnaryExpression {
  require(sketch.length == d * w, s"grid must be d*w = ${d * w}, got ${sketch.length}")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullSafeEval(input: Any): Any =
    CmsImpl.estimate(input.asInstanceOf[UTF8String], sketch, d, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsGrid", sketch, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CmsImpl.estimate($c, $ref, $d, $w);")
  }
  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsSketch {
  /** Untyped build column: `df.agg(CmsSketch.build(d, w)(col))`. */
  def build(d: Int, w: Int)(c: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new CmsAgg(d, w), Encoders.STRING)(c)
  }

  /** Probe column against a frozen grid. */
  def estimate(c: Column, sketch: Array[Long], d: Int, w: Int): Column =
    GraftColumnBridge.column(
      CmsEstimate(GraftColumnBridge.expression(c.cast("string")), sketch, d, w))
}
