package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching kernels — the C4 badwords gate
  * (Raffel et al. 2020 §2.2 drops any page containing a word from a
  * blocklist; the published list is thousands of entries).
  *
  * Why an automaton and not N `contains` calls: the naive gate is
  * O(patterns × text) per row — at a 100 TB corpus with a 2k-entry
  * blocklist that is a 2000× scan blow-up. The Aho–Corasick automaton
  * (Aho & Corasick 1975, CACM 18(6)) matches ALL patterns in one
  * O(text + matches) pass, independent of pattern count. The automaton
  * is built ONCE per expression (driver-side, O(Σ pattern lengths)) and
  * rides into codegen as a reference object — the corpus-side work is a
  * single compiled scan per row, inside whole-stage codegen, no UDF
  * boundary, no shuffle ([[BpeKernels]]/[[UnigramKernels]] discipline).
  *
  * Match contract (engine-neutral, SQL-replayable): an occurrence of
  * pattern `p` at chars `[s, e)` of `text` COUNTS iff it sits on word
  * boundaries — `s == 0` or `text[s-1]` is not ASCII alphanumeric, and
  * `e == len` or `text[e]` is not ASCII alphanumeric. This is C4's
  * "appears on a word boundary" rule; the DuckDB oracle replays it as
  * `regexp_matches(text, '(^|[^a-z0-9])' || p || '([^a-z0-9]|$)')` for
  * lowercase regex-safe patterns (the OPERATOR takes arbitrary literal
  * strings — no regex anywhere in the engine path). Matching is
  * case-sensitive; callers compose `lower()` when they want the
  * case-insensitive gate. Phrases work unchanged (the space is one more
  * literal char on the trie path).
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  // Trie over UTF-16 char units (literal matching — a surrogate pair is
  // two consecutive units on the path, which is exact for containment).
  // Nodes are growable parallel arrays; per-node transitions live in one
  // shared open-addressed map keyed (node << 16 | char) — O(1) expected,
  // no per-node allocation.
  private var nNodes = 1
  private var fail: Array[Int] = null
  // First pattern id ending at this node (-1 if none); extra ids chain
  // through `nextOut` (a pattern set can contain duplicates-free strings,
  // so one id per node + the dict-suffix chain enumerates all matches).
  private var out: Array[Int] = null
  // Dictionary-suffix link: deepest proper suffix of this node that is a
  // pattern end — following it enumerates every pattern ending here.
  private var dict: Array[Int] = null
  private var depth: Array[Int] = null

  // Open-addressed (node, char) -> next transition table.
  private var tKeys: Array[Long] = null
  private var tVals: Array[Int] = null
  private var tMask = 0
  private var tSize = 0

  val nPatterns: Int = patterns.length

  private def tPut(node: Int, c: Char, next: Int): Unit = {
    if ((tSize + 1) * 4 > tMask * 3) tGrow()
    val key = (node.toLong << 21) | c.toLong
    var i = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & tMask
    while (tVals(i) != 0 && tKeys(i) != key) i = (i + 1) & tMask
    if (tVals(i) == 0) { tKeys(i) = key; tVals(i) = next + 1; tSize += 1 }
  }

  private def tGet(node: Int, c: Char): Int = {
    val key = (node.toLong << 21) | c.toLong
    var i = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & tMask
    while (tVals(i) != 0) {
      if (tKeys(i) == key) return tVals(i) - 1
      i = (i + 1) & tMask
    }
    -1
  }

  private def tGrow(): Unit = {
    val ok = tKeys; val ov = tVals
    val cap = if (tMask == 0) 1 << 10 else (tMask + 1) << 1
    tKeys = new Array[Long](cap); tVals = new Array[Int](cap); tMask = cap - 1; tSize = 0
    if (ov != null) {
      var i = 0
      while (i < ov.length) {
        if (ov(i) != 0) {
          val key = ok(i)
          var j = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & tMask
          while (tVals(j) != 0) j = (j + 1) & tMask
          tKeys(j) = key; tVals(j) = ov(i); tSize += 1
        }
        i += 1
      }
    }
  }

  // ---- build ----
  {
    require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
    val cap0 = math.max(16, patterns.map(_.length).sum + 1)
    out = Array.fill(cap0)(-1)
    depth = new Array[Int](cap0)
    tGrow()
    var pid = 0
    while (pid < patterns.length) {
      val p = patterns(pid)
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        var nxt = tGet(node, c)
        if (nxt < 0) {
          nxt = nNodes; nNodes += 1
          if (nNodes > out.length) {
            out = java.util.Arrays.copyOf(out, out.length * 2)
            java.util.Arrays.fill(out, nNodes, out.length, -1)
            depth = java.util.Arrays.copyOf(depth, depth.length * 2)
          }
          out(nxt) = -1
          depth(nxt) = depth(node) + 1
          tPut(node, c, nxt)
        }
        node = nxt
        i += 1
      }
      // Duplicate patterns collapse to the same node; first id wins (the
      // matched-set output is distinct anyway).
      if (out(node) < 0) out(node) = pid
      pid += 1
    }
    // BFS fail + dict links.
    fail = new Array[Int](nNodes)
    dict = Array.fill(nNodes)(-1)
    val queue = new java.util.ArrayDeque[Integer]()
    // Children of root fail to root. Walk the transition table once to
    // collect edges grouped by source (table iteration order is fine —
    // BFS only needs level order, which we get via the queue).
    val childrenOf = Array.fill(nNodes)(List.empty[(Char, Int)])
    var ti = 0
    while (ti < tVals.length) {
      if (tVals(ti) != 0) {
        val key = tKeys(ti)
        val node = (key >>> 21).toInt
        val c = (key & 0x1fffffL).toChar
        childrenOf(node) = (c, tVals(ti) - 1) :: childrenOf(node)
      }
      ti += 1
    }
    childrenOf(0).foreach { case (_, child) =>
      fail(child) = 0
      queue.add(child)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // dict link: nearest fail-ancestor that ends a pattern.
      dict(u) = if (out(fail(u)) >= 0) fail(u) else dict(fail(u))
      childrenOf(u).foreach { case (c, v) =>
        // fail(v): longest proper suffix of path(v) present in the trie.
        var f = fail(u)
        var nxt = tGet(f, c)
        while (nxt < 0 && f != 0) { f = fail(f); nxt = tGet(f, c) }
        fail(v) = if (nxt >= 0 && nxt != v) nxt else 0
        queue.add(v)
      }
    }
  }

  @inline private def alnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def step(nodeIn: Int, c: Char): Int = {
    var node = nodeIn
    var nxt = tGet(node, c)
    while (nxt < 0 && node != 0) { node = fail(node); nxt = tGet(node, c) }
    if (nxt >= 0) nxt else 0
  }

  /** Does `[s, e)` sit on word boundaries in `t`? */
  @inline private def bounded(t: String, s: Int, e: Int): Boolean =
    (s == 0 || !alnum(t.charAt(s - 1))) && (e == t.length || !alnum(t.charAt(e)))

  /** All distinct pattern ids with a boundary-valid occurrence, as a
    * seen-bitmap. O(text + matches).
    */
  def matchedIds(text: String): Array[Boolean] = {
    val seen = new Array[Boolean](nPatterns)
    var node = 0
    var i = 0
    while (i < text.length) {
      node = step(node, text.charAt(i))
      var m = if (out(node) >= 0) node else dict(node)
      while (m >= 0) {
        val pid = out(m)
        if (!seen(pid) && bounded(text, i + 1 - depth(m), i + 1)) seen(pid) = true
        m = dict(m)
      }
      i += 1
    }
    seen
  }

  /** True iff ANY pattern has a boundary-valid occurrence — early-exits
    * on the first hit (the gate path: most docs are clean OR dirty fast).
    */
  def anyMatch(text: String): Boolean = {
    var node = 0
    var i = 0
    while (i < text.length) {
      node = step(node, text.charAt(i))
      var m = if (out(node) >= 0) node else dict(node)
      while (m >= 0) {
        if (bounded(text, i + 1 - depth(m), i + 1)) return true
        m = dict(m)
      }
      i += 1
    }
    false
  }
}

object AcImpl {
  /** Sorted distinct matched patterns (binary/code-unit string order —
    * matches both Spark's `array_sort` and DuckDB's default binary
    * collation for `ORDER BY`).
    */
  def matches(text: UTF8String, ac: AcAutomaton): GenericArrayData = {
    val seen = ac.matchedIds(text.toString)
    val hits = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < seen.length) { if (seen(i)) hits += ac.patterns(i); i += 1 }
    val sorted = hits.sortWith(_.compareTo(_) < 0)
    val out = new Array[AnyRef](sorted.length)
    i = 0
    while (i < sorted.length) { out(i) = UTF8String.fromString(sorted(i)); i += 1 }
    new GenericArrayData(out)
  }

  def anyMatch(text: UTF8String, ac: AcAutomaton): Boolean =
    ac.anyMatch(text.toString)
}

/** Base for kernels carrying the compiled automaton as a codegen
  * reference object (the blocklist is query data, not a compile-time
  * constant — [[UnigramKernelExpression]] discipline).
  */
abstract class AcKernelExpression extends UnaryExpression {
  def patterns: Seq[String]
  @transient protected lazy val automaton: AcAutomaton =
    new AcAutomaton(patterns.toArray)

  protected def javaCall(c: String, acRef: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${javaCall(c, ref)};")
  }
}

/** Sorted distinct blocklist patterns occurring (word-bounded) in the text. */
case class AcMatches(child: Expression, patterns: Seq[String])
    extends AcKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ac_matches"
  override def nullSafeEval(input: Any): Any =
    AcImpl.matches(input.asInstanceOf[UTF8String], automaton)
  override protected def javaCall(c: String, ac: String): String =
    s"graft.functions.AcImpl.matches($c, $ac)"
  override protected def withNewChildInternal(newChild: Expression): AcMatches =
    copy(child = newChild)
}

/** True iff any blocklist pattern occurs (word-bounded) — early-exit scan. */
case class AcAnyMatch(child: Expression, patterns: Seq[String])
    extends AcKernelExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "ac_any_match"
  override def nullSafeEval(input: Any): Any =
    AcImpl.anyMatch(input.asInstanceOf[UTF8String], automaton)
  override protected def javaCall(c: String, ac: String): String =
    s"graft.functions.AcImpl.anyMatch($c, $ac)"
  override protected def withNewChildInternal(newChild: Expression): AcAnyMatch =
    copy(child = newChild)
}

object AcKernels {
  private def unary(f: Expression => Expression)(text: Column): Column =
    GraftColumnBridge.column(f(GraftColumnBridge.expression(text.cast("string"))))

  def acMatches(text: Column, patterns: Seq[String]): Column =
    unary(AcMatches(_, patterns))(text)

  def acAnyMatch(text: Column, patterns: Seq[String]): Column =
    unary(AcAnyMatch(_, patterns))(text)
}
