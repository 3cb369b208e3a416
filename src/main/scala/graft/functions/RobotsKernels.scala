package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing — the crawl-compliance side the robots-META gate
  * ([[HtmlKernels.robotsNoindex]]) does not cover: `/robots.txt` governs
  * which PATHS may be fetched at all, and a curation pipeline that rebuilds
  * a crawl frontier (or audits an existing one) needs it as data.
  *
  * Parsed subset (the classic grammar; one linear pass over the file):
  *  - lines end at `\n` (a trailing `\r` is trimmed); `#` starts a comment;
  *  - directives match case-insensitively: `User-agent`, `Disallow`,
  *    `Allow` — anything else (Sitemap, Crawl-delay, …) is skipped;
  *  - consecutive `User-agent` lines open a record shared by those agents;
  *    a `User-agent` line after rules starts a NEW record;
  *  - only records naming agent `*` contribute (this library models a
  *    generic research crawler, not per-bot identities);
  *  - rules keep file order as `(allow, prefix)` structs; an empty
  *    `Disallow:` value (the "allow everything" idiom) contributes no rule,
  *    which downstream longest-prefix matching treats identically.
  *
  * Matching itself (longest prefix wins, ties prefer Allow — the published
  * Google/REP semantics) lives in [[graft.llm.RobotsTxt]] as a relational
  * fold so the per-URL decision stays a broadcast-join projection.
  */
object RobotsImpl {

  private def directive(line: String, name: String): String = {
    // returns the trimmed value if `line` starts with `name:` (ci), else null
    if (line.length < name.length + 1) return null
    var i = 0
    while (i < name.length) {
      if (Character.toLowerCase(line.charAt(i)) != name.charAt(i)) return null
      i += 1
    }
    // optional whitespace between name and ':'
    while (i < line.length && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1
    if (i >= line.length || line.charAt(i) != ':') return null
    line.substring(i + 1).trim
  }

  /** `Sitemap:` directive values, file order — agent-independent per the
    * REP (sitemaps sit outside user-agent records), so this scan ignores
    * grouping entirely. The crawl-frontier seed source.
    */
  def sitemaps(input: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    for (raw <- input.toString.split('\n')) {
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val sm = directive(line, "sitemap")
        if (sm != null && sm.nonEmpty) out += UTF8String.fromString(sm)
      }
    }
    new GenericArrayData(out.toArray)
  }

  def wildcardRules(input: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var inAgents = false   // inside a run of consecutive User-agent lines
    var applies = false    // current record names agent "*"
    for (raw <- input.toString.split('\n')) {
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
        .stripSuffix("\r")
      if (line.nonEmpty) {
        val ua = directive(line, "user-agent")
        if (ua != null) {
          if (!inAgents) { inAgents = true; applies = false } // new record
          if (ua == "*") applies = true
        } else {
          inAgents = false
          val dis = directive(line, "disallow")
          val allow = if (dis == null) directive(line, "allow") else null
          if (applies) {
            if (dis != null && dis.nonEmpty)
              out += new GenericInternalRow(Array[Any](false, UTF8String.fromString(dis)))
            else if (allow != null && allow.nonEmpty)
              out += new GenericInternalRow(Array[Any](true, UTF8String.fromString(allow)))
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** RFC 9309 path-pattern match: `*` matches any character sequence
    * (including empty, including `/`), a TERMINAL `$` anchors the pattern
    * to the path end (elsewhere `$` is literal), and an unanchored pattern
    * matches any path PREFIX (modeled as an implicit trailing `*`).
    * Iterative two-pointer glob with single-star backtracking — linear in
    * practice, no regex engine.
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val base = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val p = if (anchored) base else base + "*"
    var pi = 0; var si = 0; var star = -1; var mark = 0
    while (si < path.length) {
      if (pi < p.length && p.charAt(pi) == '*') { star = pi; mark = si; pi += 1 }
      else if (pi < p.length && p.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** RFC 9309 allow/deny decision for one path against a parsed rules
    * array ([[wildcardRules]] layout): the most specific matching rule —
    * most octets in the pattern as written — wins; at equal length Allow
    * beats Disallow; no matching rule means allowed. One compiled scan
    * over a tens-of-entries array per URL, replacing the interpreted
    * higher-order fold (and extending it: the fold was prefix-only, so
    * a glob rule like `Disallow: "/" "*" ".pdf$"` silently never matched).
    */
  def allowedPath(rules: ArrayData, path: UTF8String): Boolean = {
    val s = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.numElements()) {
      val r = rules.getStruct(i, 2)
      val allow = r.getBoolean(0)
      val pat = r.getUTF8String(1).toString
      if (patternMatches(pat, s)) {
        val l = pat.length
        if (l > bestLen || (l == bestLen && allow)) { bestLen = l; bestAllow = allow }
      }
      i += 1
    }
    bestAllow
  }

  /** The wildcard-agent record's `Crawl-delay` in whole seconds (ceil of
    * a decimal value — the conservative read), or null when no applying
    * record carries one / the value does not parse. Record grouping is
    * IDENTICAL to [[wildcardRules]]: a googlebot-only record's delay must
    * not throttle a generic crawler. First applying directive wins.
    */
  def crawlDelaySeconds(input: UTF8String): Any = {
    var inAgents = false
    var applies = false
    for (raw <- input.toString.split('\n')) {
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
        .stripSuffix("\r")
      if (line.nonEmpty) {
        val ua = directive(line, "user-agent")
        if (ua != null) {
          if (!inAgents) { inAgents = true; applies = false }
          if (ua == "*") applies = true
        } else {
          inAgents = false
          val cd = directive(line, "crawl-delay")
          if (applies && cd != null && cd.nonEmpty) {
            try return math.ceil(cd.toDouble).toLong
            catch { case _: NumberFormatException => () }
          }
        }
      }
    }
    null
  }
}

/** Codegen wrapper for [[RobotsImpl.wildcardRules]]:
  * `robots_rules(txt)` → `array<struct<allow:boolean, prefix:string>>`
  * in file order (empty array when no wildcard-agent record exists).
  */
case class RobotsWildcardRules(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("allow", BooleanType, nullable = false),
      StructField("prefix", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "robots_rules"
  override def nullSafeEval(input: Any): Any =
    RobotsImpl.wildcardRules(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.RobotsImpl.wildcardRules($c);")
  override protected def withNewChildInternal(newChild: Expression): RobotsWildcardRules =
    copy(child = newChild)
}

/** Codegen wrapper for [[RobotsImpl.sitemaps]]: `robots_sitemaps(txt)` →
  * `array<string>` of Sitemap directive values in file order.
  */
case class RobotsSitemaps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "robots_sitemaps"
  override def nullSafeEval(input: Any): Any =
    RobotsImpl.sitemaps(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.RobotsImpl.sitemaps($c);")
  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}

/** Codegen wrapper for [[RobotsImpl.crawlDelaySeconds]]:
  * `robots_crawl_delay(txt)` → nullable BIGINT seconds.
  */
case class RobotsCrawlDelay(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"
  override def nullSafeEval(input: Any): Any =
    RobotsImpl.crawlDelaySeconds(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object cdRes = graft.functions.RobotsImpl.crawlDelaySeconds($c);
      if (cdRes == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) cdRes).longValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): RobotsCrawlDelay =
    copy(child = newChild)
}

/** Codegen wrapper for [[RobotsImpl.allowedPath]]:
  * `robots_allowed(rules, path)` → BOOLEAN (RFC 9309 most-specific-match
  * decision, `*`/terminal-`$` patterns). Null-propagating: a null rules
  * array (no robots row after the left join) yields null — callers
  * coalesce to `true` (no policy means allowed).
  */
case class RobotsAllowed(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"
  override def nullSafeEval(rules: Any, path: Any): Any =
    RobotsImpl.allowedPath(rules.asInstanceOf[ArrayData], path.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (r, p) => s"${ev.value} = graft.functions.RobotsImpl.allowedPath($r, $p);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

object RobotsKernels {
  /** Wildcard-agent (allow, prefix) rules of a robots.txt body, file order. */
  def wildcardRules(c: Column): Column =
    GraftColumnBridge.column(RobotsWildcardRules(GraftColumnBridge.expression(c.cast("string"))))

  /** RFC 9309 decision: is `path` allowed under the parsed `rules`? */
  def allowedPath(rules: Column, path: Column): Column =
    GraftColumnBridge.column(RobotsAllowed(
      GraftColumnBridge.expression(rules),
      GraftColumnBridge.expression(path.cast("string"))))

  /** Sitemap directive values (agent-independent) — frontier seeds. */
  def sitemaps(c: Column): Column =
    GraftColumnBridge.column(RobotsSitemaps(GraftColumnBridge.expression(c.cast("string"))))

  /** Wildcard-record Crawl-delay in whole seconds (null when absent). */
  def crawlDelay(c: Column): Column =
    GraftColumnBridge.column(RobotsCrawlDelay(GraftColumnBridge.expression(c.cast("string"))))
}
