package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass URL parsing kernels. The Column-API formulation of
  * [[graft.llm.UrlOps]] (a regexp_extract per field nested in CaseWhen)
  * is semantically right but expands to thousands of lines of generated
  * Java per query — Janino compile time dominated the whole query at
  * bench scale, and per row it runs ~15 regex engines over the same short
  * string. These kernels do one linear scan per field (no regex, no
  * allocation beyond the result) and keep whole-stage codegen spans tight.
  *
  * Field semantics are EXACTLY the regexp formulation's (the DuckDB
  * oracles still use the regexes, so any divergence hash-fails):
  *  - scheme: `^[A-Za-z][A-Za-z0-9+.-]*` before "://", lowercased; null
  *    when the prefix is absent — and when it's absent, host/port/query
  *    are null and path is "/" (the regexes' no-match behavior).
  *  - authority: between "://" and the first `/?#`.
  *  - host: authority minus a trailing `:digits*` run, lowercased; null
  *    when empty.
  *  - port: trailing `:digits+` of the authority, as a long.
  *  - path: from the authority's end to the first `?#`; empty → "/".
  *  - query: after the FIRST `?` in the string, up to `#`/end; empty →
  *    null. (Unanchored, like the regex `[?]([^#]*)`.)
  */
object UrlImpl {

  /** End index (exclusive) of a valid `scheme://` prefix, or -1. */
  private def schemeEnd(s: String): Int = {
    if (s.isEmpty) return -1
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return -1
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) {
        return if (s.startsWith("://", i)) i else -1
      }
      i += 1
    }
    -1
  }

  /** (authStart, authEnd) of the authority, or null when no scheme. */
  private def authSpan(s: String): (Int, Int) = {
    val se = schemeEnd(s)
    if (se < 0) return null
    val start = se + 3
    var end = start
    while (end < s.length && { val c = s.charAt(end); c != '/' && c != '?' && c != '#' }) end += 1
    (start, end)
  }

  /** Index of the ':' opening a trailing `:digits*` run in [from,to), or -1. */
  private def portColon(s: String, from: Int, to: Int): Int = {
    var i = to - 1
    while (i >= from && s.charAt(i) >= '0' && s.charAt(i) <= '9') i -= 1
    if (i >= from && s.charAt(i) == ':') i else -1
  }

  def scheme(u: UTF8String): UTF8String = {
    val s = u.toString
    val se = schemeEnd(s)
    if (se < 0) null
    else UTF8String.fromString(s.substring(0, se).toLowerCase(java.util.Locale.ROOT))
  }

  def host(u: UTF8String): UTF8String = {
    val s = u.toString
    val a = authSpan(s)
    if (a == null) return null
    val colon = portColon(s, a._1, a._2)
    val end = if (colon >= 0) colon else a._2
    if (end <= a._1) null
    else UTF8String.fromString(s.substring(a._1, end).toLowerCase(java.util.Locale.ROOT))
  }

  /** Port as a boxed Long (null when absent) — boxed so the expression can
    * return SQL NULL.
    */
  def port(u: UTF8String): java.lang.Long = {
    val s = u.toString
    val a = authSpan(s)
    if (a == null) return null
    val colon = portColon(s, a._1, a._2)
    if (colon < 0 || colon == a._2 - 1) return null // ':' with no digits
    java.lang.Long.valueOf(java.lang.Long.parseLong(s.substring(colon + 1, a._2)))
  }

  def path(u: UTF8String): UTF8String = {
    val s = u.toString
    val a = authSpan(s)
    if (a == null) return UTF8String.fromString("/") // regex no-match → '' → '/'
    var end = a._2
    while (end < s.length && { val c = s.charAt(end); c != '?' && c != '#' }) end += 1
    if (end == a._2) UTF8String.fromString("/")
    else UTF8String.fromString(s.substring(a._2, end))
  }

  def query(u: UTF8String): UTF8String = {
    val s = u.toString
    val q = s.indexOf('?')
    if (q < 0) return null
    var end = q + 1
    while (end < s.length && s.charAt(end) != '#') end += 1
    if (end == q + 1) null else UTF8String.fromString(s.substring(q + 1, end))
  }

  /** Crawl-normal form (the [[graft.llm.UrlOps.normalizeUrl]] contract):
    * lowercased scheme/host, default port dropped, empty path → "/",
    * query kept, fragment dropped; null when scheme or host is null.
    */
  def normalize(u: UTF8String): UTF8String = {
    val sch = scheme(u)
    val h = host(u)
    if (sch == null || h == null) return null
    val p = port(u)
    val schS = sch.toString
    val keepPort = p != null &&
      !((schS == "http" && p.longValue == 80L) || (schS == "https" && p.longValue == 443L))
    val sb = new java.lang.StringBuilder(u.numBytes())
    sb.append(schS).append("://").append(h.toString)
    if (keepPort) sb.append(':').append(p.longValue)
    sb.append(path(u).toString)
    val q = query(u)
    if (q != null) sb.append('?').append(q.toString)
    UTF8String.fromString(sb.toString)
  }

  /** Registrable domain of a HOST (not a URL): last two labels, last three
    * when the last two are a multi-label public suffix; IPv4 literals and
    * short hosts return themselves. Mirrors
    * [[graft.llm.UrlOps.registeredDomain]]/its SQL twin exactly.
    */
  def registeredDomain(hostStr: UTF8String, suffixes: java.util.HashSet[String]): UTF8String = {
    val h = hostStr.toString
    if (h.isEmpty) return hostStr
    var allIpv4 = true
    var dots = 0
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      if (c == '.') dots += 1
      else if (c < '0' || c > '9') allIpv4 = false
      i += 1
    }
    if (allIpv4 || dots <= 1) return hostStr // IPv4 literal or ≤2 labels
    val last = h.lastIndexOf('.')
    val mid = h.lastIndexOf('.', last - 1)
    val last2 = h.substring(mid + 1)
    if (suffixes.contains(last2)) {
      val third = h.lastIndexOf('.', mid - 1)
      UTF8String.fromString(h.substring(third + 1))
    } else UTF8String.fromString(last2)
  }
}

/** String-part kernel: part ∈ scheme|host|path|query|normalize. */
case class UrlStringPart(child: Expression, part: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = s"url_$part"
  // Value-null-producing (an absent scheme/host/query is null even for a
  // non-null input), so nullability must NOT inherit from the child: with a
  // non-nullable child (e.g. explode of a containsNull=false array) the
  // inherited `false` makes codegen emit `false = true;` — a Janino compile
  // error that silently drops the whole stage to interpreted eval.
  override def nullable: Boolean = true
  private val f: UTF8String => UTF8String = part match {
    case "scheme"    => UrlImpl.scheme
    case "host"      => UrlImpl.host
    case "path"      => UrlImpl.path
    case "query"     => UrlImpl.query
    case "normalize" => UrlImpl.normalize
  }
  override def nullSafeEval(input: Any): Any = f(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |UTF8String $res = graft.functions.UrlImpl.$part($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): UrlStringPart =
    copy(child = newChild)
}

case class UrlPort(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "url_port"
  override def nullable: Boolean = true // portless URLs are null (see UrlStringPart)
  override def nullSafeEval(input: Any): Any = {
    val p = UrlImpl.port(input.asInstanceOf[UTF8String])
    if (p == null) null else p.longValue
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long $res = graft.functions.UrlImpl.port($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): UrlPort =
    copy(child = newChild)
}

case class RegisteredDomain(child: Expression, suffixes: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "registered_domain"
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    suffixes.foreach(s.add)
    s
  }
  override def nullSafeEval(input: Any): Any =
    UrlImpl.registeredDomain(input.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("suffixSet", set, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlImpl.registeredDomain($c, $setRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): RegisteredDomain =
    copy(child = newChild)
}

object UrlKernels {
  private def part(c: Column, p: String): Column =
    GraftColumnBridge.column(UrlStringPart(GraftColumnBridge.expression(c.cast("string")), p))

  def urlScheme(c: Column): Column = part(c, "scheme")
  def urlHost(c: Column): Column = part(c, "host")
  def urlPath(c: Column): Column = part(c, "path")
  def urlQuery(c: Column): Column = part(c, "query")
  def normalizeUrl(c: Column): Column = part(c, "normalize")
  def urlPort(c: Column): Column =
    GraftColumnBridge.column(UrlPort(GraftColumnBridge.expression(c.cast("string"))))
  def registeredDomain(host: Column, suffixes: Seq[String]): Column =
    GraftColumnBridge.column(RegisteredDomain(
      GraftColumnBridge.expression(host.cast("string")), suffixes))
}
