package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction as a single-pass codegen'd kernel — the stage
  * between crawl ingestion ([[graft.sources.Warc]]) and every text
  * operator (quality, dedup, langid): a web corpus arrives as markup, and
  * the extraction pass is on the 100 TB hot path, so it must be one linear
  * scan with no allocation beyond the output buffer — no DOM, no regex
  * backtracking.
  *
  * Semantics (the classic tag-stripper contract):
  *  - `<script>…</script>` and `<style>…</style>` content is DROPPED
  *    (case-insensitive match, closed by the matching end tag);
  *  - `<!-- … -->` comments are dropped;
  *  - every other tag is replaced by a word break (so `<p>a</p><p>b</p>`
  *    reads "a b", never "ab");
  *  - character entities decode: the HTML named core (amp, lt, gt, quot,
  *    apos, nbsp) plus decimal `&#NN;` and hex `&#xNN;`; an unterminated
  *    or unknown entity passes through literally;
  *  - whitespace (including NBSP from entity decode) collapses to single
  *    spaces, trimmed at both ends.
  *
  * A truncated page (EOF inside a tag, comment, or script) drops the open
  * construct and keeps the text extracted so far — crawls are full of
  * truncated fetches and extraction must not throw mid-corpus.
  */
object HtmlImpl {

  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u00a0'

  /** True if `s` at `i` starts (case-insensitively) with `word` followed by
    * a tag-name delimiter (whitespace, '>', '/', or EOF).
    */
  private[functions] def tagNameAt(s: String, i: Int, word: String): Boolean = {
    if (i + word.length > s.length) return false
    var k = 0
    while (k < word.length) {
      val c = Character.toLowerCase(s.charAt(i + k))
      if (c != word.charAt(k)) return false
      k += 1
    }
    val j = i + word.length
    j >= s.length || isWs(s.charAt(j)) || s.charAt(j) == '>' || s.charAt(j) == '/'
  }

  /** Index just past the matching `</name…>` end tag, or `s.length` if the
    * element never closes (truncated page).
    */
  private[functions] def skipRawElement(s: String, from: Int, name: String): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + 1 < s.length && s.charAt(i + 1) == '/' &&
          tagNameAt(s, i + 2, name)) {
        var j = i + 2 + name.length
        while (j < s.length && s.charAt(j) != '>') j += 1
        return if (j < s.length) j + 1 else s.length
      }
      i += 1
    }
    s.length
  }

  /** Decode the entity starting at `i` (which points at '&'). Returns the
    * decoded char in the low 21 bits and the next index in the high bits —
    * packed to keep the hot loop allocation-free. If no entity matches,
    * returns '&' itself with next = i+1 (literal pass-through).
    */
  private[functions] def entityAt(s: String, i: Int): Long = {
    def pack(cp: Int, next: Int): Long = (next.toLong << 21) | cp.toLong
    val semi = {
      var j = i + 1
      val lim = math.min(s.length, i + 12) // longest handled entity is short
      while (j < lim && s.charAt(j) != ';') j += 1
      if (j < lim && s.charAt(j) == ';') j else -1
    }
    if (semi < 0) return pack('&', i + 1)
    val body = s.substring(i + 1, semi)
    val lower = body.toLowerCase
    lower match {
      case "amp"  => pack('&', semi + 1)
      case "lt"   => pack('<', semi + 1)
      case "gt"   => pack('>', semi + 1)
      case "quot" => pack('"', semi + 1)
      case "apos" => pack('\'', semi + 1)
      case "nbsp" => pack(' ', semi + 1)
      case _ =>
        if (body.length >= 2 && body.charAt(0) == '#') {
          val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
          val digits = if (hex) body.substring(2) else body.substring(1)
          try {
            val cp = Integer.parseInt(digits, if (hex) 16 else 10)
            if (cp > 0 && cp <= 0x10ffff) pack(cp, semi + 1) else pack('&', i + 1)
          } catch { case _: NumberFormatException => pack('&', i + 1) }
        } else pack('&', i + 1)
    }
  }

  /** The extraction pass. Static so interpreted eval and codegen share one
    * body (the [[LuhnImpl]] discipline).
    */
  def extract(input: UTF8String): UTF8String = {
    val s = input.toString
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false // a collapsed whitespace/tag break awaiting text
    var i = 0
    def emit(cp: Int): Unit = {
      if (pendingSpace && out.length > 0) out.append(' ')
      pendingSpace = false
      out.appendCodePoint(cp)
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else skipRawElement(s, gt + 1, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else skipRawElement(s, gt + 1, "style")
        } else {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else gt + 1
        }
        pendingSpace = true
      } else if (c == '&') {
        val packed = entityAt(s, i)
        val cp = (packed & 0x1fffffL).toInt
        i = (packed >>> 21).toInt
        if (isWs(cp.toChar)) pendingSpace = true else emit(cp)
      } else if (isWs(c)) {
        pendingSpace = true
        i += 1
      } else {
        val cp = s.codePointAt(i)
        emit(cp)
        i += Character.charCount(cp)
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** Block-level main-content extraction — the boilerplate-removal stage
  * between raw HTML→text and line dedup (the jusText/Readability idea
  * reduced to its deterministic core): the page splits into blocks at
  * block-level tag boundaries, each block accumulates its visible text AND
  * the share of it living inside anchors, and a block survives only when
  * it is long enough (`minLen` codepoints) and link-poor enough
  * (`linkChars·1000 ≤ maxLinkPermille·textLen` — exact integers).
  * Navigation bars, footers, tag clouds and "related links" rails are
  * short and link-dense; article prose is long and link-sparse — the two
  * signals that classify without a DOM or a model. Same single-pass
  * discipline as [[HtmlImpl.extract]] (comments/script/style skipped,
  * entities decoded, whitespace collapsed per block); good blocks join
  * with a single newline.
  */
object MainContentImpl {
  import HtmlImpl.{isWs, tagNameAt, skipRawElement}

  private val blockTags = Array("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "table", "tr", "td", "th", "section", "article", "nav",
    "header", "footer", "aside", "blockquote", "pre", "br")

  private def blockBoundaryAt(s: String, i: Int): Boolean = {
    // i points at the char after '<' (or after "</"); whole-name match.
    var j = 0
    while (j < blockTags.length) {
      if (tagNameAt(s, i, blockTags(j))) return true
      j += 1
    }
    false
  }

  def mainContent(input: UTF8String, minLen: Int, maxLinkPermille: Int): UTF8String = {
    val s = input.toString
    val out = new java.lang.StringBuilder(s.length)
    val block = new java.lang.StringBuilder(64)
    var linkChars = 0L
    var inAnchor = false
    var pendingSpace = false

    def emit(cp: Int): Unit = {
      if (pendingSpace && block.length > 0) {
        block.append(' ')
        if (inAnchor) linkChars += 1
      }
      pendingSpace = false
      block.appendCodePoint(cp)
      if (inAnchor) linkChars += Character.charCount(cp)
    }
    def flush(): Unit = {
      val textLen = block.length.toLong
      if (textLen >= minLen && linkChars * 1000L <= maxLinkPermille * textLen) {
        if (out.length > 0) out.append('\n')
        out.append(block)
      }
      block.setLength(0)
      linkChars = 0L
      pendingSpace = false
    }

    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
          pendingSpace = true
        } else if (tagNameAt(s, i + 1, "script")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else skipRawElement(s, gt + 1, "script")
          pendingSpace = true
        } else if (tagNameAt(s, i + 1, "style")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else skipRawElement(s, gt + 1, "style")
          pendingSpace = true
        } else {
          val close = i + 1 < s.length && s.charAt(i + 1) == '/'
          val nameAt = if (close) i + 2 else i + 1
          if (blockBoundaryAt(s, nameAt)) flush()
          else if (tagNameAt(s, nameAt, "a")) inAnchor = !close
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else gt + 1
          pendingSpace = true
        }
      } else if (c == '&') {
        val packed = HtmlImpl.entityAt(s, i)
        val cp = (packed & 0x1fffffL).toInt
        i = (packed >>> 21).toInt
        if (isWs(cp.toChar)) pendingSpace = true else emit(cp)
      } else if (isWs(c)) {
        pendingSpace = true
        i += 1
      } else {
        val cp = s.codePointAt(i)
        emit(cp)
        i += Character.charCount(cp)
      }
    }
    flush() // trailing text outside any closing tag is still a block
    UTF8String.fromString(out.toString)
  }
}

/** Anchor-href extraction — the crawl link-graph feeder. One linear scan
  * (the [[HtmlImpl]] discipline: no DOM, no regex): walks the tag stream,
  * skips comments and script/style raw content (an href inside a JS string
  * is not a link), and for each `<a …>` start tag returns the value of its
  * FIRST `href` attribute.
  *
  * Attribute contract (pragmatic crawl subset, fuzz-pinned in the spec):
  * `href` matches case-insensitively as a whole attribute name, `=` may
  * carry whitespace on either side, the value may be double-quoted,
  * single-quoted, or an unquoted token (ended by whitespace or '>').
  * Empty values and anchors without an href (pure fragment targets) yield
  * nothing; an unterminated quote (truncated fetch) drops that anchor and
  * scanning continues — extraction must not throw mid-corpus.
  */
object HrefImpl {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** True if the tag body `[from, to)` has "href" (ci) at `i` as a whole
    * attribute name (preceded by tag-name/attr delimiter, followed by
    * optional ws then '=').
    */
  private def hrefAt(s: String, i: Int, to: Int): Int = {
    if (i + 4 > to) return -1
    if (Character.toLowerCase(s.charAt(i)) != 'h' ||
        Character.toLowerCase(s.charAt(i + 1)) != 'r' ||
        Character.toLowerCase(s.charAt(i + 2)) != 'e' ||
        Character.toLowerCase(s.charAt(i + 3)) != 'f') return -1
    var j = i + 4
    while (j < to && HtmlImpl.isWs(s.charAt(j))) j += 1
    if (j < to && s.charAt(j) == '=') j + 1 else -1
  }

  /** The first href attribute VALUE inside the tag body `[from, to)`, or
    * null when absent/empty/unterminated — the scan [[hrefs]] and
    * [[AnchorImpl.anchors]] share.
    */
  private[functions] def firstHref(s: String, from: Int, to: Int): UTF8String = {
    var j = from
    while (j < to) {
      if (HtmlImpl.isWs(s.charAt(j - 1))) { // attr names start after ws
        val vStart = hrefAt(s, j, to)
        if (vStart >= 0) {
          var v = vStart
          while (v < to && HtmlImpl.isWs(s.charAt(v))) v += 1
          if (v < to && (s.charAt(v) == '"' || s.charAt(v) == '\'')) {
            val q = s.charAt(v)
            val close = s.indexOf(q, v + 1)
            return if (close >= 0 && close < to && close > v + 1)
              UTF8String.fromString(s.substring(v + 1, close)) else null
          } else {
            var e = v
            while (e < to && !HtmlImpl.isWs(s.charAt(e)) && s.charAt(e) != '>') e += 1
            return if (e > v) UTF8String.fromString(s.substring(v, e)) else null
          }
        }
      }
      j += 1
    }
    null
  }

  def hrefs(input: UTF8String): ArrayData = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
        } else if (HtmlImpl.tagNameAt(s, i + 1, "script")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else HtmlImpl.skipRawElement(s, gt + 1, "script")
        } else if (HtmlImpl.tagNameAt(s, i + 1, "style")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else HtmlImpl.skipRawElement(s, gt + 1, "style")
        } else if (HtmlImpl.tagNameAt(s, i + 1, "a")) {
          val gtRaw = s.indexOf('>', i)
          val gt = if (gtRaw < 0) s.length else gtRaw
          val href = firstHref(s, i + 2, gt)
          if (href != null) out += href
          i = if (gtRaw < 0) s.length else gt + 1
        } else {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else gt + 1
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Anchor (href, text) pairs — [[HrefImpl]] plus the anchor's own TEXT,
  * the query-independent relevance signal web curation aggregates per
  * TARGET domain ("what the web calls this site"). The anchor text is the
  * extraction ([[HtmlImpl.extract]]) of everything between the `<a …>`
  * start tag and its matching `</a>`; anchors without an href, with an
  * empty value, or left unclosed by a truncated fetch yield nothing.
  */
object AnchorImpl {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Index of the `<` of the first `</a…>` end tag at/after `from`, or -1
    * if the element never closes (truncated page).
    */
  private def findEndTag(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + 1 < s.length && s.charAt(i + 1) == '/' &&
          HtmlImpl.tagNameAt(s, i + 2, "a")) return i
      i += 1
    }
    -1
  }

  def anchors(input: UTF8String): ArrayData = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
        } else if (HtmlImpl.tagNameAt(s, i + 1, "script")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else HtmlImpl.skipRawElement(s, gt + 1, "script")
        } else if (HtmlImpl.tagNameAt(s, i + 1, "style")) {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else HtmlImpl.skipRawElement(s, gt + 1, "style")
        } else if (HtmlImpl.tagNameAt(s, i + 1, "a")) {
          val gtRaw = s.indexOf('>', i)
          if (gtRaw < 0) { i = s.length }
          else {
            val href = HrefImpl.firstHref(s, i + 2, gtRaw)
            val end = findEndTag(s, gtRaw + 1) // start of the matching </a
            if (end < 0) i = s.length // truncated: drop the open anchor
            else {
              if (href != null) {
                val text = HtmlImpl.extract(
                  UTF8String.fromString(s.substring(gtRaw + 1, end)))
                out += new GenericInternalRow(Array[Any](href, text))
              }
              val endGt = s.indexOf('>', end)
              i = if (endGt < 0) s.length else endGt + 1
            }
          }
        } else {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) s.length else gt + 1
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen wrapper for [[AnchorImpl.anchors]]: `html_anchors(html)` →
  * `array<struct<href:string, text:string>>` in document order.
  */
case class HtmlAnchors(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "html_anchors"
  override def nullSafeEval(input: Any): Any =
    AnchorImpl.anchors(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.AnchorImpl.anchors($c);")
  override protected def withNewChildInternal(newChild: Expression): HtmlAnchors =
    copy(child = newChild)
}

/** Codegen wrapper for [[HrefImpl.hrefs]]: `html_hrefs(html)` →
  * `array<string>` of raw anchor targets in document order (empty array
  * for a page without links — null only for null input).
  */
case class HtmlHrefs(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_hrefs"
  override def nullSafeEval(input: Any): Any =
    HrefImpl.hrefs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HrefImpl.hrefs($c);")
  override protected def withNewChildInternal(newChild: Expression): HtmlHrefs =
    copy(child = newChild)
}

/** Codegen wrapper for [[MainContentImpl.mainContent]]:
  * `html_main_content(html)` → STRING of good blocks joined by '\n'.
  * The thresholds ride the expression as literals (trained-artifact
  * discipline — no per-row column needed for corpus-wide constants).
  */
case class HtmlMainContent(child: Expression, minLen: Int, maxLinkPermille: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_content"
  override def nullSafeEval(input: Any): Any =
    MainContentImpl.mainContent(input.asInstanceOf[UTF8String], minLen, maxLinkPermille)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MainContentImpl.mainContent($c, $minLen, $maxLinkPermille);")
  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

/** Codegen wrapper for [[HtmlImpl.extract]]. */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"
  override def nullSafeEval(input: Any): Any =
    HtmlImpl.extract(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HtmlImpl.extract($c);")
  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

object HtmlKernels {
  /** One-pass HTML → text extraction (tags → word breaks, script/style/
    * comments dropped, core entities decoded, whitespace collapsed).
    */
  def htmlToText(c: Column): Column =
    GraftColumnBridge.column(HtmlToText(GraftColumnBridge.expression(c.cast("string"))))

  /** Block-classified main content (jusText-style: long, link-sparse
    * blocks survive; nav/footer/link rails drop). Good blocks join with
    * '\n'; empty string for a page with no good block.
    */
  def mainContent(c: Column, minLen: Int = 25, maxLinkPermille: Int = 200): Column =
    GraftColumnBridge.column(HtmlMainContent(
      GraftColumnBridge.expression(c.cast("string")), minLen, maxLinkPermille))

  /** Raw anchor targets (`<a href=…>`) in document order — the link-graph
    * feeder; comments and script/style content do not contribute.
    */
  def hrefs(c: Column): Column =
    GraftColumnBridge.column(HtmlHrefs(GraftColumnBridge.expression(c.cast("string"))))

  /** Anchor (href, text) pairs in document order — the anchor-text
    * relevance signal; same suppression rules as [[hrefs]].
    */
  def anchors(c: Column): Column =
    GraftColumnBridge.column(HtmlAnchors(GraftColumnBridge.expression(c.cast("string"))))

  import org.apache.spark.sql.functions._

  /** The page's `<meta name="robots" content="…">` directive, lowercased;
    * null when absent. Pragmatic crawl subset: name-then-content attribute
    * order, either quote style, any case — the shape real pages emit.
    * A single codegen'd regex (one pass over the head), matching the
    * oracle regex textually.
    */
  def metaRobots(html: Column): Column = {
    val r = lower(regexp_extract(html,
      "(?i)<meta\\s[^>]*name\\s*=\\s*[\"']robots[\"'][^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"']", 1))
    when(r === "", lit(null)).otherwise(r)
  }

  /** True when the robots directive asks to be excluded from indexes —
    * `noindex` as a comma/whitespace-delimited token (not substring: a
    * hypothetical `nonoindex` value must not match). Null-directive pages
    * return false: absence of a directive means indexable, and a crawl
    * gate must not drop them.
    */
  def robotsNoindex(html: Column): Column =
    coalesce(metaRobots(html).rlike("(^|[,\\s])noindex([,\\s]|$)"), lit(false))
}
