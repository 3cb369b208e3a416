package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text kernels (the [[VectorKernels]] analog for the text
  * surface). The HOF fingerprint form (`aggregate(split(text, ""), …)`) is
  * `CodegenFallback` and pays interpreted lambda dispatch per CHARACTER —
  * the dominant cost of the poly-hash dedup certificates, which fingerprint
  * every exploded shingle.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  /** `h = (h·131 + codePoint) mod 1e9+7` folded left-to-right over code
    * points — identical values to the HOF form (split+ascii is
    * code-point-wise) and to the DuckDB oracle's per-character
    * `ascii(text[i])` fold. Empty string → 0 (the fold seed), like the HOF
    * form's single empty split piece contributing `ascii('') = 0`.
    */
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |final String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $h = ($h * 131L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object LuhnImpl {
  /** Luhn checksum over the digits of `s` (non-digits skipped), right to
    * left, with a 13–19 digit-count gate (the payment-card length range).
    * Static so interpreted eval and codegen share one body.
    */
  def valid(s: UTF8String): Boolean = {
    val str = s.toString
    var sum = 0; var n = 0; var dbl = false
    var i = str.length - 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (dbl) { d *= 2; if (d > 9) d -= 9 }
        sum += d; dbl = !dbl; n += 1
      }
      i -= 1
    }
    n >= 13 && n <= 19 && sum % 10 == 0
  }
}

/** Luhn validity of a candidate card-number string (separators ignored) —
  * the confirm step behind credit-card PII detection: the regex finds
  * digit runs, this kernel rejects the ones that aren't checksummed card
  * numbers, so ordinary long numbers don't redact.
  */
case class LuhnValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_valid"
  override def nullSafeEval(input: Any): Any =
    LuhnImpl.valid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.LuhnImpl.valid($c);")
  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}

/** Text normalization — the very first cleaning stage of a pretraining
  * pipeline (before tokenization, dedup, or any fingerprinting: two
  * byte-different but canonically-equal strings must dedup together).
  * Contract, chosen to be statable in standard SQL so the DuckDB oracle can
  * restate it independently (`nfc_normalize` + two regexp_replace + trim):
  *
  *  1. Unicode NFC (canonical composition — `e` + U+0301 → `é`);
  *  2. control characters (U+0000–U+001F except `\n`/`\t`, and U+007F)
  *     are removed — `\r` is a control, so CRLF becomes `\n`;
  *  3. runs of spaces and tabs collapse to a single space (newlines are
  *     preserved: paragraph structure feeds line-level ops downstream);
  *  4. leading/trailing SPACES of the whole string trim (a trailing
  *     newline survives — only the space-collapse residue trims).
  *
  * One pass after the NFC call; NFC itself is the JDK's `Normalizer`
  * (conformant Unicode canonical composition, the same algorithm
  * utf8proc-based engines implement).
  */
object NormImpl {
  def norm(input: UTF8String): UTF8String = {
    val s = java.text.Normalizer.normalize(input.toString,
      java.text.Normalizer.Form.NFC)
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t') pendingSpace = true
      else if ((c < ' ' && c != '\n') || c == '\u007f') () // control: drop
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** JVM body of [[DsirBuckets]] — static so interpreted eval and codegen
  * share one implementation (the finding-45 one-call discipline).
  */
object DsirBucketsImpl {
  private val Ws = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** [[PolyFingerprint]]'s fold (`(h·131 + codePoint) mod 1e9+7` over code
    * points) — the shared [[SigImpl.polyFp]] body, so the fused kernel's
    * buckets equal `pmod(fingerprint(gram), n)` by construction. */
  private def fp(s: String): Long = SigImpl.polyFp(s)

  /** DSIR hashed-n-gram buckets of a raw text: tokens =
    * `split(trim(lower(text)), "\\s+")` via the SAME UTF8String primitives
    * Spark's `lower`/`trim`/`split` evaluate (limit −1, so a trailing
    * non-space whitespace run still yields the trailing empty token the
    * Column pipeline produced), then `fp(token) % n` for every token and
    * `fp(tok_i ⊔ " " ⊔ tok_{i+1}) % n` for every adjacent pair, unigrams
    * first — the exact value-and-order contract of the retired
    * explode(grams)→fingerprint→pmod Column pipeline (fp ≥ 0, so `%`
    * IS pmod).
    */
  def buckets(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.toLowerCase.trim().split(Ws, -1)
    val nt = toks.length
    val out = new Array[Long](nt + math.max(0, nt - 1))
    var i = 0
    while (i < nt) { out(i) = fp(toks(i).toString) % n; i += 1 }
    var j = 0
    while (j + 1 < nt) {
      out(nt + j) = fp(UTF8String.concat(toks(j), Space, toks(j + 1)).toString) % n
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Fused DSIR feature kernel: text → array of hashed uni+bigram bucket ids
  * (see [[DsirBucketsImpl.buckets]]). Exists because the Column form —
  * a `transform(sequence(…), …)` bigram lambda — evaluates INTERPRETED
  * (higher-order functions are CodegenFallback), and deep interpreted
  * eval over a corpus is both slow and JIT-profile-fragile: measured
  * 120 s → 1100 s of pure CPU for the same stage between rounds in one
  * JVM (PLANS.md finding 46). One static call, one pass over the string,
  * no intermediate gram strings in the row stream.
  */
case class DsirBuckets(child: Expression, nBuckets: Int) extends UnaryExpression {
  require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_buckets"
  override def nullSafeEval(input: Any): Any =
    DsirBucketsImpl.buckets(input.asInstanceOf[UTF8String], nBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.DsirBucketsImpl.buckets($c, $nBuckets);")
  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** JVM body of [[GopherStats]] — the per-token / per-line counts behind
  * [[graft.llm.GopherRules]], fused into one pass (finding 46: the Column
  * form ran five interpreted lambda passes over the token/line arrays per
  * document, including an `rlike` per word).
  */
object GopherStatsImpl {
  private val Ws = UTF8String.fromString("\\s+")
  private val Nl = UTF8String.fromString("\n")
  private val Ell = UTF8String.fromString("...")
  private val Bullet = UTF8String.fromString("•")
  private val Dash = UTF8String.fromString("- ")
  /** [[graft.llm.GopherRules.Stopwords]], bound at first use (no init-order
    * dependency: the list is a compile-time constant there). */
  private lazy val Stop: Array[UTF8String] =
    graft.llm.GopherRules.Stopwords.map(UTF8String.fromString).toArray

  /** One byte in [A-Za-z] ⇔ `rlike("[A-Za-z]")`: ASCII letter bytes never
    * occur inside a multi-byte UTF-8 sequence (continuation bytes are
    * ≥ 0x80), so the byte scan is exact on any input. */
  private def hasAsciiLetter(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) return true
      i += 1
    }
    false
  }

  /** `(n_words, sum_len, n_alpha, n_stop, n_lines, n_ell_lines,
    * n_bullet_lines)` with the exact Column-pipeline semantics: words =
    * `split(trim(text), "\\s+")` (limit −1), `sum_len` in code points
    * (Spark `length`), `n_stop` = number of DISTINCT stopwords present
    * among the lowercased words, lines = `split(text, "\n")` on the RAW
    * text. Same UTF8String primitives Spark's own expressions evaluate.
    */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.trim().split(Ws, -1)
    var sumLen = 0L
    var nAlpha = 0L
    val found = new Array[Boolean](Stop.length)
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      sumLen += w.numChars()
      if (hasAsciiLetter(w)) nAlpha += 1
      val lw = w.toLowerCase
      var j = 0
      while (j < Stop.length) {
        if (!found(j) && lw.equals(Stop(j))) found(j) = true
        j += 1
      }
      i += 1
    }
    var nStop = 0L
    var j = 0
    while (j < found.length) { if (found(j)) nStop += 1; j += 1 }
    val lines = text.split(Nl, -1)
    var nEll = 0L
    var nBul = 0L
    var k = 0
    while (k < lines.length) {
      val l = lines(k)
      if (l.endsWith(Ell)) nEll += 1
      if (l.startsWith(Bullet) || l.startsWith(Dash)) nBul += 1
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length.toLong, sumLen, nAlpha, nStop,
      lines.length.toLong, nEll, nBul)
  }
}

/** JVM body of [[C4KeptLines]] — C4 line retention fused into one pass
  * (finding 46: the Column form ran an interpreted lambda with a regex
  * split per LINE).
  */
object C4KeptLinesImpl {
  private val Ws = UTF8String.fromString("\\s+")
  private val Nl = UTF8String.fromString("\n")
  private val Dot = UTF8String.fromString(".")
  private val Bang = UTF8String.fromString("!")
  private val Quest = UTF8String.fromString("?")
  private val Quote = UTF8String.fromString("\"")

  /** Lines of the raw text (split "\n", limit −1) that end in terminal
    * punctuation (. ! ? ") AND have ≥ `minLineWords` whitespace tokens of
    * the TRIMMED line — the exact [[graft.llm.C4Rules]] lineKeep contract,
    * via the same UTF8String primitives Spark's expressions evaluate. */
  def kept(text: UTF8String, minLineWords: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val lines = text.split(Nl, -1)
    val out = new java.util.ArrayList[UTF8String](lines.length)
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if ((l.endsWith(Dot) || l.endsWith(Bang) || l.endsWith(Quest) ||
            l.endsWith(Quote)) &&
          l.trim().split(Ws, -1).length >= minLineWords)
        out.add(l)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Fused C4 line-retention kernel (see [[C4KeptLinesImpl.kept]]). */
case class C4KeptLines(child: Expression, minLineWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "c4_kept_lines"
  override def nullSafeEval(input: Any): Any =
    C4KeptLinesImpl.kept(input.asInstanceOf[UTF8String], minLineWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.C4KeptLinesImpl.kept($c, $minLineWords);")
  override protected def withNewChildInternal(newChild: Expression): C4KeptLines =
    copy(child = newChild)
}

/** Fused Gopher-rule statistics kernel (see [[GopherStatsImpl.stats]]). */
case class GopherStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GopherStats.Schema
  override def prettyName: String = "gopher_stats"
  override def nullSafeEval(input: Any): Any =
    GopherStatsImpl.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.GopherStatsImpl.stats($c);")
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  import org.apache.spark.sql.types.{LongType => L, StructField, StructType}
  val Schema: StructType = StructType(Seq(
    StructField("n_words", L, nullable = false),
    StructField("sum_len", L, nullable = false),
    StructField("n_alpha", L, nullable = false),
    StructField("n_stop", L, nullable = false),
    StructField("n_lines", L, nullable = false),
    StructField("n_ell_lines", L, nullable = false),
    StructField("n_bullet_lines", L, nullable = false)))
}

/** Codegen wrapper for [[NormImpl.norm]] (`norm_text`). */
case class NormText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "norm_text"
  override def nullSafeEval(input: Any): Any =
    NormImpl.norm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.NormImpl.norm($c);")
  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object TextKernels {
  /** Codegen'd polynomial rolling hash of a string column
    * (`(h·131 + codePoint) mod 1e9+7`).
    */
  def polyFingerprint(c: Column): Column =
    GraftColumnBridge.column(PolyFingerprint(GraftColumnBridge.expression(c.cast("string"))))

  /** Codegen'd Luhn checksum validity (13–19 digits, separators ignored). */
  def luhnValid(c: Column): Column =
    GraftColumnBridge.column(LuhnValid(GraftColumnBridge.expression(c.cast("string"))))

  /** Unicode-NFC text normalization + control strip + space/tab collapse
    * (see [[NormImpl]] for the exact 4-step contract).
    */
  def normText(c: Column): Column =
    GraftColumnBridge.column(NormText(GraftColumnBridge.expression(c.cast("string"))))

  /** Fused DSIR feature kernel: array of hashed uni+bigram bucket ids
    * (see [[DsirBucketsImpl.buckets]]). */
  def dsirBuckets(c: Column, nBuckets: Int): Column =
    GraftColumnBridge.column(DsirBuckets(
      GraftColumnBridge.expression(c.cast("string")), nBuckets))

  /** Fused Gopher-rule statistics (see [[GopherStatsImpl.stats]]). */
  def gopherStats(c: Column): Column =
    GraftColumnBridge.column(GopherStats(GraftColumnBridge.expression(c.cast("string"))))

  /** Fused C4 line retention (see [[C4KeptLinesImpl.kept]]). */
  def c4KeptLines(c: Column, minLineWords: Int): Column =
    GraftColumnBridge.column(C4KeptLines(
      GraftColumnBridge.expression(c.cast("string")), minLineWords))
}
