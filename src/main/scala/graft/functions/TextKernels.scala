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

  /** [[PolyFingerprint]]'s fold, verbatim (`(h·131 + codePoint) mod 1e9+7`
    * over code points) — kept step-identical so the fused kernel's buckets
    * equal `pmod(fingerprint(gram), n)` for every gram. */
  private def fp(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

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
}
