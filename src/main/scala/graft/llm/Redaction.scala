package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — a standard curation
  * stage before training-data release.
  *
  * Pure Catalyst `regexp_replace`/`regexp_extract_all` column expressions:
  * codegen'd, map-side only (the plan is scan → project, no shuffle), and
  * trivially distributed — the patterns ride along as literals. Patterns
  * stay within the RE2-compatible subset (no backrefs, no lookaround) so
  * they mean the same thing in Java regex, RE2, and the DuckDB oracle.
  *
  * Replacement order matters and is fixed: emails first (an email's host
  * part can contain a dotted quad), then IPv4, then phone numbers (the
  * longest digit-bearing pattern left).
  */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-ish phone: +CC then 2–3 separator-joined digit groups.
    * Anchored on the leading '+' to keep false positives off ordinary
    * numbers; every group requires digits, so no separator is consumed
    * without a following group.
    */
  val PhoneRe = "\\+\\d{1,3}([ -]?\\d{3,4}){2,3}\\b"

  /** Payment-card CANDIDATE: 13–19 digits, optional single space/dash
    * separators. A regex alone over-matches (any long number); candidates
    * are confirmed by the Luhn checksum kernel before anything redacts.
    */
  val CardRe = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Luhn-confirmed card numbers in `text`, sorted (canonical fold order
    * for [[redactCards]] — replacement of distinct literals is
    * order-independent unless one is a substring of another, and sorting
    * pins even that case to one answer on both engines).
    */
  def validCards(text: Column): Column =
    array_sort(filter(regexp_extract_all(text, lit(CardRe), lit(0)),
      c => graft.functions.TextKernels.luhnValid(c)))

  /** `text` with every Luhn-valid card candidate replaced by [CARD].
    * The per-row fold over the (almost always empty) valid-candidate
    * array is an interpreted HOF — bounded by matches, not text length;
    * the candidate extraction and Luhn confirm stay codegen'd.
    */
  def redactCards(text: Column): Column =
    aggregate(validCards(text), text, (acc, c) => replace(acc, c, lit("[CARD]")))

  /** Adds `redacted` plus per-category match counts (counted BEFORE
    * replacement, so overlapping categories are each reported against the
    * original text).
    */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", countMatches(t, EmailRe))
      .withColumn("n_ips", countMatches(t, Ipv4Re))
      .withColumn("n_phones", countMatches(t, PhoneRe))
      .withColumn("redacted", redactText(t))
  }

  /** Card detection + redaction: candidate count, Luhn-confirmed count,
    * and the confirmed-only redaction (an invalid 16-digit number is NOT
    * a card and survives untouched).
    */
  def redactCardsBy(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_card_candidates", countMatches(t, CardRe))
      .withColumn("n_cards", size(validCards(t)))
      .withColumn("redacted", redactCards(t))
  }

  /** Canary-string scan (the secret-sharer probe, Carlini et al. 2019):
    * count every occurrence of each planted canary per document — the
    * audit that tells you whether your memorization probes (or a known
    * leaked secret) actually entered the training corpus, and how many
    * times. Canaries are a bounded curated list, so each one is a pure
    * length-arithmetic count (`(len − len(replace(text, c, ''))) div
    * |c|` — exact integers, substring semantics, no regex) and the whole
    * scan is one codegen'd map + explode. Only hits emit rows.
    *
    * Built with the Column API, not SQL text: interpolating a canary into
    * `expr()` re-interprets backslashes as string-literal escapes (a
    * canary containing `\` would scan for the wrong bytes), and the gram
    * length must count CODE POINTS (what `length()` counts), not UTF-16
    * units — a non-BMP canary would otherwise divide by the wrong length.
    */
  def canaryScan(df: DataFrame, idCol: String, textCol: String,
      canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "canaryScan needs at least one canary")
    require(canaries.forall(_.nonEmpty), "canaries must be non-empty strings")
    val t = col(textCol)
    val hits = canaries.zipWithIndex.map { case (c, i) =>
      struct(lit(i.toLong).as("canary_idx"),
        graft.functions.FixedPointLog.idiv(
          (length(t) - length(replace(t, lit(c), lit("")))).cast("long"),
          lit(c.codePointCount(0, c.length).toLong))
          .as("n_hits"))
    }
    df.select(col(idCol), explode(array(hits: _*)).as("__h"))
      .select(col(idCol), col("__h.canary_idx").as("canary_idx"),
        col("__h.n_hits").as("n_hits"))
      .filter(col("n_hits") > 0)
  }
}
