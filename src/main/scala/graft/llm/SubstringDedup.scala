package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level exact deduplication — the span-granularity operator of a
  * modern pretraining pipeline (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): find every run of ≥ k consecutive
  * tokens that occurs more than once across the corpus (boilerplate
  * headers/footers repeated over millions of otherwise-unique pages) and
  * remove those SPANS, keeping the unique remainder of each document.
  * Document-level dedup ([[Dedup]]) never catches these — each page is
  * globally unique.
  *
  * A "duplicated position" is a token index p in a document whose k-token
  * gram starting at p occurs ≥ 2 times in the whole corpus (Lee et al.'s
  * any-two-occurrences criterion — a within-document repeat counts too).
  * Overlapping/adjacent duplicated positions merge into maximal spans, the
  * suffix-array paper's output re-expressed relationally.
  *
  * Scale shape (the [[Decontamination]] exactness discipline, corpus-sized):
  *  1. The gram stream is SLIM: a one-pass codegen'd kernel
  *     ([[graft.functions.SigKernels.wordNgramFps]]) emits each doc's gram
  *     fingerprints as an array (slot = token position), so posexplode
  *     yields (id, pos, fp) — 8 bytes per gram, no gram text, no window.
  *  2. Stage 1 (prefilter): group by fp, keep fps with ≥ 2 occurrences —
  *     an 8-byte-key shuffle with map-side partials; the semi-join back
  *     onto the slim stream shuffles 24-byte rows, never text.
  *  3. Stage 2 (exact confirm): gram TEXT is re-derived ONLY for surviving
  *     candidates (grouped per doc, one slice per candidate position), and
  *     a (fp, gram) groupBy-count + semi-join keeps grams whose true
  *     occurrence count is ≥ 2 — a fingerprint collision (different gram,
  *     same fp) survives stage 1 but is rejected here, so no unique text is
  *     ever removed. Shuffled text is proportional to the DUPLICATED volume
  *     + collisions, not the corpus. The count is an AGGREGATE, not a
  *     window: hash-agg map-side partials collapse a mega-hot boilerplate
  *     gram to one row per input partition, and the semi-join back is an
  *     equi-join AQE can skew-split — a count window over the same key
  *     would funnel all 10⁷ occurrences of one gram into a single task.
  *  4. Positions merge into spans with a per-doc gaps-and-islands window
  *     (two spans starting at p1 < p2 touch iff p2 ≤ p1 + k).
  *
  * Nothing in the plan is ∝ corpus²; the only corpus-sized shuffles carry
  * fingerprints. This is the relational analog of the suffix-array pass —
  * same O(tokens) work, but embarrassingly partitionable.
  */
object SubstringDedup {

  /** Slim positioned gram-fingerprint stream: (idCol, pos, __fp), one row
    * per k-token gram occurrence. pos is the 0-based token index of the
    * gram's first token. Docs with fewer than k tokens emit nothing.
    */
  private[llm] def gramFps(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.SigKernels.wordNgramFps(col(textCol), k))
          .as(Seq("pos", "__fp")))

  /** Confirmed duplicated occurrences: `(idCol, pos, __g)` rows whose
    * k-gram STRING occurs ≥ 2 times in the corpus (the shared core of
    * [[duplicatedPositions]] and [[duplicatedGrams]]).
    */
  private def confirmedOccurrences(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val fps = gramFps(df, idCol, textCol, k)
    // Stage 1: fps occurring >= 2 times. NO broadcast hint — the duplicated
    // set is corpus-bounded (a boilerplate-heavy corpus can have a large
    // one); AQE broadcasts it when it measures small.
    val dupFps = fps.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("__fp"))
    val candPos = fps.join(dupFps, Seq("__fp"), "left_semi")
    // Stage 2: re-derive gram text for candidates only — candidates group
    // per doc so each doc's text is fetched and tokenized once, then one
    // slice per candidate position.
    val perDoc = candPos.groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("__fp"))).as("__cs"))
    // Materialized once (duplicated-volume-bounded, never corpus-sized):
    // consumed by the count agg AND the confirm join below, which would
    // otherwise each re-run the doc join + tokenize + slice subtree.
    val confirmedCand = df.join(perDoc, Seq(idCol))
      .select(col(idCol), TextAnalysis.tokensWs(col(textCol)).as("__w"),
        explode(col("__cs")).as("__c"))
      .select(col(idCol), col("__c.pos").as("pos"), col("__c.__fp").as("__fp"),
        concat_ws(" ", slice(col("__w"), col("__c.pos") + 1, lit(k))).as("__g"))
      .localCheckpoint()
    // True occurrence count per gram STRING (all occurrences of a
    // duplicated fp survive stage 1, so counting candidates = full count).
    // Skew-safe by construction: see step 3 of the class doc.
    val confirmedGrams = confirmedCand.groupBy(col("__fp"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2)
      .select(col("__fp"), col("__g"))
    confirmedCand.join(confirmedGrams, Seq("__fp", "__g"), "left_semi")
  }

  /** Token positions (0-based) whose k-gram occurs ≥ 2 times in the corpus
    * — exact string match, fingerprint-prefiltered. Returns (idCol, pos).
    */
  def duplicatedPositions(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 50): DataFrame =
    confirmedOccurrences(df, idCol, textCol, k)
      .select(col(idCol), col("pos").cast("long").as("pos"))

  /** The distinct duplicated k-gram STRINGS of a corpus — the reference
    * set an ingestion-time gate ([[removeKnownSpans]]) ships: compute once
    * over a representative corpus, persist, apply to new data as a pure
    * map. One column `gram`.
    */
  def duplicatedGrams(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 50): DataFrame =
    confirmedOccurrences(df, idCol, textCol, k)
      .select(col("__g").as("gram")).distinct()

  /** Strip every span covered by a KNOWN duplicated-gram set from `text`
    * — one codegen'd kernel pass per row, stateless: the batch/streaming
    * ingestion gate for boilerplate already cataloged by a
    * [[duplicatedGrams]] run. The gram set ships inside the expression
    * (the [[graft.functions.BpeKernels]] reference-object discipline) —
    * bounded like a benchmark set, it is the caller's trained artifact.
    * Matching is exact string equality (no fingerprints — no collision
    * risk); documents with no covered positions keep their text VERBATIM,
    * like [[removeSpans]].
    */
  def removeKnownSpans(text: org.apache.spark.sql.Column, grams: Seq[String], k: Int)
      : org.apache.spark.sql.Column =
    graft.functions.SpanGate.removeKnownSpans(text, grams, k)

  /** Maximal duplicated token spans per document: (idCol, span_start,
    * span_end), 0-based inclusive token indices, non-overlapping, sorted.
    * Every token in [span_start, span_end] is covered by some duplicated
    * k-gram.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 50): DataFrame =
    mergePositionsToSpans(duplicatedPositions(df, idCol, textCol, k), idCol, k)

  /** Gaps-and-islands merge of (idCol, pos) gram positions into maximal
    * token spans: gram at p2 touches the span of p1 < p2 iff p2 <= p1 + k
    * (overlap or adjacency of [p, p+k-1] windows). Shared by
    * [[duplicatedSpans]] and [[Decontamination.contaminatedSpans]]; the
    * windows are doc-KEYED (never a single-partition WindowExec).
    */
  private[llm] def mergePositionsToSpans(pos: DataFrame, idCol: String, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    pos
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, 0).otherwise(1))
      .withColumn("__isl", sum(col("__new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + (k - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Remove the given token spans from each document's text: tokens whose
    * 0-based index falls inside any of the doc's spans are dropped and the
    * survivors re-joined with single spaces. Documents with no spans keep
    * their text VERBATIM (no re-tokenization); a fully-covered document
    * becomes the empty string. `spans` must be (idCol, span_start,
    * span_end) as produced by [[duplicatedSpans]].
    */
  def removeSpans(
      df: DataFrame,
      spans: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sp = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("__spans"))
    val toks = TextAnalysis.tokensWs(col(textCol))
    // Per-row HOF over the doc's (few) spans — interpreted, but it only
    // evaluates on rows that HAVE spans (CaseWhen short-circuits), and the
    // span-bearing set is duplicated-volume-bounded.
    val rebuilt = concat_ws(" ", filter(
      zip_with(toks, sequence(lit(0), size(toks) - 1), (t, i) =>
        when(exists(col("__spans"),
          s => i >= s.getField("s") && i <= s.getField("e")), lit(null)).otherwise(t)),
      x => x.isNotNull))
    val others = df.columns.filter(c => c != idCol && c != textCol).map(col)
    df.join(sp, Seq(idCol), "left")
      .select((col(idCol) +:
        when(col("__spans").isNull, col(textCol)).otherwise(rebuilt).as(textCol) +:
        others.toIndexedSeq): _*)
  }

  /** The composed operator: detect duplicated spans and strip them. */
  def dedupSubstrings(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 50): DataFrame =
    removeSpans(df, duplicatedSpans(df, idCol, textCol, k), idCol, textCol)
}
