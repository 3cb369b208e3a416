package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4's three-sentence-span deduplication (Raffel et al. 2020 §2.2:
  * "we discard all but one of any three-sentence span occurring more
  * than once in the data set") — the span-granular exact dedup between
  * document dedup (whole-page) and [[LineDedup]] (single-line
  * boilerplate).
  *
  * Contract (deterministic, SQL-replayable):
  *   - sentences come from [[TextAnalysis.sentences]] (the
  *     engine-identical segmentation contract);
  *   - a SPAN is three consecutive sentences of one document, keyed by
  *     their U+001F-joined text (a separator-free join would let
  *     ("ab","c") and ("a","bc") CONFIRM equal and delete unique text;
  *     sentence text cannot contain U+001F after normalizeText);
  *   - the globally FIRST occurrence of each span — smallest
  *     (doc id, start index) — is KEPT; every other occurrence marks its
  *     three sentences for removal (overlapping duplicate spans union
  *     their marks);
  *   - output text is the surviving sentences rejoined with a single
  *     space; documents with fewer than three sentences pass through
  *     (as their sentence rejoin — the uniform representation).
  *
  * Scale discipline (the [[LineDedup]]/[[SubstringDedup]] two-stage
  * shape): duplicate detection first runs over 8-byte `xxhash64` span
  * fingerprints — only fingerprint survivors ever shuffle their span
  * STRING, and the kept/removed decision recounts on the string, so a
  * fingerprint collision can never delete unique text. The
  * first-occurrence pick is a span-keyed `min(struct(id, i))` AGGREGATE
  * (map-side partials — a mega-hot boilerplate span collapses before the
  * exchange), not a window over the span key (the single-task skew trap,
  * PLANS.md finding 11).
  */
object SentenceSpanDedup {

  /** (id, j, s): one row per sentence, position kept. */
  def explodeSentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(TextAnalysis.sentences(col(textCol))).as(Seq("j", "s")))

  /** (id, i, span): every three-consecutive-sentence span, keyed by
    * start index. One window over the DOC key (parallel per document).
    */
  def explodeSpans(sents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("j"))
    sents
      .withColumn("__s2", lead(col("s"), 1).over(w))
      .withColumn("__s3", lead(col("s"), 2).over(w))
      .filter(col("__s3").isNotNull)
      .select(col("id"), col("j").as("i"),
        concat_ws("\u001f", col("s"), col("__s2"), col("__s3")).as("span"))
  }

  /** Remove all-but-first occurrences of every duplicated three-sentence
    * span; returns (id, text, n_sents) over ALL input documents.
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sents = explodeSentences(df, idCol, textCol).localCheckpoint()
    val spans = explodeSpans(sents)
      .withColumn("__fp", xxhash64(col("span")))
    // Stage 1: duplicate fingerprints — slim 8-byte shuffle key.
    val dupFps = spans.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).select(col("__fp"))
    val cand = spans.join(dupFps, Seq("__fp"), "left_semi")
    // Stage 2: string-confirmed first occurrence per span — aggregate,
    // not window, so a hot span partial-aggregates map-side.
    val firstOcc = cand.groupBy(col("span"))
      .agg(min(struct(col("id"), col("i"))).as("__first"),
        count(lit(1)).as("__n_occ"))
      .filter(col("__n_occ") > 1)
    val dups = cand.join(firstOcc, "span")
      .filter(!(col("id") === col("__first.id") && col("i") === col("__first.i")))
    val removed = dups
      .select(col("id"), explode(sequence(col("i"), col("i") + 2)).as("j"))
      .distinct()
    val kept = sents.join(removed, Seq("id", "j"), "left_anti")
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("j"), col("s")))).as("__ls"))
      .select(col("id"),
        array_join(transform(col("__ls"), x => x.getField("s")), " ").as("text"),
        size(col("__ls")).cast("long").as("n_sents"))
    // docs that lost every sentence (or had none) stay accounted as ''
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"))
  }
}
