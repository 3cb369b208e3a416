package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) — the
  * line-level companion to the document-level [[GopherRules]]: C4 first
  * RETAINS only lines that look like prose (terminal punctuation, ≥ 5
  * words), then DROPS whole documents carrying code/boilerplate markers.
  *
  * Implemented as one pure-map projection (no shuffle, no join):
  *   - line retention: keep lines ending in terminal punctuation (. ! ? ")
  *     with at least `minLineWords` words; the cleaned text is the
  *     surviving lines re-joined with newlines (documents with no
  *     surviving line become the empty string, the [[SubstringDedup]]
  *     removeSpans convention);
  *   - document drops, evaluated on the ORIGINAL text like the paper's
  *     pipeline: any curly brace (code), "lorem ipsum" (template filler,
  *     case-insensitive), or "javascript" (enable-JS boilerplate,
  *     case-insensitive) — plus the retained-line minimum
  *     (`minSentences`, the paper's ≥ 3 sentence floor).
  *
  * Counts are integers and every gate is a boolean over integers/string
  * containment — bit-stable in any engine, no floats anywhere.
  */
object C4Rules {

  /** The line gate as a Column — kept as the cross-check the spec pins
    * [[graft.functions.C4KeptLines]] against (production uses the fused
    * kernel: per-line interpreted lambdas with a regex split each are the
    * finding-46 fragility class). */
  private[llm] def lineKeep(l: Column, minLineWords: Int): Column =
    (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
      size(split(trim(l), "\\s+")) >= minLineWords

  /** Per-document C4 columns:
    * `(idCol, clean_text, n_lines_kept, r_min_sentences, r_no_braces,
    * r_no_lorem, r_no_javascript, keep)` — `clean_text` is the
    * retained-lines rejoin, `keep` the conjunction of the document gates.
    */
  def apply(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val text = col(textCol)
    // Retained lines come from ONE codegen'd kernel call per document
    // (C4RulesSpec pins equality to the Column lineKeep); materialized in
    // a preceding projection because three output columns read it.
    val staged = df.select(col(idCol), text,
      graft.functions.TextKernels.c4KeptLines(text, minLineWords).as("__kept"))
    val keptLines = col("__kept")
    val lowered = lower(text)
    staged.select(
        col(idCol),
        concat_ws("\n", keptLines).as("clean_text"),
        size(keptLines).cast("long").as("n_lines_kept"),
        (size(keptLines) >= minSentences).as("r_min_sentences"),
        (!text.contains("{") && !text.contains("}")).as("r_no_braces"),
        (!lowered.contains("lorem ipsum")).as("r_no_lorem"),
        (!lowered.contains("javascript")).as("r_no_javascript"))
      .withColumn("keep",
        col("r_min_sentences") && col("r_no_braces") &&
        col("r_no_lorem") && col("r_no_javascript"))
  }
}
