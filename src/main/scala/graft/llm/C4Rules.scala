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

  private def lineKeep(l: Column, minLineWords: Int): Column =
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
    // Materialize the retained-lines array once (the GopherRules staging
    // discipline): it feeds three output columns, and HOFs re-evaluate
    // interpreted when inlined.
    val staged = df.select(col(idCol), text,
      filter(split(text, "\n"), l => lineKeep(l, minLineWords)).as("__kept"))
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
