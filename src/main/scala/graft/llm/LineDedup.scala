package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-level exact deduplication — the RefinedWeb/MassiveText curation
  * stage between document-level dedup and substring dedup: a LINE (nav
  * menu item, cookie banner, copyright footer) that recurs across ≥
  * `minDocs` distinct documents is boilerplate and is removed from every
  * document it appears in, while the surrounding unique prose stays.
  * Document dedup can't see it (each page is globally unique) and
  * substring dedup targets long spans; repeated single lines are their own
  * operator in the published recipes (ref: RefinedWeb §"line-wise
  * corrections", MassiveText quality filtering; PAPERS.md).
  *
  * Exactness discipline (the [[Decontamination]] two-stage shape): the
  * corpus-wide frequency count runs over 8-byte `xxhash64` line
  * fingerprints — a slim shuffle key — and then CONFIRMS on the line
  * string itself before anything is removed, so a fingerprint collision
  * between a unique line and a frequent line cannot delete unique text, at
  * any corpus size. Only candidate lines (those whose fingerprint already
  * cleared `minDocs`) ever shuffle their string bytes.
  *
  * Scale shape: explode → two slim aggregations → one broadcast-or-
  * shuffled semi-join back → one doc-keyed reassembly shuffle. Nothing is
  * ∝ corpus²; the frequent-line set is by construction tiny relative to
  * the corpus (it's the text shared across many documents).
  */
object LineDedup {

  /** (id, line_idx, line) — documents split on newlines, positions kept.
    * Blank lines are preserved here (removal decisions belong to callers);
    * they are never *frequency-counted* as boilerplate though, since the
    * empty line trivially recurs everywhere and removing it would reflow
    * every document.
    */
  def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))

  /** Lines occurring in ≥ `minDocs` DISTINCT documents, string-confirmed:
    * returns (line, n_docs). Stage 1 counts over fingerprints (8-byte
    * shuffle); stage 2 recounts over the string for fingerprint survivors
    * only.
    */
  def frequentLines(df: DataFrame, idCol: String, textCol: String, minDocs: Long): DataFrame = {
    val lines = explodeLines(df, idCol, textCol).filter(col("line") =!= "")
      .select(col("id"), col("line"), xxhash64(col("line")).as("fp"))
    val hotFps = lines.groupBy(col("fp")).agg(countDistinct(col("id")).as("n"))
      .filter(col("n") >= minDocs).select(col("fp"))
    // string-confirm: recount per (line), not per (fp) — collisions split here
    lines.join(hotFps, Seq("fp"), "left_semi")
      .groupBy(col("line")).agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** INTRA-document line dedup — the C4-family cleaning step cross-doc
    * line dedup does not cover: within each document, only the FIRST
    * occurrence of a line survives (scraped pages repeat their own nav/
    * cookie banners several times per page), and survivors rejoin in
    * original order. Blank lines are structural, not content — every one
    * survives. One window keyed on (doc, line) — per-document state, no
    * corpus-wide frequency table, so it composes BEFORE the cross-doc
    * pass (dedup your own repeats, then the corpus's).
    */
  def dedupLinesWithin(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = explodeLines(df, idCol, textCol)
    val w = Window.partitionBy(col("id"), col("line")).orderBy(col("line_idx"))
    val kept = lines
      .withColumn("__rn", row_number().over(w))
      .filter(col("line") === "" || col("__rn") === 1)
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("line_idx"), col("line")))).as("ls"))
      .select(col("id"),
        array_join(transform(col("ls"), x => x.getField("line")), "\n").as("text"))
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  /** Remove every frequent line (per [[frequentLines]]) from every
    * document; returns (id, text) with surviving lines rejoined in their
    * original order. Documents made of nothing but boilerplate come back
    * as the empty string — they remain ACCOUNTED rows (a later length
    * filter may drop them; this operator doesn't).
    */
  def removeFrequentLines(
      df: DataFrame, idCol: String, textCol: String, minDocs: Long): DataFrame = {
    val hot = frequentLines(df, idCol, textCol, minDocs)
      .select(col("line").as("__hot_line"))
    val lines = explodeLines(df, idCol, textCol)
    val kept = lines.join(broadcast(hot), col("line") === col("__hot_line"), "left_anti")
    // reassemble: one shuffle on the doc key; order restored from line_idx
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("line_idx"), col("line")))).as("ls"))
      .select(col("id"),
        array_join(transform(col("ls"), x => x.getField("line")), "\n").as("text"))
    // all-boilerplate docs lost every line above; restore them as '' rows
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }
}
