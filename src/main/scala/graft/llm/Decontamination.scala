package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene operator: remove
  * (or mark) corpus documents sharing any word n-gram with an evaluation
  * benchmark, so test data cannot leak into training.
  *
  * Scale shape: both sides explode to DISTINCT word n-grams and reduce to
  * 8-byte polynomial fingerprints ([[TextAnalysis.fingerprint]] — the
  * oracle-reproducible rolling hash) before any join, so the match carries
  * one long per gram instead of the gram text. The benchmark side is
  * broadcast — benchmarks are small by definition (an eval set), while the
  * corpus side never shuffles: contaminated ids come out of a map-side
  * broadcast semi-join + distinct, and the final filter is a broadcast
  * anti-join on the (≤ corpus-count) id set. Nothing in the plan is
  * proportional to corpus² and the corpus text bytes never move.
  */
object Decontamination {

  /** `(idCol, __fp)` gram fingerprints of a document frame. */
  private[llm] def gramFps(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__g"))
      .select(col(idCol), TextAnalysis.fingerprint(col("__g")).as("__fp"))

  /** The distinct benchmark gram-fingerprint set — compute (or persist)
    * ONCE per benchmark and reuse across batches/streams; it is the small
    * static side of every contamination check.
    */
  def benchmarkFingerprints(
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    gramFps(benchmark, idCol, textCol, n).select(col("__fp")).distinct()

  /** Ids of corpus documents sharing ≥1 word n-gram fingerprint with the
    * benchmark. Distinct ids, one row each.
    */
  def contaminatedIds(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    gramFps(corpus, idCol, textCol, n)
      .join(broadcast(benchmarkFingerprints(benchmark, idCol, textCol, n)),
        Seq("__fp"), "left_semi")
      .select(col(idCol)).distinct()

  /** The corpus with contaminated documents removed. NO broadcast hint on
    * the anti-join: the contaminated id set is bounded by CORPUS size (in
    * the worst case everything matches), so hinting it would be the
    * unbounded-broadcast mistake — AQE broadcasts it when it measures
    * small, and the fallback is a shuffled anti-join on an 8-byte key.
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    corpus.join(contaminatedIds(corpus, benchmark, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
