package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{FrozenLm, LmKernels}
import graft.llm.TextAnalysis

/** The ingestion-time perplexity gate — CCNet's deployment shape. The LM
  * is a batch-trained frozen artifact ([[TextAnalysis.freezeLm]] over the
  * reference corpus); scoring is a stateless one-pass kernel per document
  * (no shuffle, no state store, no stream-side aggregation), so the gate
  * composes with any output mode / watermark discipline unchanged, exactly
  * like a filter — and the SAME code scores a batch backfill.
  *
  * Exactness: the kernels are bit-identical to the relational
  * [[TextAnalysis.bigramBackoffScoreAgainst]] (q_lm_frozen pins both
  * implementations against one oracle), so a document admitted by the
  * live gate is exactly the document the batch pipeline would admit.
  */
object StreamingLmGate {

  /** (id, n_tokens, n_bigram_hits, logp_micro) per stream document —
    * schema-identical to the batch scorer.
    */
  def scoreWithFrozenLm(stream: DataFrame, lm: FrozenLm,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    stream.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      LmKernels.lmBigramHits(col(textCol), lm).as("n_bigram_hits"),
      LmKernels.lmLogpMicro(col(textCol), lm).as("logp_micro"))

  /** Keep documents at or below `maxNormMicro` per-token negated
    * micro-nats (lower = more fluent) — the threshold is the frozen twin
    * of a [[TextAnalysis.perplexityBuckets]] cut, computed batch-side and
    * shipped as a constant. Passes the original columns through.
    */
  def perplexityGate(stream: DataFrame, lm: FrozenLm, maxNormMicro: Long,
      textCol: String = "text"): DataFrame =
    stream
      .withColumn("__lp", LmKernels.lmLogpMicro(col(textCol), lm))
      .withColumn("__nt", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .filter(expr("(-__lp) DIV __nt") <= maxNormMicro) // exact integer DIV
      .drop("__lp", "__nt")
}
