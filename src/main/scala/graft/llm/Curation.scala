package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** End-to-end training-data curation: the composition a real pipeline runs,
  * assembled from the individually-certified stages —
  *
  *   language ID → quality gate → exact dedup → near-dup cluster keep →
  *   deterministic sample
  *
  * Stage order is the scale order: the cheap pure-map gates (language,
  * quality) run FIRST so the expensive signature/banding machinery only
  * sees surviving documents; exact dedup (a 32-byte-key shuffle) runs
  * before near-dup (signatures + band join); the sample is last so its
  * rate applies to curated output, not raw input.
  *
  * Every stage is deterministic, so the whole composition hash-checks
  * against a DuckDB oracle built from the same certified SQL fragments
  * (q_text_langid / q_text_quality / q_dedup_exact_rows /
  * q_dedup_minhash_poly / q_sample_hash).
  */
object Curation {

  /** Returns the curated `(idCol)` rows of `docs`, ordered by id. */
  def run(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      lang: String = "en", minQuality: Double = 0.9,
      sampleNum: Long = 1, sampleDen: Long = 2): DataFrame = {
    val id = col(idCol)
    // Language + quality gates: langIdBy is the codegen'd aggregation form;
    // quality is a pure column expression — both map-side.
    val langs = TextAnalysis.langIdBy(docs, idCol, textCol)
      .filter(col("lang_id") === lang)
    val gated = docs.join(langs.select(id), idCol)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(id, col(textCol))
    // Exact dedup: keep the min-id row per sha2-256 content hash.
    val exact = Dedup.exactDedup(gated, textCol, idCol)
    // Near-dup: poly-MinHash signatures (checkpointed once — the band
    // self-join must not recompute them per side), LSH candidates at
    // est_jaccard >= 0.5, connected components, keep min-id per component.
    val sigs = Dedup.minhashSignaturesPoly(exact, idCol, textCol).localCheckpoint()
    val pairs = Dedup.minhashCandidatesFromSigsPlain(sigs)
      .filter(col("est_jaccard") >= 0.5)
    val kept = Dedup.nearDupKeepRows(exact, pairs, idCol)
    // Deterministic holdback last: rate applies to curated docs.
    Sampling.hashSample(kept, id, sampleNum, sampleDen)
      .select(id).orderBy(id)
  }

  /** The round-8 recipe — the gates a modern pretraining pipeline actually
    * chains:
    *
    *   repetition gate → entropy gate → benchmark decontamination →
    *   exact dedup → domain-mixture token-budget sampling
    *
    * Same stage-order discipline as [[run]]: the doc-local quality gates
    * (repetition, entropy — one doc-keyed shuffle each over slim columns)
    * run before the gram-explosion machinery of decontamination; exact
    * dedup's 32-byte-key shuffle sees only clean survivors; the mixture
    * sampler is last so source budgets apply to CURATED token mass (its
    * per-source totals are computed over the deduped frame, by design).
    * Returns `(idCol, sourceCol)` ordered by id.
    */
  def runModern(docs: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source",
      maxDupFrac: Double = 0.55, minEntropyMicro: Long = 2800000L,
      budgets: Map[String, Long]): DataFrame = {
    val id = col(idCol)
    val rep = TextAnalysis.repetitionBy(docs, idCol, textCol)
      .filter(col("dup_token_frac") <= maxDupFrac).select(id)
    val ent = TextAnalysis.charEntropyBy(docs, idCol, textCol)
      .filter(col("entropy_micro") >= minEntropyMicro).select(id)
    val gated = docs.select(id, col(textCol), col(sourceCol))
      .join(rep, idCol).join(ent, idCol)
    val clean = Decontamination.decontaminate(gated, benchmark, idCol, textCol)
    val deduped = Dedup.exactDedup(clean, textCol, idCol)
    Sampling.weightedByTokenBudget(deduped, sourceCol, id,
        TextAnalysis.tokenCount(col(textCol)), budgets)
      .select(id, col(sourceCol)).orderBy(id)
  }
}
