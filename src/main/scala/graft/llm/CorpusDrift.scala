package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift report — the regression check a pipeline runs when a crawl
  * refresh (or a new source mix) replaces the corpus a model was tuned on:
  * did the vocabulary, the word distribution, and the document shape move?
  *
  * One row out, four metrics:
  *   - `vocab_jaccard`  — |V_ref ∩ V_cand| / |V_ref ∪ V_cand| (exact
  *     integer counts, one division);
  *   - `unseen_mass`    — fraction of candidate TOKEN mass whose word the
  *     reference has never seen (the "new-web" share);
  *   - `mean_len_delta` — mean candidate doc length (chars) minus mean
  *     reference doc length;
  *   - `js_micro_nats`  — Jensen–Shannon divergence of the two unigram
  *     word distributions, reported as a sum of PER-WORD INTEGER
  *     micro-nats (each word's term rounded to 1e-6 nats before the sum
  *     — the [[TextAnalysis]] LM discipline: float cross-row summation is
  *     order-dependent and therefore engine-dependent, integer summation
  *     is exact; JS is bounded by ln 2 so the quantization loses nothing
  *     that matters at report granularity).
  *
  * Scale shape: both corpora reduce to their word-count frames (one
  * shuffle each, map-side partials, vocabulary-sized); the report is a
  * full-outer join of the two count frames plus slim scalar aggregates —
  * nothing corpus-sized moves after the first pass.
  */
object CorpusDrift {

  def report(
      ref: DataFrame,
      cand: DataFrame,
      textCol: String = "text"): DataFrame = {
    val ra = Bpe.wordCounts(ref, textCol)
      .select(col("w"), col("n").as("ca"))
    val rb = Bpe.wordCounts(cand, textCol)
      .select(col("w"), col("n").as("cb"))
    val joined = ra.join(rb, Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint() // consumed by totals AND the per-word term sum
    val totals = joined.agg(
      sum(col("ca")).as("tota"), sum(col("cb")).as("totb"),
      count(lit(1)).as("vunion"),
      sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)).as("vboth"),
      sum(when(col("ca") === 0, col("cb")).otherwise(0L)).as("unseen_cb"))
    val withP = joined.crossJoin(broadcast(totals))
      .withColumn("a", col("ca").cast("double") / col("tota").cast("double"))
      .withColumn("b", col("cb").cast("double") / col("totb").cast("double"))
    // Per-word JS term in micro-nats: the double arithmetic is one
    // straight-line expression (mirrored textually by the oracle), the
    // rounding to integers happens per word, and only integers cross rows.
    val js = withP.select(
      round((
        (when(col("ca") > 0,
            col("a") * log(col("a") / ((col("a") + col("b")) / 2)))
          .otherwise(lit(0.0)) * 0.5) +
        (when(col("cb") > 0,
            col("b") * log(col("b") / ((col("a") + col("b")) / 2)))
          .otherwise(lit(0.0)) * 0.5)
        ) * 1000000.0).cast("long").as("term"))
      .agg(sum(col("term")).as("js_micro_nats"))
    val lens = ref.agg(
        sum(length(col(textCol)).cast("long")).as("la"),
        count(lit(1)).as("na"))
      .crossJoin(cand.agg(
        sum(length(col(textCol)).cast("long")).as("lb"),
        count(lit(1)).as("nb")))
    totals.crossJoin(js).crossJoin(lens).select(
      (col("vboth").cast("double") / col("vunion").cast("double"))
        .as("vocab_jaccard"),
      (col("unseen_cb").cast("double") / col("totb").cast("double"))
        .as("unseen_mass"),
      (col("lb").cast("double") / col("nb").cast("double") -
        col("la").cast("double") / col("na").cast("double"))
        .as("mean_len_delta"),
      col("js_micro_nats"))
  }
}
