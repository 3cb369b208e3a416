package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.FixedPointLog

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
  *     word distributions, as a sum of PER-WORD INTEGER micro-nats.
  *     Every per-word term is INTEGER-EXACT end to end: the log runs in
  *     fixed-point over the exact rational `2*ca*totb : (ca*totb +
  *     cb*tota)` ([[graft.functions.FixedPointLog]]), so no engine-native
  *     `ln` ever reaches a compared value. The previous formulation
  *     rounded a per-word DOUBLE `ln` to micro-nats; with thousands of
  *     words a one-ulp cross-engine `ln` divergence flips a rounding
  *     boundary somewhere (round-10 driver run, hash-FAIL). Shared
  *     rounding of transcendentals is not a determinism discipline;
  *     integer arithmetic is.
  *
  * Scale shape: both corpora reduce to their word-count frames (one
  * shuffle each, map-side partials, vocabulary-sized); the report is a
  * full-outer join of the two count frames plus slim scalar aggregates —
  * nothing corpus-sized moves after the first pass. The fixed-point log
  * needs per-side token totals ≤ 1.4e8 (int64 headroom for the per-word
  * cross products, see [[FixedPointLog]] bounds) — ENFORCED with a
  * raise_error on the totals row, so an oversized corpus fails loudly
  * instead of silently wrapping while the HUGEINT oracle doesn't.
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
    val totalsRaw = joined.agg(
      sum(col("ca")).as("tota"), sum(col("cb")).as("totb"),
      count(lit(1)).as("vunion"),
      sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)).as("vboth"),
      sum(when(col("ca") === 0, col("cb")).otherwise(0L)).as("unseen_cb"))
    // The int64 bound above is ENFORCED, not assumed: with a side past
    // ~1.4e8 tokens, ca*totb / cb*tota (and ca*la at |la| ≤ ~45e9
    // nano-nats) wrap silently past 2^63 on this side while the DuckDB
    // oracle computes in HUGEINT — a silent hash divergence. Fail loudly
    // instead (the winnowFingerprints discipline); corpora that large
    // should drift-compare on a sampled or per-source slice.
    val totLim = 140000000L // floor(sqrt(2e16)): caps ca*totb and ca*la in int64
    val totals = totalsRaw.withColumn("tota",
      when(col("tota") <= totLim && col("totb") <= totLim, col("tota"))
        .otherwise(raise_error(concat(
          lit("CorpusDrift: side exceeds 1.4e8 tokens (int64 JS-term bound): tota="),
          col("tota").cast("string"), lit(" totb="), col("totb").cast("string")))))
    // Per-word JS term in micro-nats, all-integer: with a = ca/tota,
    // b = cb/totb, m = (a+b)/2, the log arguments a/m and b/m are the
    // exact rationals 2*ca*totb/qq and 2*cb*tota/qq with
    // qq = ca*totb + cb*tota; each weighted term ca*ln(a/m)/tota runs in
    // nano-nats via fixed-point, then the pair rounds to micro-nats.
    // Both logs are single codegen'd calls into the fixed-point JVM
    // kernel (PLANS.md finding 45).
    val withP = FixedPointLog.withLnNano(
        FixedPointLog.withLnNano(
          joined.crossJoin(broadcast(totals))
            .withColumn("xa", col("ca") * col("totb"))
            .withColumn("xb", col("cb") * col("tota"))
            .withColumn("qq", col("xa") + col("xb")),
          lit(2L) * col("xa"), col("qq"), "la"),
        lit(2L) * col("xb"), col("qq"), "lb")
      .withColumn("wua", when(col("ca") > 0,
        FixedPointLog.fdiv(col("ca") * col("la"), col("tota"))).otherwise(0L))
      .withColumn("wub", when(col("cb") > 0,
        FixedPointLog.fdiv(col("cb") * col("lb"), col("totb"))).otherwise(0L))
    val js = withP.select(
      FixedPointLog.fdiv(col("wua") + col("wub") + lit(1000L), lit(2000L))
        .as("term"))
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
