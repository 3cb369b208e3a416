package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene operator: remove
  * (or mark) corpus documents sharing any word n-gram with an evaluation
  * benchmark, so test data cannot leak into training.
  *
  * Scale shape: both sides explode to DISTINCT word n-grams and reduce to
  * 8-byte polynomial fingerprints ([[TextAnalysis.fingerprint]] — the
  * oracle-reproducible rolling hash) before any join. The benchmark side is
  * broadcast — benchmarks are small by definition (an eval set), while the
  * corpus side never shuffles: contaminated ids come out of map-side
  * broadcast semi-joins + distinct, and the final filter is an anti-join on
  * the (≤ corpus-count) id set. Nothing in the plan is proportional to
  * corpus² and the corpus text bytes never move.
  *
  * The match is EXACT, in two stages. A fingerprint-only equi-join would
  * over-delete at scale: the mod-1e9+7 hash collides pairwise at ~1e-9, so
  * at ~10¹¹ corpus grams (100 TB) spurious matches are EXPECTED, and each
  * one silently drops an innocent training document. Stage 1 probes a
  * long-keyed broadcast set (codegen'd, 8 bytes per benchmark gram — the
  * cheap filter that rejects ~all grams); stage 2 string-confirms only the
  * survivors against the benchmark's (fingerprint, gram) pairs — also
  * benchmark-bounded broadcast, but string equality now runs on a
  * candidate set ~the true contamination size, not the corpus.
  */
object Decontamination {

  /** `(idCol, __g, __fp)` — gram text + fingerprint per (doc, gram).
    * Grams come from the one-pass [[graft.functions.SigKernels]] kernel
    * (same distinct set, same first-occurrence order as
    * `TextAnalysis.wordNgrams` — SigKernelsSpec pins it); the Column form's
    * per-position interpreted transform is the finding-46 fragility class,
    * and this runs corpus-side in every decontamination query. */
  private[llm] def gramFps(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(
        graft.functions.SigKernels.wordNgramsDistinct(col(textCol), n)).as("__g"))
      .select(col(idCol), col("__g"), TextAnalysis.fingerprint(col("__g")).as("__fp"))

  /** The distinct benchmark gram-fingerprint set — compute (or persist)
    * ONCE per benchmark and reuse across batches/streams; it is the small
    * static prefilter side of every contamination check.
    */
  def benchmarkFingerprints(
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    gramFps(benchmark, idCol, textCol, n).select(col("__fp")).distinct()

  /** Distinct benchmark `(__fp, __g)` pairs — the exact-confirmation side.
    * Same benchmark-bounded size as the fingerprints plus the gram text.
    */
  def benchmarkGrams(
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    gramFps(benchmark, idCol, textCol, n).select(col("__fp"), col("__g")).distinct()

  /** Ids of corpus documents sharing ≥1 word n-gram with the benchmark —
    * exact string match, fingerprint-prefiltered. Distinct ids, one row
    * each. A fingerprint collision (different gram, same hash) survives
    * stage 1 but is rejected by the stage-2 string confirm, so no document
    * is dropped for a gram it does not actually share.
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
      .join(broadcast(benchmarkGrams(benchmark, idCol, textCol, n)),
        Seq("__fp", "__g"), "left_semi")
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

  /** SEMANTIC decontamination — the embedding-space companion to the
    * lexical n-gram gate: drop corpus documents whose embedding is within
    * `threshold` cosine of ANY benchmark embedding (catches paraphrased /
    * reformatted eval leakage that no exact n-gram survives; the check
    * modern model cards run alongside exact decontamination).
    *
    * Shape at scale: the benchmark frame is eval-set-sized — BOUNDED, like
    * a gram catalog — so it broadcasts whole and the corpus is never
    * shuffled: one codegen'd pass computes each corpus row's max cosine
    * against the broadcast benchmark vectors via the [[Similarity]] IVF
    * discipline's exact kernels (an `exists` over the broadcast side), and
    * the contaminated-id set feeds the usual `left_anti`. Work is
    * O(corpus × |benchmark|) multiply-adds, embarrassingly parallel, no
    * candidate-pair materialization.
    */
  def semanticContaminatedIds(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    // Broadcast nested-loop SEMI join on the cosine predicate: each corpus
    // row short-circuits at its first over-threshold benchmark match, and
    // only (idCol) survives. A literal-folded OR of per-vector cosines
    // would bake |benchmark|·dim doubles into generated code — fine for 10
    // vectors, fatal for an eval set.
    val b = broadcast(benchmark.select(col(embCol).as("__bemb")))
    corpus.join(b,
        graft.functions.ArrayOps.cosine(col(embCol), col("__bemb")) >= threshold,
        "left_semi")
      .select(col(idCol))
  }

  /** The corpus with semantically-contaminated rows removed. */
  def semanticDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    corpus.join(
      semanticContaminatedIds(corpus, benchmark, threshold, idCol, embCol),
      Seq(idCol), "left_anti")

  /** FUZZY (MinHash) decontamination — near-duplicate benchmark overlap,
    * the gate the exact n-gram check cannot provide: a lightly reworded or
    * re-whitespaced eval item shares no 8-gram with its source, but its
    * shingle set — and therefore its MinHash signature — barely moves.
    * Drops every corpus document whose estimated Jaccard against ANY
    * benchmark document reaches `threshold` (the discipline used for The
    * Stack / StarCoder training sets).
    *
    * Shape at scale, one pass over the corpus:
    *   - corpus and benchmark both reduce to numHashes-slot MinHash
    *     signatures (codegen'd kernel; the corpus text never shuffles);
    *   - the benchmark side explodes to LSH band keys and broadcasts —
    *     bands × |benchmark| rows carrying one signature each (~0.5 KB at
    *     64 slots), eval-set-bounded like the gram catalogs above. For an
    *     unusually large benchmark drop the hint and let AQE decide;
    *   - candidates come from the broadcast (band, key) equi-join — never
    *     corpus × benchmark — and the signature estimator (matching-slot
    *     fraction) confirms in the SAME map task, since the broadcast row
    *     already carries the benchmark signature: no second join, no
    *     candidate-pair shuffle; only the (≤ corpus) contaminated-id set
    *     moves.
    *
    * Estimator caveat (inherent to MinHash, not this plan): est-Jaccard at
    * 64 slots has σ ≈ 0.05 near t=0.8, so documents straddling the
    * threshold can flip either way; band collisions below threshold are
    * rejected by the estimator, and a doc with no benchmark band collision
    * is never inspected (P(miss) = (1−t^r)^b — <1e-5 at t=0.8 with 16×4).
    * `poly = true` swaps in the polynomial hash family and plain band keys
    * ([[Dedup.minhashSignaturesPoly]] / [[Dedup.lshBandKeysPlain]]) so a
    * SQL oracle can reproduce every slot exactly; murmur3 + xxhash64 band
    * keys stay the scale default.
    */
  def fuzzyContaminatedIds(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      poly: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide into bands ($bands)")
    val rowsPerBand = numHashes / bands
    def sigs(df: DataFrame): DataFrame =
      if (poly) Dedup.minhashSignaturesPoly(df, idCol, textCol, numHashes, shingleSize)
      else Dedup.minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    def keys(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (poly) Dedup.lshBandKeysPlain(sig, bands, rowsPerBand)
      else Dedup.lshBandKeys(sig, bands, rowsPerBand)
    val c = sigs(corpus)
      .select(col("id"), col("sig"), explode(keys(col("sig"))).as("bk"))
      .select(col("id"), col("sig"),
        col("bk.band").as("__band"), col("bk.key").as("__key"))
    val b = sigs(benchmark)
      .select(col("sig").as("__bsig"), explode(keys(col("sig"))).as("bk"))
      .select(col("__bsig"), col("bk.band").as("__band"), col("bk.key").as("__key"))
    c.join(broadcast(b), Seq("__band", "__key"))
      // codegen'd equal-slot kernel; the zip_with/filter HOF form was
      // CodegenFallback (same exact count — SigKernelsSpec pins it)
      .filter(graft.functions.SigKernels.eqSlotCount(col("sig"), col("__bsig"))
        .cast("double") / lit(numHashes.toDouble) >= threshold)
      .select(col("id").as(idCol)).distinct()
  }

  /** The corpus with fuzzily-contaminated documents removed. Same
    * no-broadcast-hint reasoning as [[decontaminate]]: the drop set is
    * corpus-bounded in the worst case.
    */
  def fuzzyDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      poly: Boolean = false): DataFrame =
    corpus.join(
      fuzzyContaminatedIds(corpus, benchmark, threshold, idCol, textCol,
        numHashes, bands, shingleSize, poly),
      Seq(idCol), "left_anti")

  /** Token positions (0-based) in each corpus doc whose n-gram exactly
    * matches a benchmark gram — the SPAN-granularity contamination signal.
    * Same exactness discipline as [[contaminatedIds]] (broadcast
    * fingerprint prefilter, string confirm on survivors — a collision
    * cannot mask a clean span as contaminated), with the positioned
    * stage-2 shape of [[SubstringDedup]]: candidates group per doc so each
    * doc's text is fetched and tokenized once, one slice per candidate.
    */
  def contaminatedPositions(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame = {
    val fps = SubstringDedup.gramFps(corpus, idCol, textCol, n)
    val cand = fps.join(
      broadcast(benchmarkFingerprints(benchmark, idCol, textCol, n)),
      Seq("__fp"), "left_semi")
    val perDoc = cand.groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("__fp"))).as("__cs"))
    corpus.join(perDoc, Seq(idCol))
      .select(col(idCol), TextAnalysis.tokensWs(col(textCol)).as("__w"),
        explode(col("__cs")).as("__c"))
      .select(col(idCol), col("__c.pos").as("pos"), col("__c.__fp").as("__fp"),
        concat_ws(" ", slice(col("__w"), col("__c.pos") + 1, lit(n))).as("__g"))
      .join(broadcast(benchmarkGrams(benchmark, idCol, textCol, n)),
        Seq("__fp", "__g"), "left_semi")
      .select(col(idCol), col("pos").cast("long").as("pos"))
  }

  /** Maximal contaminated token spans per doc (gaps-and-islands merge of
    * [[contaminatedPositions]], n-adjacency).
    */
  def contaminatedSpans(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    SubstringDedup.mergePositionsToSpans(
      contaminatedPositions(corpus, benchmark, idCol, textCol, n), idCol, n)

  /** Span-level decontamination: MASK the benchmark-overlapping spans and
    * keep the documents — the localized-contamination alternative to
    * whole-document removal (a long document quoting one benchmark item
    * loses the quote, not its other ten thousand clean tokens). Documents
    * with no contamination keep their text VERBATIM; a fully-covered
    * document becomes the empty string (filter afterwards if empties
    * should drop).
    */
  def maskContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame =
    SubstringDedup.removeSpans(corpus,
      contaminatedSpans(corpus, benchmark, idCol, textCol, n), idCol, textCol)
}
