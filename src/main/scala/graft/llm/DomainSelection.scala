package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): pick the raw
  * documents whose hashed-n-gram distribution looks like a TARGET domain
  * (Wikipedia, code, a benchmark's training split), by importance weight
  *
  *   log w(doc) = Σ_features [ log p_target(b) − log p_source(b) ]
  *
  * over hashed uni+bigram feature buckets, then sample proportionally via
  * Gumbel top-k. The standard recipe for "give me 10M documents that look
  * like my domain" — upstream of curation, downstream of dedup.
  *
  * Exactness discipline (the [[TextAnalysis.bigramBackoffScoreAgainst]]
  * contract): every per-feature log-ratio is rounded to integer micro-nats
  * BEFORE the per-doc sum, so the weight is an exact integer under any
  * aggregation order and the DuckDB oracle reproduces it bit-for-bit. The
  * feature hash is the certified poly fingerprint
  * ([[TextAnalysis.fingerprint]], oracle-expressible as a `list_reduce`);
  * smoothing is add-one over the bucket space.
  *
  * Shape at scale:
  *   - the feature stream is a pure map (tokenize → hash → explode); the
  *     count tables are bucket-keyed aggregates with map-side partials,
  *     at most `nBuckets` rows each — they join back BROADCAST;
  *   - the corpus is never shuffled: the only corpus-sized frames are the
  *     map-side feature stream and the per-doc weight aggregate (doc-keyed);
  *   - the feature subtree is deliberately evaluated twice (source counts +
  *     scoring) rather than materialized — at 100 TB a re-run pure map is
  *     cheaper than persisting the exploded position stream;
  *   - resampling is a k-row top-k, not a global sort of the corpus.
  */
object DomainSelection {

  /** Hashed feature-bucket stream `(idCol, __b)`: unigram buckets
    * `fp(w) % nBuckets` plus bigram buckets `fp(w1 ⊔ w2) % nBuckets`, with
    * multiplicity (DSIR's n ∈ {1,2} hashed n-grams).
    */
  private[llm] def features(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame =
    // One codegen'd kernel call per DOC (tokenize → gram → fingerprint →
    // bucket fused, DsirBucketsSpec pins value-and-order equality to the
    // retired Column pipeline), then a flat explode of longs. The former
    // transform(sequence(…)) bigram lambda evaluated INTERPRETED per
    // position (HOFs are CodegenFallback) — slow and JIT-profile-fragile
    // at corpus scale (PLANS.md finding 46).
    df.select(col(idCol),
      explode(graft.functions.TextKernels.dsirBuckets(
        col(textCol), nBuckets)).as("__b"))

  /** Per-document DSIR importance weights of `raw` against `target`:
    * `(idCol, n_feats, logw_micro)` with `logw_micro` the exact integer
    * sum of per-feature micro-nat log-ratios
    * `micro(ln((c_t(b)+1)/(N_t+nBuckets))) − micro(ln((c_s(b)+1)/(N_s+nBuckets)))`,
    * source counts taken from `raw` itself (the paper's q = the raw pool).
    * Each log term is the fixed-point integer log
    * ([[graft.functions.FixedPointLog]] — the same algorithm the DuckDB
    * oracle replays), so no engine-native `ln` reaches a compared value
    * (finding 37: shared rounding of independently computed
    * transcendentals flips at rounding boundaries). Bound: feature counts
    * must stay ≤ ~2·10¹⁶ (the lnNano decimal(20,0) contract) — ~10⁸ docs
    * of 10⁸ grams before it matters.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      nBuckets: Int = 8192): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import graft.functions.FixedPointLog.{microOfNano, withLnNano}
    val nB = lit(nBuckets.toLong)
    val fRaw = features(raw, idCol, textCol, nBuckets)
    val fTgt = features(target, idCol, textCol, nBuckets)
    // The count tables are the TRAINED ARTIFACT (≤ nBuckets rows each) —
    // both sides aggregate in ONE tagged-union pass and ONE checkpoint
    // action (separate per-side checkpoints re-ran the corpus scan and its
    // upstream shuffles once per action), and the totals are derived FROM
    // the tables (Σ counts = positions) instead of separate aggregations:
    // the corpus is touched exactly twice overall — here and in the
    // scoring pass below.
    val counts = fTgt.select(lit(true).as("__tgt"), col("__b"))
      .unionAll(fRaw.select(lit(false).as("__tgt"), col("__b")))
      .groupBy(col("__tgt"), col("__b")).agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val tc = counts.filter(col("__tgt")).select(col("__b"), col("__n").as("__ct"))
    val sc = counts.filter(!col("__tgt")).select(col("__b"), col("__n").as("__cs"))
    // Fail loudly on an empty side (cheap: reads the materialized counts):
    // an empty target would otherwise propagate NULL totals through every
    // log-ratio and rank garbage silently.
    require(!tc.isEmpty, "empty target corpus: no features to fit p_target")
    require(!sc.isEmpty, "empty raw corpus: no features to fit p_source")
    val nt = tc.agg(sum(col("__ct")).as("__nt"))
    val ns = sc.agg(sum(col("__cs")).as("__ns"))
    // The log-ratio is a function of the BUCKET alone, so it is computed
    // on the ≤nBuckets-row counts frame and joined back — never per
    // feature occurrence (the model artifact carries the log, the corpus
    // rows carry a join key — PLANS.md finding 45). Every fRaw bucket
    // exists in sc (sc counts fRaw itself), so the inner join below
    // drops nothing.
    val lr0 = sc
      .join(tc, Seq("__b"), "left")
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(ns))
    val lr = withLnNano(
        withLnNano(lr0, coalesce(col("__ct"), lit(0L)) + lit(1L),
          col("__nt") + nB, "__ltn"),
        col("__cs") + lit(1L), col("__ns") + nB, "__lsn")
      .select(col("__b"),
        (microOfNano(col("__ltn")) - microOfNano(col("__lsn"))).as("__lr"))
    fRaw
      .join(broadcast(lr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as("logw_micro"))
  }

  /** One DoReMi domain-reweighting step (Xie et al. 2023): the
    * exponentiated-gradient update that turns per-document excess loss
    * (proxy model vs reference model) into new domain mixture weights —
    * domains where the proxy still trails the reference get upweighted,
    * solved domains decay toward the smoothing floor. Input is a frame of
    * `(domain, proxy_loss_micro, ref_loss_micro)` — per-doc losses come
    * from upstream scoring operators; this step is pure aggregation:
    *
    *   excess_d = mean(max(0, proxy − ref))            (per-example clip)
    *   w_d ∝ α_d · exp(η · excess_d),  smoothed (1−c)·w + c/k
    *
    * from a uniform prior α. Exactness discipline: the mean is a
    * truncating integer division; `exp` runs in fixed-point integer
    * arithmetic ([[graft.functions.FixedPointExp]] — the same Taylor
    * steps in both engines), so no engine-native transcendental reaches
    * a compared value (shared `round(exp(x), 6)` flips at rounding
    * boundaries when the engines' exp differ by an ulp — PLANS.md
    * finding 37); normalization and smoothing are integer
    * cross-multiplies and truncating divisions — so the distributed
    * aggregation hash-matches a sequential oracle bit-for-bit.
    * Domain bound, ENFORCED by the kernel's guard: η·excess ≤ 2 nats
    * (η_micro·excess_micro ≤ 2·10⁹·10³) — callers with hotter
    * gradients should lower η.
    *
    * Shape at scale: one map-side-partial `groupBy(domain)` over slim
    * (domain, clipped-excess) rows — domains number dozens, so the
    * update itself is a k-row frame with two broadcast one-row totals.
    */
  def doremiStep(df: DataFrame, domainCol: String,
      proxyMicroCol: String, refMicroCol: String,
      etaMicro: Long = 1000000L, smoothMicro: Long = 100000L): DataFrame = {
    require(etaMicro > 0, s"etaMicro must be positive: $etaMicro")
    require(smoothMicro >= 0 && smoothMicro < 1000000L,
      s"smoothMicro must be in [0, 1e6): $smoothMicro")
    val ex = df.select(col(domainCol).as("domain"),
      greatest(col(proxyMicroCol) - col(refMicroCol), lit(0L)).as("__ex"))
    val agg = ex.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ex")).as("__sum"))
      .withColumn("excess_micro", expr("__sum div n_docs"))
    // η·excess in nano-nats (micro·micro → nano is a //1000), then the
    // integer Taylor exp, floored back to micro — every step integer.
    import graft.functions.{FixedPointExp, FixedPointLog}
    val xNano = FixedPointLog.idiv(
      col("excess_micro") * lit(etaMicro), lit(1000L))
    val raw = agg.withColumn("__wraw",
      FixedPointLog.idiv(FixedPointExp.expNanoCol(xNano), lit(1000L)))
    val tot = raw.agg(sum(col("__wraw")).as("__tot"),
      count(lit(1)).as("__k"))
    raw.crossJoin(broadcast(tot))
      .withColumn("weight_micro",
        expr(s"(__wraw * (1000000 - $smoothMicro)) div __tot + $smoothMicro div __k"))
      .select(col("domain"), col("n_docs"), col("excess_micro"),
        col("weight_micro"))
  }

  /** Gumbel top-k importance resampling: keep the `k` documents with the
    * largest `logw_micro + micro(−ln(−ln u_doc))` keys — equivalent to
    * sampling k docs without replacement with probability ∝ w (the
    * Gumbel-max trick), made DETERMINISTIC by deriving each doc's uniform
    * from the certified poly fingerprint of its id:
    * u = (fp(id)+1)/1000000008 ∈ (0, 1). The double-log runs entirely in
    * fixed-point integers ([[graft.functions.FixedPointLog]]: the inner
    * ln(u) on the rational directly, the outer on the nano-nat magnitude
    * over 10⁹, wide variant for the (0, 20.8] outer ratio) — both engines
    * run the same ladder, so keys are identical by construction; the inner
    * result is clamped to ≤ −1 nano before the outer log (u within 10⁻⁹ of
    * 1 would otherwise hit ln(0) — same clamp both engines). Ties break by
    * id. Returns `(idCol, logw_micro, gumbel_key_micro)`, key-descending.
    */
  def resampleTopK(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      nBuckets: Int = 8192): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import graft.functions.FixedPointLog.{microOfNano, withLnNano, withLnNanoWide}
    val w = importanceWeights(raw, target, idCol, textCol, nBuckets)
    val fp1 = TextAnalysis.fingerprint(col(idCol).cast("string")) + lit(1L)
    // Both logs are single codegen'd kernel calls — cheap per row even
    // on this one-row-per-DOC frame (PLANS.md finding 45).
    withLnNanoWide(
        withLnNano(w, fp1, lit(1000000008L), "__lnu")
          .withColumn("__nlu", greatest(-col("__lnu"), lit(1L))),
        col("__nlu"), lit(1000000000L), "__gln")
      .withColumn("gumbel_key_micro", col("logw_micro") + microOfNano(-col("__gln")))
      .select(col(idCol), col("logw_micro"), col("gumbel_key_micro"))
      .orderBy(col("gumbel_key_micro").desc, col(idCol))
      .limit(k)
  }
}
