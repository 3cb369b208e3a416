package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the GPT-style pretraining batcher: documents are
  * deterministically shuffled into `shards` independent token streams, each
  * stream is concatenated in shuffle order and cut into fixed
  * `budget`-token chunks. A document's placement is fully described by
  * (shard, chunk, offset, spans_boundary); documents MAY span a chunk
  * boundary (concat-and-chunk semantics — the standard pretraining layout,
  * where the chunker does not respect document edges).
  *
  * Scale shape: ONE shuffle (the per-shard window sort). The shard is the
  * parallelism knob — each shard's stream is packed by one task's sorted
  * window, so pick `shards` ≈ cluster parallelism and a shard's documents
  * fit a task (at 100 TB: thousands of shards; the streams are independent
  * by construction, so more shards never changes any document's chunk
  * within its shard). The deterministic Knuth-mix shuffle both randomizes
  * train order and balances shards; being bijective mod 2^32 it is
  * tie-free and exactly reproducible in ANSI SQL (the `Sampling` mix).
  */
object Packing {

  /** `(id, n_tokens, shard, chunk, offset, spans_boundary)` for every doc.
    *
    * `offset` is the document's start position within its chunk;
    * `chunk` is the chunk its first token lands in (per shard);
    * `spans_boundary` marks documents crossing into the next chunk.
    */
  def pack(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int,
      seed: Long = 0L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    require(seed >= 0, s"seed must be non-negative: $seed")
    // Epoch reshuffle: a different seed gives a different bijective
    // mod-2^32 order AND shard assignment over the same corpus — the
    // standard per-epoch reshuffle, still tie-free and SQL-replayable as
    // ((id + seed) · C) mod 2^32. Routed through Sampling.mix32 (the
    // 16/16-bit split), so the product never overflows int64 under ANSI
    // at any id magnitude (the finding-59a lesson); seed 0 is bit-equal
    // to the historical id·C formula.
    val mix = graft.ops.Sampling.mix32(col(idCol).cast("long") + seed)
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("__mix"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), tokenCount.cast("long").as("n_tokens"))
      .withColumn("__mix", mix)
      .withColumn("__shard", (col("__mix") % shards).cast("int"))
      .withColumn("__pre", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol),
        col("n_tokens"),
        col("__shard").as("shard"),
        expr(s"__pre DIV ${budget}L").as("chunk"),
        (col("__pre") % budget).as("offset"),
        ((col("__pre") % budget) + col("n_tokens") > budget).as("spans_boundary"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022): a deterministic
    * fraction of documents reorders to `<PRE> prefix <SUF> suffix <MID>
    * middle` (PSM) so an autoregressive model learns infilling from the
    * same corpus — the standard code-model data op. Everything derives
    * from the certified poly fingerprint of the doc id (no RNG): the
    * fim/keep coin is `fp(id⊔":fim") mod 1000 < fimPermille`, the two
    * split points are independent fingerprints mod (len+1) sorted, so
    * prefix/middle/suffix partition the ORIGINAL text exactly
    * (reassembly is spec-certified) and the whole transform — a pure
    * codegen'd map, no shuffle — replays bit-exact in SQL `substr`.
    * Untransformed rows pass through with null splits (the paper trains
    * on a mixture).
    */
  def fimTransform(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", fimPermille: Long = 500L,
      pre: String = "<PRE>", suf: String = "<SUF>",
      mid: String = "<MID>"): DataFrame = {
    require(fimPermille >= 0 && fimPermille <= 1000,
      s"fimPermille must be in [0, 1000]: $fimPermille")
    val len = length(col(textCol)).cast("long")
    def fp(tag: String) = TextAnalysis.fingerprint(
      concat(col(idCol).cast("string"), lit(tag)))
    val sel = pmod(fp(":fim"), lit(1000L)) < fimPermille
    val u1 = pmod(fp(":a"), len + 1L)
    val u2 = pmod(fp(":b"), len + 1L)
    val a = least(u1, u2)
    val b = greatest(u1, u2)
    // substr needs int positions (text length is int-bounded anyway)
    val ai = a.cast("int"); val bi = b.cast("int"); val li = len.cast("int")
    val fimText = concat(
      lit(pre), col(textCol).substr(lit(1), ai),
      lit(suf), col(textCol).substr(bi + 1, li - bi),
      lit(mid), col(textCol).substr(ai + 1, bi - ai))
    df.select(col(idCol),
      sel.as("fim"),
      when(sel, a).as("split_a"),
      when(sel, b).as("split_b"),
      when(sel, fimText).otherwise(col(textCol)).as("out_text"))
  }

  /** No-split greedy packing — the third packing regime next to
    * concat-and-chunk [[pack]] (documents cross chunk boundaries) and
    * power-of-two [[lengthBuckets]] (padded slots): documents NEVER
    * cross a sequence boundary. Greedy next-fit in the deterministic mix
    * order: a sequence closes when the next document does not fit;
    * over-budget documents occupy a sequence alone (surfaced via
    * `oversize`, never silently truncated). The regime finetune/eval
    * batching wants — no cross-document attention contamination, no
    * block-diagonal mask metadata needed, bounded padding waste.
    *
    * Sequence assignment is a NON-ASSOCIATIVE prefix fold (each boundary
    * depends on the running occupancy, which resets on close) — the one
    * shape windows genuinely cannot express (SURVEY §7.4 decision table,
    * case (d)). So: shard-hash repartition + within-partition sort + ONE
    * sequential pass per shard in `mapPartitions`, O(1) state per task.
    * The shard count is the parallelism knob exactly as in [[pack]];
    * determinism is by construction (the scan order is the sorted
    * (shard, mix, id) order regardless of input partitioning). The
    * oracle replays the fold as a recursive CTE.
    */
  def packNoSplit(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int,
      seed: Long = 0L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    require(seed >= 0, s"seed must be non-negative: $seed")
    val s = df.sparkSession
    import s.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        tokenCount.cast("long").as("n"))
      .withColumn("__mix", graft.ops.Sampling.mix32(col("id") + seed))
      .withColumn("__shard", pmod(col("__mix"), lit(shards.toLong)).cast("int"))
    val parted = base
      .repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__mix"), col("id"))
      .select(col("__shard"), col("id"), col("n"))
      .as[(Int, Long, Long)]
    parted.mapPartitions { it =>
      var curShard = Int.MinValue
      var seq = 0L
      var cum = 0L
      it.map { case (sh, id, n) =>
        if (sh != curShard) { curShard = sh; seq = 0L; cum = 0L }
        else if (cum > 0 && cum + n > budget) { seq += 1; cum = 0L }
        val off = cum
        cum += n
        (id, n, sh, seq, off, n > budget)
      }
    }.toDF(idCol, "n_tokens", "shard", "seq", "offset", "oversize")
  }

  /** Per-(shard, seq) occupancy for [[packNoSplit]] — the padding-waste
    * view that decides between this regime and [[lengthBuckets]] for a
    * given corpus: docs and token mass per sequence, whether it holds an
    * oversize doc, and the pad waste (budget − tokens; zero for an
    * oversize sequence — that one truncates or re-routes downstream and
    * is flagged, it is not padded). One aggregation over the placement.
    */
  def packNoSplitStats(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    packed.groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        max(col("oversize")).as("has_oversize"))
      .withColumn("pad_waste", when(col("has_oversize"), lit(0L))
        .otherwise(lit(budget) - col("n_tokens")))
  }

  /** Span-corruption transform (the T5 pretraining objective, Raffel 2020
    * §3.1.4): mask ~`ratePermille`‰ of each document's tokens in spans of
    * mean length `meanSpan`, emitting the sentinel-joined `inputs` /
    * `targets` pair (`inputs` = text with span k replaced by
    * `<extra_id_k>`; `targets` = every `<extra_id_k>` + its masked tokens,
    * closed by the final sentinel). Deterministic twin of the paper's
    * random corruption — every pipeline run places identical spans:
    *
    *  - c = (n·rate) div 1000 masked tokens over m = max(1, c div 3)
    *    spans; span k takes L_k = c div m (+1 for k < c mod m) tokens;
    *  - token positions split into m segments by the exact floor-division
    *    inverse pair (segment of i = (i·m) div n ⟺ segment k starts at
    *    ceil(n·k/m)), span k lands INSIDE segment k at an offset drawn
    *    from the doc's poly fingerprint through one Knuth-mix step — so
    *    spans can never overlap or touch out-of-segment tokens, and every
    *    derivation replays term-for-term in ANSI SQL;
    *  - documents under `minTokens` (or rating to c = 0) pass through
    *    unmasked with empty targets (the paper trains on a mixture).
    *
    * Scale shape: a pure codegen'd map over the corpus — no shuffle, no
    * RNG state, no driver work; the per-row cost is O(tokens + spans)
    * (the span table is built once per row and indexed per token).
    */
  def spanCorruption(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ratePermille: Long = 150L,
      meanSpan: Long = 3L, minTokens: Long = 10L): DataFrame = {
    require(ratePermille > 0 && ratePermille <= 500,
      s"ratePermille must be in (0, 500]: $ratePermille")
    require(meanSpan > 0, s"meanSpan must be positive: $meanSpan")
    require(minTokens > meanSpan, s"minTokens must exceed meanSpan")
    import graft.functions.FixedPointLog.idiv
    // Every row-level derivation is STAGED as its own column before any
    // higher-order function references it: inside a HOF lambda only
    // AttributeReferences are O(1) per element — any larger subtree
    // (the split, the fingerprint fold, even size()) re-evaluates PER
    // TOKEN in the interpreted lambda body, turning the map O(tokens²)
    // (measured: 22.8 s → ~1 s at sf0.1 for this query).
    val masked = col("__n") >= minTokens && col("__c") >= 1L
    // Span table: one struct per span k — start (0-based token index) and
    // length, confined to segment k (segment k = positions with
    // (i·m) div n = k, i.e. [ceil(nk/m), ceil(n(k+1)/m)) — the exact
    // floor-division inverse pair, so the per-token lookup below is a
    // direct index, no search). All arithmetic is exact IntegralDivide.
    val spans = transform(sequence(lit(0L), col("__m") - 1L), k => {
      val n = col("__n"); val c = col("__c"); val m = col("__m")
      val segStart = idiv(n * k + m - 1L, m)
      val segEnd = idiv(n * (k + 1L) + m - 1L, m)
      val segLen = segEnd - segStart
      val lRaw = idiv(c, m) + when(k < c % m, lit(1L)).otherwise(lit(0L))
      val l = least(lRaw, segLen)
      val h = (col("__fpb") + k) * lit(2654435761L) % lit(4294967296L)
      val start = segStart + pmod(h, segLen - l + 1L)
      struct(start.as("s"), l.as("l"))
    })
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"),
        TextAnalysis.fingerprint(
          concat(col(idCol).cast("string"), lit(":sm"))).as("__fpb"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__c", idiv(col("__n") * ratePermille, lit(1000L)))
      .withColumn("__m", greatest(lit(1L), idiv(col("__c"), lit(meanSpan))))
      .withColumn("__spans", when(masked, spans))
      .withColumn("n_tokens", col("__n"))
      .withColumn("n_spans", when(masked, col("__m")).otherwise(lit(0L)))
      .withColumn("inputs",
        when(masked,
          array_join(filter(
            transform(sequence(lit(0L), col("__n") - 1L), i => {
              val k = idiv(i * col("__m"), col("__n"))
              val sp = element_at(col("__spans"), (k + 1L).cast("int"))
              when(i < sp.getField("s") || i >= sp.getField("s") + sp.getField("l"),
                element_at(col("__toks"), (i + 1L).cast("int")))
                .when(i === sp.getField("s"),
                  concat(lit("<extra_id_"), k.cast("string"), lit(">")))
                .otherwise(lit(null).cast("string"))
            }), x => x.isNotNull), " "))
          .otherwise(array_join(col("__toks"), " ")))
      .withColumn("targets",
        when(masked,
          concat(
            array_join(transform(col("__spans"),
              (sp, k) => concat(lit("<extra_id_"), k.cast("string"), lit("> "),
                array_join(slice(col("__toks"), (sp.getField("s") + 1L).cast("int"),
                  sp.getField("l").cast("int")), " "))), " "),
            lit(" <extra_id_"), col("__m").cast("string"), lit(">")))
          .otherwise(lit("")))
      .select(col(idCol), col("n_tokens"), col("n_spans"),
        col("inputs"), col("targets"))
  }

  /** Per-chunk document-boundary segments — the attention-mask input a
    * trainer needs for packed sequences (block-diagonal attention: tokens
    * must not attend across document boundaries inside one chunk). For
    * every chunk a document touches, one row
    * `(shard, chunk_idx, id, start, len)`: the segment the doc occupies in
    * that chunk (`start` = its in-chunk offset, 0 on continuation chunks).
    *
    * Pure map + explode over [[pack]]'s output — a doc spanning k chunks
    * emits k rows, so the frame is stream-sized, never token-sized, and
    * no shuffle is added beyond pack's own window.
    */
  def chunkBoundaries(packed: DataFrame, idCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val pre = col("chunk") * budget + col("offset")
    // DIV, not `/`: Spark's `/` on longs is double division (exact only
    // by accident); DIV is the integral quotient, the same operator pack
    // itself uses for chunk assignment.
    val lastChunk = expr(
      s"(chunk * ${budget}L + offset + n_tokens - 1L) DIV ${budget}L")
    val lastEnd = ((pre + col("n_tokens") - 1) % budget) + 1
    packed.filter(col("n_tokens") > 0)
      .withColumn("__last", lastChunk)
      .withColumn("__le", lastEnd)
      .select(col("shard"), col(idCol), col("chunk"), col("offset"),
        col("__last"), col("__le"),
        explode(sequence(col("chunk"), col("__last"))).as("chunk_idx"))
      .select(col("shard"), col("chunk_idx"), col(idCol),
        when(col("chunk_idx") === col("chunk"), col("offset"))
          .otherwise(lit(0L)).as("start"),
        (when(col("chunk_idx") === col("__last"), col("__le"))
          .otherwise(lit(budget)) -
         when(col("chunk_idx") === col("chunk"), col("offset"))
          .otherwise(lit(0L))).as("len"))
  }

  /** Per-(shard, chunk) occupancy — the packing-efficiency view: how many
    * documents START in each chunk and how many tokens the chunk holds from
    * them (≥ budget means the tail spills into the next chunk). One
    * aggregation over [[pack]]'s output.
    */
  def chunkStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("shard"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Length-bucketed batching — the PAD-regime packer ([[pack]] is the
    * concat-and-chunk regime): documents are never split, each is padded
    * to a power-of-two fraction of `budget` and grouped with same-bucket
    * documents, `2^k` to a sequence. SFT and inference serving batch this
    * way (a whole conversation must stay in one sequence with its loss
    * mask); naive single-bucket batching pads everything to `budget`,
    * this bounds waste to <50% of each slot by construction and in
    * practice far less.
    *
    * Bucket math is exact integers, replayable in SQL:
    * `k = floor(log2(budget DIV len))` computed as a SUM OF INDICATORS
    * (#{i ≥ 1 : 2^i ≤ q}) — a log-based floor is an ln-ratio in both
    * engines and can land at 2.9999… exactly where the boundary matters;
    * the indicator sum is pure integer comparison. Slot width
    * `budget / 2^k`, capacity `2^k` docs per sequence. Sequence
    * assignment is `row_number DIV capacity` within (bucket, shard) —
    * the shard (the [[pack]] Knuth mix) is the parallelism/skew knob: a
    * dominant bucket spreads over `shards` windows instead of one task.
    *
    * Output per doc: `(id, n_tokens, bucket, padded_len, shard, seq_idx,
    * slot, oversize)`; documents longer than `budget` (or empty) carry
    * `oversize = true` and null placement — the caller's truncate/split
    * policy, surfaced, never silently dropped.
    */
  def lengthBuckets(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    // ANSI-safe shared mix (finding 59a/63): the earlier inline
    // `id * 2654435761` Long product overflows for ids ≥ 2^32 — hit at
    // sf10's 10^10 id offsets. mix32's 16/16 split is identity-exact with
    // the direct product, so the oracle keeps its plain `id * C % 2^32`.
    val mix = graft.ops.Sampling.mix32(col(idCol))
    val maxK = 63 - java.lang.Long.numberOfLeadingZeros(budget)
    val q = expr(s"${budget}L DIV n_tokens")
    val kOfQ = (1 to maxK).map(i => when(q >= (1L << i), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val base = df.select(col(idCol), tokenCount.cast("long").as("n_tokens"))
      .withColumn("__mix", mix)
      .withColumn("bucket",
        when(col("n_tokens") >= 1L && col("n_tokens") <= budget, kOfQ))
      .withColumn("__cap", pow(lit(2.0), col("bucket")).cast("long"))
      .withColumn("padded_len", expr(s"${budget}L DIV __cap"))
      .withColumn("shard",
        when(col("bucket").isNotNull, (col("__mix") % shards).cast("int")))
    val w = Window.partitionBy(col("bucket"), col("shard")).orderBy(col(idCol))
    base
      .withColumn("__rn",
        when(col("bucket").isNotNull, row_number().over(w).cast("long") - 1L))
      .select(col(idCol), col("n_tokens"), col("bucket"), col("padded_len"),
        col("shard"),
        expr("__rn DIV __cap").as("seq_idx"),
        (col("__rn") % col("__cap")).as("slot"),
        col("bucket").isNull.as("oversize"))
  }

  /** Per-bucket efficiency view over [[lengthBuckets]]: sequences built,
    * tokens carried, and occupancy in exact integer micro-units
    * (Σ tokens · 1e6 DIV (n_seqs · budget) — the padding-waste readout).
    */
  def lengthBucketStats(bucketed: DataFrame, budget: Long): DataFrame =
    bucketed.filter(!col("oversize"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("shard"), col("seq_idx")).as("n_seqs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("occupancy_micro",
        expr(s"(sum_tokens * 1000000L) DIV (n_seqs * ${budget}L)"))
}
