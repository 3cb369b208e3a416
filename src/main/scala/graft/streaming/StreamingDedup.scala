package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Streaming deduplication for a document-ingestion pipeline (SURVEY §2.10
  * additions): exact dedup with watermark-bounded state, and near-duplicate
  * detection of an incoming stream against a STORED corpus signature table.
  *
  * State discipline at scale: every stateful step here is either
  * watermark-evicted (`dropDuplicatesWithinWatermark`) or stateless
  * (stream-static join) — no operator accumulates unbounded per-key state
  * unless the caller explicitly opts into [[exactDedupGlobal]].
  */
object StreamingDedup {

  /** Streaming exact dedup, bounded state: the first arrival of each
    * content hash within the watermark horizon is kept, later copies are
    * dropped, and hash state older than the watermark is evicted. The
    * streaming analog of [[graft.llm.Dedup.exactDedup]] for the (typical)
    * case where duplicates arrive close together in event time.
    */
  def exactDedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      textCol: String = "text"): DataFrame =
    df.withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Unbounded-state exact dedup over the whole stream history — exact
    * batch semantics, state grows with distinct-hash cardinality. Use only
    * when that cardinality is bounded (e.g. a finite re-ingestion).
    */
  def exactDedupGlobal(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("content_hash", sha2(col(textCol), 256))
      .dropDuplicates("content_hash")

  /** Near-duplicate detection of an incoming stream against a stored
    * corpus: the stream side computes its MinHash signature per row
    * (stateless, ref [[Dedup.minhashSignature]]), explodes LSH band keys,
    * and stream-static equi-joins the persisted [[Dedup.minhashSignatures]]
    * table on (band, key) — the standard "is this new document a near-dup
    * of anything we already have?" ingestion gate.
    *
    * State discipline: the default pipeline is fully STATELESS (a pair
    * colliding in several bands emits one row per colliding band —
    * consumers treat the output as a set). Pass `tsCol` to collapse
    * duplicates with `dropDuplicatesWithinWatermark` instead:
    * watermark-evicted state, never unbounded. (A plain `dropDuplicates`
    * here would retain every (stream_id, corpus_id) pair forever —
    * stream_id cardinality grows without bound.)
    *
    * At 100 TB the static side is the bucketed/partitioned signature table
    * — the join is a broadcast or shuffled equi-join on the band key, never
    * a scan of document bodies.
    */
  /** Ingestion-time benchmark-contamination gate: flag stream documents
    * sharing any word n-gram with a STATIC benchmark gram set
    * ([[graft.llm.Decontamination.benchmarkGrams]], computed once). Same
    * EXACT two-stage match as the batch operator (round 8): a long-keyed
    * fingerprint broadcast semi-join prefilters, then a string confirm on
    * the survivors — a fingerprint collision can no longer flag a clean
    * stream document. Stateless stream-static joins at gram granularity —
    * a document sharing several grams emits one row per shared gram
    * (consumers treat the output as a set, same discipline as
    * [[nearDupAgainstCorpus]]), or pass `tsCol` for watermark-bounded
    * `dropDuplicatesWithinWatermark` collapsing. The CLEAN side of the
    * gate is the caller's per-microbatch anti-join (foreachBatch with
    * [[graft.llm.Decontamination.decontaminate]]) — a per-doc "no gram
    * matched" aggregation would need unbounded state in-stream.
    */
  def contaminatedAgainstBenchmark(
      stream: DataFrame,
      benchGrams: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      tsCol: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val withMark = tsCol.fold(stream)(c => stream.withWatermark(c, watermark))
    val grams = withMark
      .select(col(idCol).as("stream_id") +: tsCol.toSeq.map(col) :+
        explode(graft.llm.TextAnalysis.wordNgrams(col(textCol), n)).as("__g"): _*)
      .withColumn("__fp", graft.llm.TextAnalysis.fingerprint(col("__g")))
    val matched = grams
      .join(broadcast(benchGrams.select(col("__fp")).distinct()), Seq("__fp"), "left_semi")
      .join(broadcast(benchGrams), Seq("__fp", "__g"), "left_semi")
      .select(col("stream_id") +: tsCol.toSeq.map(col): _*)
    tsCol.fold(matched)(_ => matched.dropDuplicatesWithinWatermark("stream_id"))
  }

  /** Ingestion-time boilerplate-span gate: strip spans covered by a KNOWN
    * duplicated-gram catalog (a batch
    * [[graft.llm.SubstringDedup.duplicatedGrams]] artifact over a
    * reference corpus) from stream documents — one codegen'd kernel pass
    * per row, STATELESS (no shuffle, no state store), so it composes with
    * any output mode / watermark discipline unchanged, exactly like a
    * filter. The catalog ships inside the expression (bounded: it is the
    * trained artifact, same discipline as a benchmark gram set or a BPE
    * merge list); matching is exact string equality, so nothing clean is
    * ever stripped.
    */
  def stripKnownBoilerplate(
      stream: DataFrame,
      dupGrams: Seq[String],
      k: Int,
      textCol: String = "text"): DataFrame =
    stream.withColumn(textCol,
      graft.llm.SubstringDedup.removeKnownSpans(col(textCol), dupGrams, k))

  def nearDupAgainstCorpus(
      stream: DataFrame,
      corpusSigs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: Option[String] = None,
      watermark: String = "10 minutes",
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    // bands > numHashes would make rowsPerBand 0: every band key collapses
    // to the hash of an empty slice and the equi-join degenerates into a
    // stream×corpus cross join. Non-divisible combos silently drop the
    // tail hashes, weakening recall — reject both at entry.
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val rowsPerBand = numHashes / bands
    val withMark = tsCol.fold(stream)(c => stream.withWatermark(c, watermark))
    val streamBanded = withMark
      .select(col(idCol).as("stream_id") +: tsCol.toSeq.map(col) :+
        Dedup.minhashSignature(col(textCol), numHashes, shingleSize).as("ssig"): _*)
      .withColumn("bk", explode(Dedup.lshBandKeys(col("ssig"), bands, rowsPerBand)))
      .withColumn("band", col("bk.band")).withColumn("key", col("bk.key"))
      .drop("bk")
    val corpusBanded = corpusSigs
      .select(col("id").as("corpus_id"), col("sig"),
        explode(Dedup.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("corpus_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val matched = streamBanded.join(corpusBanded, Seq("band", "key"))
      .select(col("stream_id") +: tsCol.toSeq.map(col) :+ col("corpus_id") :+
        ((graft.functions.SigKernels.eqSlotCount(col("ssig"), col("sig"))
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard")): _*)
    tsCol.fold(matched)(_ => matched.dropDuplicatesWithinWatermark("stream_id", "corpus_id"))
  }
}
