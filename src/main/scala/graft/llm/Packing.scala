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
      shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val mix = pmod(col(idCol).cast("long") * 2654435761L, lit(4294967296L))
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
}
