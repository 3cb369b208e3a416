package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeKernels

/** Byte-pair-encoding tokenizer: distributed training, kernel-applied.
  *
  * Token counts drive packing budgets ([[Packing]]) and mixture sampling
  * ([[graft.ops.Sampling.sampleByBudget]]); a trained BPE measures what a
  * production pipeline actually packs, where the regex proxy
  * ([[TextAnalysis.subwordCount]]) only approximates.
  *
  * Training shape at scale (the `trainIvfCentroidsDistributed` loop
  * discipline — [[Similarity]]): the corpus reduces ONCE to a (word, count)
  * vocabulary frame (one shuffle, map-side partials; its size is the
  * distinct-word vocabulary, not the corpus), checkpointed; each merge
  * round is then ONE aggregation over that frame — re-segment every word
  * under the current merges (compiled kernel), explode adjacent symbol
  * pairs, weighted count, take the argmax. The driver holds only the merge
  * list (O(rounds) state); nothing corpus-sized ever collects.
  *
  * Ties break deterministically (max count, then lexicographically
  * smallest pair), so a training run is a pure function of the corpus.
  *
  * Applying the tokenizer is a pure map: [[tokenCount]] / [[tokens]] bake
  * the merge list into a codegen'd expression ([[BpeKernels]]) — the whole
  * corpus tokenizes with no shuffle, no UDF boundary, no driver round-trips.
  */
object Bpe {

  /** The corpus vocabulary: (w, n) word counts — train's input, reusable
    * across training runs (persist at scale).
    */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(TextAnalysis.tokensWs(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Train `numMerges` merge rules. Stops early when no adjacent pair
    * occurs at least `minCount` times. One Spark aggregation per round
    * over the vocabulary frame.
    */
  def train(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 64,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val words = wordCounts(df, textCol).localCheckpoint()
    var merges = Vector.empty[(String, String)]
    var stopped = false
    while (merges.size < numMerges && !stopped) {
      val top = words
        .select(explode(BpeKernels.bpeWordPairs(col("w"), merges)).as("p"), col("n"))
        .groupBy(col("p")).agg(sum(col("n")).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("p"))
        .limit(1)
        .collect()
      if (top.isEmpty) stopped = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges = merges :+ (a -> b)
      }
    }
    merges
  }

  /** Persist a trained merge list as a tiny (rank, pair_a, pair_b)
    * parquet — the artifact a production pipeline trains once and ships
    * to every tokenize job.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "pair_a", "pair_b")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge list saved by [[saveMerges]], in rank order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .orderBy(col("rank"))
      .select(col("pair_a"), col("pair_b"))
      .as[(String, String)].collect().toSeq
  }

  /** BPE token count of `text` under `merges` — a codegen'd pure map. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    BpeKernels.bpeTokenCount(text, merges)

  /** Full BPE token sequence of `text` under `merges`. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    BpeKernels.bpeTokens(text, merges)
}
