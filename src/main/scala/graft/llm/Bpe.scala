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

  /** Incremental-pair-count trainer: identical merges to [[train]], O(1)
    * Spark jobs TOTAL instead of one aggregation per merge round.
    *
    * [[train]]'s loop re-segments the whole vocabulary frame every round —
    * fine for a 64-merge reference tokenizer, but a production 32k-merge
    * vocabulary means 32k sequential Spark jobs and O(rounds²)
    * re-segmentation. This trainer runs the classic incremental algorithm
    * (the HF-tokenizers / SentencePiece shape) over the corpus's
    * SUFFICIENT STATISTIC instead:
    *
    *  1. ONE distributed pass reduces the corpus to its distinct-word
    *     counts (map-side partials; the frame is vocabulary-sized, not
    *     corpus-sized) and collects it — the [[Similarity.trainIvfCentroids]]
    *     discipline: the global artifact trains driver-side, the corpus is
    *     only ever scanned, never iterated.
    *  2. The merge loop maintains weighted adjacent-pair counts, a
    *     pair → containing-words inverted index, and a lazy-deletion
    *     max-heap keyed (count desc, pair asc — code-point order, matching
    *     the distributed argmax's UTF8 binary sort). Each round touches
    *     ONLY the words containing the chosen pair and applies the single
    *     new rule to their current segmentation (exact: a trained rule's
    *     components always derive from earlier rules, so priority-order
    *     re-segmentation and chronological application agree — pinned by
    *     BpeSpec's equivalence certs).
    *
    * Total driver work is O(corpus-vocab + Σ affected-word lengths · log),
    * independent of how the merges batch into Spark jobs — 32k merges cost
    * the same ONE collect as 8.
    *
    * The vocabulary must fit on the driver: `maxWords` fails LOUDLY when
    * exceeded (silent truncation would change the counts and the merges).
    * For corpora past the cap, pre-filter hapax/rare words with
    * `minWordCount` — the standard trainer knob; words below the threshold
    * then never influence pair counts, a documented deviation from
    * [[train]]'s exact counts (with the default 1, results are identical).
    */
  def trainIncremental(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 64,
      minCount: Long = 2L,
      minWordCount: Long = 1L,
      maxWords: Int = 1 << 22): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val rows = wordCounts(df, textCol)
      .filter(col("n") >= minWordCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"distinct-word vocabulary exceeds maxWords=$maxWords; raise it or set minWordCount")
    trainInMemory(
      rows.map(r => (r.getString(0), r.getLong(1))), numMerges, minCount)
  }

  /** Code-point-order string compare — the driver-side equivalent of
    * Spark's UTF8String binary sort on the pair key.
    */
  private def cpCompare(x: String, y: String): Int = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) return java.lang.Integer.compare(cx, cy)
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    java.lang.Integer.compare(x.length - i, y.length - j)
  }

  private def adjacentPairs(syms: Array[String]): scala.collection.mutable.HashMap[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < syms.length - 1) {
      val k = syms(i) + " " + syms(i + 1)
      m.update(k, m.getOrElse(k, 0) + 1)
      i += 1
    }
    m
  }

  /** One left-to-right non-overlapping sweep of the pair (a, b) — exactly
    * [[graft.functions.BpeImpl.segment]]'s inner replacement pass with a
    * single active rank.
    */
  private def applyMergeSweep(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  private def trainInMemory(
      vocab: Array[(String, Long)],
      numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = vocab.map { case (w, _) =>
      val cps = w.codePoints().toArray
      cps.map(cp => new String(Character.toChars(cp)))
    }
    val counts: Array[Long] = vocab.map(_._2)
    val pairCount = mutable.HashMap.empty[String, Long]
    val occs = mutable.HashMap.empty[String, mutable.HashSet[Int]]
    // Lazy-deletion max-heap: entries are (count-at-push, key); a popped
    // entry is live iff its count still matches. Every count update pushes
    // a fresh entry, so the live maximum is always present.
    val heap = new java.util.PriorityQueue[(Long, String)](
      11,
      (p: (Long, String), q: (Long, String)) => {
        val c = java.lang.Long.compare(q._1, p._1) // count DESC
        if (c != 0) c else cpCompare(p._2, q._2)   // then pair ASC
      })
    var i = 0
    while (i < words.length) {
      adjacentPairs(words(i)).foreach { case (k, m) =>
        pairCount.update(k, pairCount.getOrElse(k, 0L) + m.toLong * counts(i))
        occs.getOrElseUpdate(k, mutable.HashSet.empty) += i
      }
      i += 1
    }
    pairCount.foreach { case (k, c) => heap.add((c, k)) }

    var merges = Vector.empty[(String, String)]
    var stopped = false
    while (merges.size < numMerges && !stopped) {
      var best: String = null
      while (best == null && !heap.isEmpty) {
        val (c, k) = heap.poll()
        val cur = pairCount.getOrElse(k, 0L)
        if (cur == c && cur >= minCount) best = k
        // else: stale (count moved since push) or below threshold — drop
      }
      if (best == null) stopped = true
      else {
        val sep = best.indexOf(' ')
        val a = best.substring(0, sep); val b = best.substring(sep + 1)
        merges = merges :+ (a -> b)
        val affected = occs.getOrElse(best, mutable.HashSet.empty).toArray
        affected.foreach { idx =>
          val before = words(idx)
          val after = applyMergeSweep(before, a, b)
          if (after.length != before.length) {
            words(idx) = after
            val oldP = adjacentPairs(before); val newP = adjacentPairs(after)
            (oldP.keySet ++ newP.keySet).foreach { k =>
              val d = (newP.getOrElse(k, 0) - oldP.getOrElse(k, 0)).toLong * counts(idx)
              if (d != 0L) {
                val nc = pairCount.getOrElse(k, 0L) + d
                if (nc == 0L) pairCount.remove(k) else pairCount.update(k, nc)
                heap.add((nc, k))
              }
              if (newP.contains(k))
                occs.getOrElseUpdate(k, mutable.HashSet.empty) += idx
              else if (oldP.contains(k))
                occs.get(k).foreach(_ -= idx)
            }
          }
        }
        occs.remove(best)
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
