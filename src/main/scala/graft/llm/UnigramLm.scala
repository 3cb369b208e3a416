package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramImpl, UnigramKernels}

/** Unigram-LM tokenizer (Kudo 2018 — the SentencePiece unigram model):
  * the probabilistic alternative to [[Bpe]]. A piece vocabulary with
  * log-probabilities is trained by EM over segmentation lattices, pruned
  * to a target size, and applied by Viterbi — unlike BPE's greedy merges,
  * the segmentation is the global argmax under an explicit model, which
  * is what modern LM tokenizers (T5, LLaMA's SentencePiece configs) ship.
  *
  * Training shape at scale (the [[Bpe.trainIncremental]] discipline): the
  * corpus reduces ONCE to its distinct-word counts — one shuffle,
  * map-side partials, vocabulary-sized — and the EM rounds run on that
  * SUFFICIENT STATISTIC driver-side, in deterministic iteration order
  * (distributed double-summation would make tie-breaks run-dependent; the
  * loud `maxWords` cap and `minWordCount` knob are the same contract as
  * the BPE trainer). The corpus itself is only ever scanned, never
  * iterated.
  *
  * For corpora whose WORD VOCABULARY exceeds the driver, the E-step is
  * also available distributed — [[expectedCountsDistributed]] runs one
  * kernel aggregation per EM iteration over the word-count frame
  * (broadcast piece table, map-side partial sums; certified against the
  * driver E-step by UnigramLmSpec and `q_text_unigram_estep`).
  *
  * Applying the tokenizer is a pure map: [[tokenCount]] / [[tokens]] bake
  * the piece table into a codegen'd Viterbi kernel
  * ([[graft.functions.UnigramKernels]]) — no shuffle, no UDF boundary.
  */
object UnigramLm {

  /** Seed piece candidates of one word: every code-point substring up to
    * `maxPieceLen`, with occurrence multiplicity.
    */
  private def substrings(word: String, maxPieceLen: Int): Iterator[String] = {
    val a = word.codePoints().toArray
    val cps = a.map(cp => new String(Character.toChars(cp)))
    for {
      i <- Iterator.range(0, cps.length)
      l <- Iterator.range(1, math.min(maxPieceLen, cps.length - i) + 1)
    } yield cps.slice(i, i + l).mkString
  }

  /** Train a unigram-LM piece table: seed with the `seedSize` most
    * frequent substrings (plus EVERY single code point — full coverage by
    * construction), run `emIters` EM sweeps, prune the weakest
    * `pruneFraction` of multi-code-point pieces by expected count, repeat
    * until `vocabSize`, finish with one EM sweep. Deterministic: all ties
    * break on (count DESC, piece ASC), all summation orders fixed.
    *
    * Returns (piece, logProb) sorted piece-ascending — the artifact
    * ([[savePieces]] / [[loadPieces]]); log-probs normalize to 1 over the
    * vocabulary.
    */
  def train(
      df: DataFrame,
      textCol: String = "text",
      vocabSize: Int = 256,
      maxPieceLen: Int = 4,
      seedSize: Int = 2048,
      emIters: Int = 2,
      pruneFraction: Double = 0.25,
      minWordCount: Long = 1L,
      maxWords: Int = 1 << 22): Seq[(String, Double)] = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    require(pruneFraction > 0.0 && pruneFraction < 1.0,
      s"pruneFraction must be in (0, 1): $pruneFraction")
    // emIters = 0 would leave lastExp empty and silently degrade pruning
    // to alphabetical order while returning seed-frequency probs — a
    // structurally valid but meaningless artifact. Fail loudly instead.
    require(emIters >= 1, s"emIters must be >= 1: $emIters")
    val rows = Bpe.wordCounts(df, textCol)
      .filter(col("n") >= minWordCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"distinct-word vocabulary exceeds maxWords=$maxWords; raise it or set minWordCount")
    trainInMemory(
      rows.map(r => (r.getString(0), r.getLong(1))),
      vocabSize, maxPieceLen, seedSize, emIters, pruneFraction)
  }

  private def trainInMemory(
      vocab: Array[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int,
      seedSize: Int,
      emIters: Int,
      pruneFraction: Double): Seq[(String, Double)] = {
    import scala.collection.mutable
    // --- seed: substring counts; singles always in ----------------------
    val seedCount = mutable.HashMap.empty[String, Long]
    vocab.foreach { case (w, n) =>
      substrings(w, maxPieceLen).foreach { p =>
        seedCount.update(p, seedCount.getOrElse(p, 0L) + n)
      }
    }
    val singles = seedCount.keysIterator
      .filter(p => p.codePointCount(0, p.length) == 1).toVector.sorted
    val multis = seedCount.iterator
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .toVector
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - singles.size))
      .map(_._1)
    var pieces: Vector[String] = (singles ++ multis).sorted
    // initial probs ∝ seed counts over the seeded set
    var logProb: Map[String, Double] = {
      val total = pieces.iterator.map(seedCount(_).toDouble).sum
      pieces.iterator.map(p => p -> math.log(seedCount(p) / total)).toMap
    }

    def emSweep(): Map[String, Double] = {
      val table = UnigramImpl.tableOf(pieces.map(p => (p, logProb(p))))
      val acc = mutable.HashMap.empty[String, Double]
      // vocab is sorted (count desc, word asc) by construction — a fixed
      // summation order, so repeated runs are bit-identical.
      vocab.foreach { case (w, n) =>
        UnigramImpl.expectedCounts(w, table).foreach { case (p, g) =>
          acc.update(p, acc.getOrElse(p, 0.0) + g * n)
        }
      }
      acc.toMap
    }

    def mStep(exp: Map[String, Double]): Unit = {
      val total = pieces.iterator.map(p => exp.getOrElse(p, 0.0)).sum
      logProb = pieces.iterator.map { p =>
        val c = exp.getOrElse(p, 0.0)
        // an unused piece gets an effective floor rather than -Inf so it
        // can still segment (and be pruned next round)
        p -> (if (c > 0.0) math.log(c / total) else -1e9)
      }.toMap
    }

    var lastExp: Map[String, Double] = Map.empty
    def runEm(iters: Int): Unit = {
      var it = 0
      while (it < iters) { lastExp = emSweep(); mStep(lastExp); it += 1 }
    }

    runEm(emIters)
    // prune toward vocabSize; singles are never pruned, so the floor is
    // max(vocabSize, |singles|) — coverage wins over the size target
    while (pieces.size > math.max(vocabSize, singles.size)) {
      val multisNow = pieces.filter(p => p.codePointCount(0, p.length) > 1)
      val targetMultis = math.max(0, vocabSize - singles.size)
      val keepMultis = math.max(targetMultis,
        multisNow.size - math.max(1, (multisNow.size * pruneFraction).toInt))
      val kept = multisNow
        .sortBy(p => (-lastExp.getOrElse(p, 0.0), p))
        .take(keepMultis)
      pieces = (singles ++ kept).sorted.toVector
      runEm(emIters)
    }
    pieces.map(p => (p, logProb(p)))
  }

  /** Distributed E-step: expected piece counts over the WHOLE corpus as
    * one kernel aggregation — the scale path when the word vocabulary
    * exceeds the driver. Input is the (w, n) word-count frame
    * ([[Bpe.wordCounts]]); output (piece, expected) rows. The piece table
    * rides into the executors inside the codegen'd expression; only
    * piece-level partial sums shuffle.
    */
  def expectedCountsDistributed(
      words: DataFrame,
      pieces: Seq[(String, Double)]): DataFrame =
    words
      .select(explode(UnigramKernels.unigramEStep(col("w"), pieces)).as("pg"),
        col("n"))
      .groupBy(col("pg.piece").as("piece"))
      .agg(sum(col("pg.g") * col("n")).as("expected"))

  /** Persist a trained piece table as a tiny (piece, log_prob) parquet —
    * train once, ship to every tokenize job.
    */
  def savePieces(spark: SparkSession, pieces: Seq[(String, Double)],
      path: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "log_prob")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a piece table saved by [[savePieces]], piece-ascending. */
  def loadPieces(spark: SparkSession, path: String): Seq[(String, Double)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .orderBy(col("piece"))
      .select(col("piece"), col("log_prob"))
      .as[(String, Double)].collect().toSeq
  }

  /** Unigram token count of `text` — codegen'd Viterbi, pure map. */
  def tokenCount(text: Column, pieces: Seq[(String, Double)]): Column =
    UnigramKernels.unigramTokenCount(text, pieces)

  /** Full unigram token sequence of `text`. */
  def tokens(text: Column, pieces: Seq[(String, Double)]): Column =
    UnigramKernels.unigramTokens(text, pieces)

  /** Token IDS of `text` under the dense piece-ascending vocabulary — the
    * integer stream a token-shard sink stores; OOV singles encode -1.
    */
  def tokenIds(text: Column, pieces: Seq[(String, Double)]): Column =
    UnigramKernels.unigramTokenIds(text, pieces)

  /** The dense id ↔ piece vocabulary of a trained table, id-ascending —
    * ship it next to the shards so a trainer can decode.
    */
  def vocabulary(pieces: Seq[(String, Double)]): Seq[(Int, String)] =
    pieces.map(_._1).sorted.zipWithIndex.map { case (p, i) => (i, p) }

  /** SAMPLED token sequence of `text` from p(seg)^alpha — Kudo 2018
    * subword regularization, the augmentation that trains models robust
    * to segmentation ambiguity. Deterministic per (word, seed) by
    * counter-mode hashing (not per-partition RNG state), so an epoch's
    * augmentation is reproducible and engine-independent; vary `seed`
    * per epoch for fresh samples.
    */
  def sampleTokens(text: Column, pieces: Seq[(String, Double)],
      alpha: Double, seed: Long): Column =
    UnigramKernels.unigramSampleTokens(text, pieces, alpha, seed)
}
