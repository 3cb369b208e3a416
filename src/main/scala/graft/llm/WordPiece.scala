package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.WordPieceKernels

/** WordPiece tokenizer: likelihood-scored merge training, kernel-applied
  * (Schuster & Nakajima 2012 — the BERT tokenizer, Devlin et al. 2019).
  *
  * Differs from [[Bpe]] in exactly one place — the merge objective. BPE
  * picks the most FREQUENT adjacent pair; WordPiece picks the pair
  * maximizing the unigram-LM likelihood gain, score(a,b) =
  * count(ab) / (count(a) · count(b)) — frequent-with-rare-parts beats
  * frequent-with-common-parts. Scores are compared EXACTLY (BigInt
  * cross-multiplication: c₁·a₂·b₂ vs c₂·a₁·b₁ — counts can reach corpus
  * scale, so the triple product overflows Long), ties to the
  * lexicographically smallest pair key, so training is a pure function
  * of the corpus — the [[Bpe]] determinism discipline with rationals.
  *
  * Symbol alphabet: a word's first code point is a plain symbol, the
  * rest carry the `##` continuation prefix ("table" → t ##a ##b ##l ##e).
  * Merging (a, ##b) yields a##b-without-the-prefix-join: ("t","##a") →
  * "ta"; ("##a","##b") → "##ab". The trained VOCABULARY is the initial
  * alphabet plus one new symbol per merge — exactly what
  * [[WordPieceKernels]]' greedy longest-match applier consumes.
  *
  * Training shape at scale (the [[Bpe.trainIncremental]] discipline):
  * ONE distributed pass reduces the corpus to its distinct-word counts
  * (map-side partials, vocabulary-sized); the merge loop runs driver-side
  * over that sufficient statistic with incremental pair/symbol count
  * updates (only words containing the merged pair are touched). The
  * argmax is a full scan of the live pair table per round — O(pairs)
  * with exact compares; unlike BPE's count-keyed lazy heap, a WordPiece
  * heap would need invalidation on every SYMBOL count change (a merge
  * changes c(a)/c(b), which moves the score of every pair touching
  * either symbol), so the scan is the honest structure. `maxWords` fails
  * LOUDLY when the vocabulary exceeds the driver budget; `minWordCount`
  * is the documented pre-filter knob for corpora past the cap.
  */
object WordPiece {

  /** Split a word into WordPiece symbols: plain first code point, `##`
    * continuations after.
    */
  private def symbolsOf(w: String): Array[String] = {
    val cps = w.codePoints().toArray
    val out = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) {
      val s = new String(Character.toChars(cps(i)))
      out(i) = if (i == 0) s else "##" + s
      i += 1
    }
    out
  }

  /** Merge two adjacent symbols: the right side drops its `##` prefix,
    * the left side keeps its word-position marking.
    */
  private def mergeSyms(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  private def adjacentPairs(syms: Array[String]): scala.collection.mutable.HashMap[(String, String), Int] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Int]
    var i = 0
    while (i < syms.length - 1) {
      val k = (syms(i), syms(i + 1))
      m.update(k, m.getOrElse(k, 0) + 1)
      i += 1
    }
    m
  }

  private def symbolBag(syms: Array[String]): scala.collection.mutable.HashMap[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < syms.length) {
      m.update(syms(i), m.getOrElse(syms(i), 0) + 1)
      i += 1
    }
    m
  }

  /** One left-to-right non-overlapping sweep replacing (a, b). */
  private def applyMergeSweep(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += mergeSyms(a, b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Code-point-order compare on the "a b" pair key — Spark UTF8 binary
    * sort order, the [[Bpe]] tie-break.
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

  /** Train `numMerges` WordPiece merges. Returns the merge list in
    * training order; [[vocabOf]] turns it into the applier's vocabulary.
    * Stops early when no pair reaches `minCount`.
    */
  def train(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 64,
      minCount: Long = 2L,
      minWordCount: Long = 1L,
      maxWords: Int = 1 << 22): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val rows = Bpe.wordCounts(df, textCol)
      .filter(col("n") >= minWordCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"distinct-word vocabulary exceeds maxWords=$maxWords; raise it or set minWordCount")
    trainInMemory(rows.map(r => (r.getString(0), r.getLong(1))), numMerges, minCount)
  }

  private[llm] def trainInMemory(
      vocab: Array[(String, Long)],
      numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = vocab.map { case (w, _) => symbolsOf(w) }
    val counts: Array[Long] = vocab.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val symCount = mutable.HashMap.empty[String, Long]
    val occs = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    var i = 0
    while (i < words.length) {
      adjacentPairs(words(i)).foreach { case (k, m) =>
        pairCount.update(k, pairCount.getOrElse(k, 0L) + m.toLong * counts(i))
        occs.getOrElseUpdate(k, mutable.HashSet.empty) += i
      }
      symbolBag(words(i)).foreach { case (s, m) =>
        symCount.update(s, symCount.getOrElse(s, 0L) + m.toLong * counts(i))
      }
      i += 1
    }

    // Exact rational compare: score(x) > score(y) ⇔ cx·ay·by > cy·ax·bx.
    def beats(x: ((String, String), Long), y: ((String, String), Long)): Boolean = {
      val sx = BigInt(x._2) * BigInt(symCount(y._1._1)) * BigInt(symCount(y._1._2))
      val sy = BigInt(y._2) * BigInt(symCount(x._1._1)) * BigInt(symCount(x._1._2))
      // NOTE: the cross terms swap — score(x) = cx/(ax·bx), so
      // cx/(ax·bx) > cy/(ay·by) ⇔ cx·ay·by > cy·ax·bx.
      val c = sx.compare(sy)
      if (c != 0) c > 0
      else cpCompare(x._1._1 + " " + x._1._2, y._1._1 + " " + y._1._2) < 0
    }

    var merges = Vector.empty[(String, String)]
    var stopped = false
    while (merges.size < numMerges && !stopped) {
      var best: ((String, String), Long) = null
      pairCount.foreach { e =>
        if (e._2 >= minCount && (best == null || beats(e, best))) best = e
      }
      if (best == null) stopped = true
      else {
        val (a, b) = best._1
        merges = merges :+ (a -> b)
        val affected = occs.getOrElse(best._1, mutable.HashSet.empty).toArray
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
              }
              if (newP.contains(k))
                occs.getOrElseUpdate(k, mutable.HashSet.empty) += idx
              else if (oldP.contains(k))
                occs.get(k).foreach(_ -= idx)
            }
            val oldS = symbolBag(before); val newS = symbolBag(after)
            (oldS.keySet ++ newS.keySet).foreach { s =>
              val d = (newS.getOrElse(s, 0) - oldS.getOrElse(s, 0)).toLong * counts(idx)
              if (d != 0L) {
                val nc = symCount.getOrElse(s, 0L) + d
                if (nc == 0L) symCount.remove(s) else symCount.update(s, nc)
              }
            }
          }
        }
        occs.remove(best._1)
      }
    }
    merges
  }

  /** The applier vocabulary from a merge list: every single-code-point
    * symbol of the corpus alphabet (plain + `##` forms) plus one merged
    * symbol per rule. `alphabet` is the corpus's single-code-point piece
    * set — pass the distinct code points of the training corpus (or a
    * fixed charset) so coverage is explicit, not inferred.
    */
  def vocabOf(merges: Seq[(String, String)], alphabet: Seq[String]): Seq[String] = {
    val singles = alphabet.flatMap(c => Seq(c, "##" + c))
    val merged = merges.map { case (a, b) => mergeSyms(a, b) }
    (singles ++ merged).distinct
  }

  /** Persist a trained vocabulary as a tiny (id, piece) parquet — the
    * artifact a production pipeline trains once and ships to every
    * tokenize job.
    */
  def saveVocab(spark: SparkSession, pieces: Seq[String], path: String): Unit = {
    import spark.implicits._
    pieces.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("id", "piece")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a vocabulary saved by [[saveVocab]], in id order. */
  def loadVocab(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(path).orderBy(col("id"))
      .select(col("piece")).as[String].collect().toSeq
  }

  /** Detokenize a WordPiece token sequence: `##` pieces glue to the
    * previous token, plain pieces start a new space-separated word —
    * the inverse of [[tokens]] up to whitespace normalization
    * (`decode(tokens(t)) == single-space word join of t` whenever no
    * word fell to UNK; WordPieceSpec pins the round trip). Column-HOF
    * form (interpreted) — decode is a cert/debug surface, not a corpus
    * hot path; token sinks store ids.
    */
  def decode(tokens: Column): Column =
    aggregate(tokens, lit(""), (acc, t) =>
      when(t.startsWith("##"), concat(acc, t.substr(lit(3), length(t))))
        .when(acc === "", t)
        .otherwise(concat(acc, lit(" "), t)))

  /** WordPiece token count of `text` — a codegen'd pure map. */
  def tokenCount(text: Column, pieces: Seq[String], unk: String = "[UNK]"): Column =
    WordPieceKernels.wordpieceTokenCount(text, pieces, unk)

  /** Full WordPiece token sequence of `text`. */
  def tokens(text: Column, pieces: Seq[String], unk: String = "[UNK]"): Column =
    WordPieceKernels.wordpieceTokens(text, pieces, unk)
}
