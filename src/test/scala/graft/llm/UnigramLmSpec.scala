package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import graft.functions.UnigramImpl

/** Unigram-LM tokenizer: Viterbi exactness, forward–backward posteriors
  * against hand-computed values, deterministic training with full
  * single-code-point coverage, artifact round-trip, and the distributed
  * E-step certified against the driver E-step.
  */
class UnigramLmSpec extends SparkTestBase {

  test("viterbi picks the max-logprob segmentation; OOV singles fall back") {
    val t = UnigramImpl.tableOf(Seq(
      "a" -> -3.0, "b" -> -3.0, "ab" -> -1.0, "ba" -> -1.0, "abb" -> -2.5))
    // "ab" → piece ab (-1.0) beats a+b (-6.0)
    assert(UnigramImpl.viterbi("ab", t).toSeq == Seq("ab"))
    // "aba": ab+a (-4.0) vs a+ba (-4.0) — tie; the strictly-greater update
    // scanning final-piece lengths ascending keeps the SHORTEST last piece
    assert(UnigramImpl.viterbi("aba", t).toSeq == Seq("ab", "a"))
    // "abb": whole piece (-2.5) beats ab+b (-4.0)
    assert(UnigramImpl.viterbi("abb", t).toSeq == Seq("abb"))
    // OOV single 'x' segments via the fallback, in-vocab neighbors intact
    assert(UnigramImpl.viterbi("axb", t).toSeq == Seq("a", "x", "b"))
    assert(UnigramImpl.viterbi("", t).isEmpty)
  }

  test("forward-backward posteriors match the closed form on 'ab'") {
    // Two segmentations of "ab": [ab] with p=e^-1, [a, b] with p=e^-6.
    // P([ab]) = e^-1 / (e^-1 + e^-6); gamma(ab) = that, gamma(a) =
    // gamma(b) = 1 - that.
    val t = UnigramImpl.tableOf(Seq("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0))
    val g = UnigramImpl.expectedCounts("ab", t).toMap
    val pAb = math.exp(-1.0) / (math.exp(-1.0) + math.exp(-6.0))
    assert(math.abs(g("ab") - pAb) < 1e-12)
    assert(math.abs(g("a") - (1 - pAb)) < 1e-12)
    assert(math.abs(g("b") - (1 - pAb)) < 1e-12)
    // expected piece count == expected segmentation length:
    // 1·P([ab]) + 2·(1-P)
    assert(math.abs(g.values.sum - (pAb + 2 * (1 - pAb))) < 1e-12)
  }

  test("train: deterministic, single-cp coverage, normalized, compresses repeats") {
    val s = spark; import s.implicits._
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, "the their there then " + ("abc" * (i % 3 + 1)) + " xyz"))
      .toDF("doc_id", "text")
    val p1 = UnigramLm.train(corpus, vocabSize = 24, maxPieceLen = 3,
      seedSize = 64, emIters = 2)
    val p2 = UnigramLm.train(corpus, vocabSize = 24, maxPieceLen = 3,
      seedSize = 64, emIters = 2)
    assert(p1 == p2) // bit-identical across runs
    val vocab = p1.map(_._1).toSet
    // every single code point of the corpus is a piece
    val singles = "theirnxyzabc".map(_.toString).toSet
    assert(singles.subsetOf(vocab), s"missing ${singles -- vocab}")
    // log-probs normalize to 1 (unused -1e9 floors contribute ~0)
    val z = p1.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(z - 1.0) < 1e-9, s"sum p = $z")
    // a trained tokenizer beats character segmentation on its own corpus
    val counts = corpus.select(
        UnigramLm.tokenCount(col("text"), p1).cast("long").as("n"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("chars"))
      .agg(sum(col("n")), sum(col("chars"))).as[(Long, Long)].head()
    assert(counts._1 < counts._2, s"tokens ${counts._1} !< chars ${counts._2}")
  }

  test("artifact round-trip: save/load reproduces tokenization exactly") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "banana bandana cabana")).toDF("doc_id", "text")
    val pieces = UnigramLm.train(corpus, vocabSize = 16, maxPieceLen = 3,
      seedSize = 32)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    UnigramLm.savePieces(spark, pieces, s"$dir/pieces")
    val loaded = UnigramLm.loadPieces(spark, s"$dir/pieces")
    assert(loaded == pieces.sortBy(_._1))
    val a = corpus.select(UnigramLm.tokens(col("text"), pieces)).as[Seq[String]].head()
    val b = corpus.select(UnigramLm.tokens(col("text"), loaded)).as[Seq[String]].head()
    assert(a == b && a.nonEmpty)
  }

  test("tokenIds: dense piece-ascending vocabulary, decode identity, OOV = -1") {
    val s = spark; import s.implicits._
    val pieces = Seq("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0)
    // ids follow piece-ascending order: a=0, ab=1, b=2
    assert(UnigramLm.vocabulary(pieces) == Seq((0, "a"), (1, "ab"), (2, "b")))
    val df = Seq((1L, "ab a b"), (2L, "axb")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        UnigramLm.tokenIds($"text", pieces).as("ids"),
        UnigramLm.tokens($"text", pieces).as("toks"))
      .as[(Long, Seq[Int], Seq[String])].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == Seq(1, 0, 2)) // [ab, a, b]
    assert(got(2L)._2 == Seq(0, -1, 2)) // OOV 'x' has no id
    // decode identity on the in-vocab doc
    val vocab = UnigramLm.vocabulary(pieces).map(_._2)
    assert(got(1L)._2.map(vocab(_)) == got(1L)._3)
  }

  test("sampled segmentation: valid, seed-deterministic, alpha->inf = Viterbi") {
    val s = spark; import s.implicits._
    val pieces = Seq("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0, "ba" -> -1.2)
    val df = Seq((1L, "abab ab a"), (2L, "bababa")).toDF("doc_id", "text")
    def sample(alpha: Double, seed: Long) =
      df.select($"doc_id", UnigramLm.sampleTokens($"text", pieces, alpha, seed))
        .as[(Long, Seq[String])].collect().toMap
    // validity: concatenation reconstructs the whitespace-stripped text
    val s1 = sample(1.0, 7L)
    val stripped1 = "abab ab a".replaceAll("\\s+", "")
    val stripped2 = "bababa"
    assert(s1(1L).mkString == stripped1, s"${s1(1L)}")
    assert(s1(2L).mkString == stripped2, s"${s1(2L)}")
    // determinism: same seed → identical; different seed → usually different
    assert(sample(1.0, 7L) == sample(1.0, 7L))
    // alpha large → the argmax path (Viterbi) for every word
    val hard = sample(60.0, 3L)
    val vit = df.select($"doc_id", UnigramLm.tokens($"text", pieces))
      .as[(Long, Seq[String])].collect().toMap
    assert(hard == vit, s"$hard vs $vit")
    // alpha 0: still valid segmentations
    val loose = sample(0.0, 11L)
    assert(loose(2L).mkString == stripped2)
  }

  test("distributed E-step matches the driver E-step") {
    val s = spark; import s.implicits._
    val corpus = Seq.tabulate(20)(i =>
      (i.toLong, "alpha beta gamma " + ("ab" * (i % 4 + 1)))).toDF("doc_id", "text")
    val words = Bpe.wordCounts(corpus).localCheckpoint()
    val pieces = UnigramLm.train(corpus, vocabSize = 32, maxPieceLen = 3,
      seedSize = 64, emIters = 1)
    // driver side
    val table = UnigramImpl.tableOf(pieces)
    val rows = words.as[(String, Long)].collect()
    val driver = scala.collection.mutable.HashMap.empty[String, Double]
    rows.foreach { case (w, n) =>
      UnigramImpl.expectedCounts(w, table).foreach { case (p, g) =>
        driver.update(p, driver.getOrElse(p, 0.0) + g * n)
      }
    }
    // distributed side
    val dist = UnigramLm.expectedCountsDistributed(words, pieces)
      .as[(String, Double)].collect().toMap
    assert(dist.keySet == driver.keySet.toSet)
    dist.foreach { case (p, v) =>
      val d = driver(p)
      assert(math.abs(v - d) <= 1e-9 * math.max(1.0, math.abs(d)),
        s"piece $p: dist $v vs driver $d")
    }
  }
}
