package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Substring-level exact dedup (Lee et al. 2022 span semantics): planted
  * cross-document boilerplate is found and stripped, unique text is never
  * touched, adjacent duplicated grams merge into maximal spans, and an
  * engineered fingerprint collision cannot mark a unique span (the
  * two-stage exactness discipline).
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val header = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tokens

  test("cross-doc boilerplate becomes exactly the header span; unique docs untouched") {
    val corpus = Seq(
      (1L, s"$header red orange yellow green blue indigo"),
      (2L, s"$header cat dog bird fish mouse lizard"),
      (3L, "entirely unique text with no repeats anywhere at all")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(corpus, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    // k=4 grams at pos 0..6 lie inside the 10-token header (duplicated in
    // docs 1 and 2); grams at pos 7+ straddle into distinct tails. Merged
    // span = [0, 6+3] = the header, exactly.
    assert(spans == Set((1L, 0L, 9L), (2L, 0L, 9L)), s"got $spans")

    val cleaned = SubstringDedup.dedupSubstrings(corpus, k = 4)
      .as[(Long, String)].collect().toMap
    assert(cleaned(1L) == "red orange yellow green blue indigo")
    assert(cleaned(2L) == "cat dog bird fish mouse lizard")
    assert(cleaned(3L) == "entirely unique text with no repeats anywhere at all",
      "unique doc text is verbatim, not re-tokenized")
  }

  test("a within-document repeat is duplicated too (any-two-occurrences)") {
    val corpus = Seq(
      (1L, "start one two three four middle one two three four end"),
      (2L, "totally different words here that never repeat at all")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(corpus, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    // "one two three four" at pos 1 and pos 6: both occurrences marked.
    // They merge iff 6 <= 1 + k = 5 — they don't, so two separate spans.
    assert(spans == Set((1L, 1L, 4L), (1L, 6L, 9L)), s"got $spans")
  }

  test("overlapping duplicated grams merge into one maximal span") {
    // Docs share an 8-token run -> k=4 duplicated positions 0..4 in each,
    // every consecutive pair within k -> ONE span [0, 7].
    val run = "p q r s t u v w"
    val corpus = Seq(
      (1L, s"$run tail1 only1"),
      (2L, s"$run tail2 only2")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(corpus, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 7L), (2L, 0L, 7L)), s"got $spans")
  }

  test("docs with fewer than k tokens emit no grams and survive removeSpans") {
    val corpus = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // the full texts are exact duplicates but too short to form a 4-gram
    assert(SubstringDedup.duplicatedSpans(corpus, k = 4).isEmpty)
    val out = SubstringDedup.dedupSubstrings(corpus, k = 4)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a b", 2L -> "a b"))
  }

  test("an engineered fingerprint collision does not mark a unique span") {
    // Same birthday-search construction as the decontamination spec: two
    // different tokens with equal mod-1e9+7 polynomial hash make two
    // different 4-grams with the SAME fingerprint. The unique gram survives
    // the stage-1 prefilter (its fp count is 3) but must be rejected by the
    // stage-2 string confirm.
    val p = 1000000007L
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => java.lang.Math.floorMod(a * 131L + c.toLong, p))
    val rnd = new scala.util.Random(42)
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    var pair: Option[(String, String)] = None
    while (pair.isEmpty) {
      val t = Array.fill(7)(('a' + rnd.nextInt(26)).toChar).mkString
      seen.get(poly(t)) match {
        case Some(u) if u != t => pair = Some((u, t))
        case _                 => seen(poly(t)) = t
      }
    }
    val (t1, t2) = pair.get
    val gram1 = s"one two three $t1"
    val gram2 = s"one two three $t2"
    assert(gram1 != gram2 && poly(gram1) == poly(gram2), "engineered collision")
    val corpus = Seq(
      (1L, gram1), // unique gram, colliding fp
      (2L, gram2), // duplicated gram ...
      (3L, gram2)  // ... second occurrence
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(corpus, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((2L, 0L, 3L), (3L, 0L, 3L)),
      s"collision must not mark doc 1; got $spans")
    val cleaned = SubstringDedup.dedupSubstrings(corpus, k = 4)
      .as[(Long, String)].collect().toMap
    assert(cleaned(1L) == gram1, "unique text untouched")
    assert(cleaned(2L) == "" && cleaned(3L) == "", "fully-covered docs empty")
  }

  test("removeKnownSpans kernel ≡ relational dedupSubstrings when the catalog is the corpus's own grams") {
    // The ingestion-gate kernel fed the corpus's own duplicated-gram set
    // must reproduce the relational span pipeline exactly, doc for doc.
    val corpus = Seq(
      (1L, s"$header red orange yellow green blue indigo"),
      (2L, s"$header cat dog bird fish mouse lizard"),
      (3L, "entirely unique text with no repeats anywhere at all"),
      (4L, "start one two three four middle one two three four end"),
      (5L, "a b"),
      (6L, s"tail first then $header")
    ).toDF("doc_id", "text")
    val k = 4
    val grams = SubstringDedup.duplicatedGrams(corpus, k = k)
      .as[String].collect().toSeq
    assert(grams.nonEmpty)
    val relational = SubstringDedup.dedupSubstrings(corpus, k = k)
      .as[(Long, String)].collect().toMap
    val kernel = corpus.select(col("doc_id"),
        SubstringDedup.removeKnownSpans(col("text"), grams, k).as("text"))
      .as[(Long, String)].collect().toMap
    assert(kernel == relational, s"kernel $kernel vs relational $relational")
    // the gate applied to UNSEEN docs carrying the known boilerplate
    val fresh = Seq((100L, s"$header completely fresh tail words here")).toDF("doc_id", "text")
    val cleaned = graft.streaming.StreamingDedup
      .stripKnownBoilerplate(fresh, grams, k)
      .as[(Long, String)].collect().head._2
    assert(cleaned == "completely fresh tail words here")
  }

  test("removeSpans keeps extra columns and only rewrites the text column") {
    val corpus = Seq(
      (1L, s"$header tail1 t1b", "en"),
      (2L, s"$header tail2 t2b", "de")
    ).toDF("doc_id", "text", "lang")
    val out = SubstringDedup.dedupSubstrings(corpus, k = 4)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
    val m = out.as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 == "tail1 t1b" && m(1L)._3 == "en")
    assert(m(2L)._2 == "tail2 t2b" && m(2L)._3 == "de")
  }
}
