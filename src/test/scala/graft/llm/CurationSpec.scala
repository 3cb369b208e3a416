package graft.llm

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // Every doc long enough (>= 50 chars) and alphabetic enough to pass the
  // quality gate unless constructed otherwise.
  private val enBase = "the quick brown fox jumps over that lazy dog and runs far away in a field of green grass"

  test("curation drops non-target-language, low-quality, exact- and near-duplicates, then samples") {
    val docs = Seq(
      (1L, enBase),                                     // kept (subject to sample)
      (2L, enBase),                                     // exact dup of 1 → dropped
      (3L, enBase + " with a tiny extra tail here"),    // near dup of 1 → dropped
      (4L, "der hund ist nicht zu klein und das haus ist ein traum der die das und wieder"), // German → dropped
      (5L, "!!!! ???? ,,,, ;;;; !!!! ???? ,,,, ;;;; !!!! ???? ,,,, ;;;; ####"), // punct junk → dropped
      (6L, "a completely different english sentence that is about nothing in particular at all today")
    ).toDF("doc_id", "text")
    // sampleDen=1 → no sampling: isolate the filtering stages.
    val kept = Curation.run(docs, sampleNum = 1, sampleDen = 1)
      .as[Long].collect().toSeq
    assert(kept == Seq(1L, 6L))
  }

  test("sampling stage applies the deterministic keep rule to survivors") {
    // Distinct docs: every 3-gram contains an i-specific word, so no two
    // docs share a shingle (no near-dup collapse), while the common English
    // stopwords keep the language gate green and all-alphabetic words keep
    // quality high.
    val docs = (1L to 40L).map { i =>
      val s = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
      (i, s"the item${s}a of item${s}b and item${s}c to item${s}d in " +
        s"item${s}e is item${s}f that item${s}g the item${s}h")
    }.toDF("doc_id", "text")
    val all = Curation.run(docs, sampleNum = 1, sampleDen = 1).as[Long].collect().toSet
    val half = Curation.run(docs, sampleNum = 1, sampleDen = 2).as[Long].collect().toSet
    assert(half.subsetOf(all))
    assert(half.size < all.size && half.nonEmpty)
  }

  test("runModern: each gate drops its target, survivors sampled by source budget") {
    val gram = "one two three four five six seven eight"
    val diverse = "assorted tokens compose sentences exhibiting reasonable entropy levels overall"
    val docs = Seq(
      (1L, s"keep doc with $diverse", "srcA"),
      (2L, "spam spam spam spam spam spam spam spam spam spam", "srcA"), // repetition gate
      (3L, "aaaaaaaaaa aaaaaaaaaa aaaaaaaaaa aaaaaaaaaa", "srcA"),        // entropy gate
      (4L, s"contaminated because $gram appears here", "srcA"),          // decontamination
      (5L, s"keep doc with $diverse", "srcA"),                            // exact dup of 1 → dropped
      (6L, s"unique survivor number six with $diverse words", "srcB")
    ).toDF("doc_id", "text", "source")
    val benchmark = Seq((99L, s"the benchmark holds $gram inside")).toDF("doc_id", "text")
    // huge budgets → the sampler keeps everything that survives the gates
    val kept = Curation.runModern(docs, benchmark,
        maxDupFrac = 0.55, minEntropyMicro = 2000000L,
        budgets = Map("srcA" -> 1000000L, "srcB" -> 1000000L))
      .as[(Long, String)].collect().toMap
    assert(kept.keySet == Set(1L, 6L), s"got $kept")
    // zero budget for srcB drops its survivors deterministically
    val noB = Curation.runModern(docs, benchmark,
        maxDupFrac = 0.55, minEntropyMicro = 2000000L,
        budgets = Map("srcA" -> 1000000L, "srcB" -> 0L))
      .as[(Long, String)].collect().toMap
    assert(noB.keySet == Set(1L))
  }
}
