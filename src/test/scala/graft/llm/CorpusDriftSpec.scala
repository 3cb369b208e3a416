package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Corpus drift report: identity on an unchanged corpus, hand-computed
  * metrics on a controlled mutation.
  */
class CorpusDriftSpec extends SparkTestBase {

  test("identical corpora report zero drift") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val r = CorpusDrift.report(d, d)
      .as[(Double, Double, Double, Long)].head()
    assert(r._1 == 1.0)   // vocab jaccard
    assert(r._2 == 0.0)   // unseen mass
    assert(r._3 == 0.0)   // mean length delta
    assert(r._4 == 0L)    // JS divergence
  }

  test("hand-computed drift on a controlled mutation") {
    val s = spark; import s.implicits._
    // ref: 4 tokens {a:2, b:2}; cand: 4 tokens {a:2, z:2} — one word
    // replaced wholesale.
    val ref = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val cand = Seq((1L, "a z"), (2L, "a z")).toDF("doc_id", "text")
    val r = CorpusDrift.report(ref, cand)
      .as[(Double, Double, Double, Long)].head()
    assert(r._1 == 1.0 / 3.0)  // {a} over {a, b, z}
    assert(r._2 == 0.5)        // z carries half the candidate mass
    assert(r._3 == 0.0)        // same shape
    // JS: a contributes 0 (same p, exact-rational x = 1 → fixed-point ln
    // is exactly 0); b and z each contribute 0.5·(0.5·ln 2). Expected
    // value replays the fixed-point pipeline on the JVM reference:
    // per-word term = floor((ca·lnNano(2·ca·totb, qq)/tota + 1000)/2000).
    val wua = 2L * graft.functions.FixedPointLog.lnNanoRef(16L, 8L) / 4L
    val expected = 2L * ((wua + 1000L) / 2000L)
    assert(r._4 == expected, s"js = ${r._4} want $expected")
    // and the fixed-point value agrees with double math to ±1 micro-nat
    assert(math.abs(r._4 - 0.5 * math.log(2.0) * 1e6) <= 1.0)
  }

  test("pure addition: unseen mass positive, jaccard below 1, length grows") {
    val s = spark; import s.implicits._
    val ref = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val cand = Seq((1L, "a b c d zz")).toDF("doc_id", "text")
    val r = CorpusDrift.report(ref, cand)
      .as[(Double, Double, Double, Long)].head()
    assert(r._1 == 4.0 / 5.0)
    assert(r._2 == 1.0 / 5.0)
    assert(r._3 == 3.0) // " zz"
    assert(r._4 > 0L)
  }
}
