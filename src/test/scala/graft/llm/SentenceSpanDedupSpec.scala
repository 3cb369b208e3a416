package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SentenceSpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (String, Long)] =
    SentenceSpanDedup.dedupSpans(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap

  test("global first occurrence keeps the span; later docs lose it") {
    val boiler = " Subscribe now! Follow us. Thanks."
    val out = run(Seq(
      (1L, "Unique one." + boiler),
      (2L, "Unique two." + boiler),
      (3L, "Unique three." + boiler)))
    assert(out(1L) === ("Unique one. Subscribe now! Follow us. Thanks.", 4L))
    assert(out(2L) === ("Unique two.", 1L))
    assert(out(3L) === ("Unique three.", 1L))
  }

  test("overlapping duplicate spans union their sentence marks") {
    // doc 2 contains A B C D; spans (A,B,C) and (B,C,D) both duplicate
    // doc 1's spans → sentences A..D all removed from doc 2.
    val out = run(Seq(
      (1L, "Alpha beats. Bravo sings. Charlie naps. Delta runs."),
      (2L, "Alpha beats. Bravo sings. Charlie naps. Delta runs. Echo ends.")))
    assert(out(1L)._2 === 4L) // first doc intact
    assert(out(2L) === ("Echo ends.", 1L))
  }

  test("a duplicate span WITHIN one document removes the later copy") {
    val out = run(Seq(
      (5L, "One two. Three four. Five six. Filler here. One two. Three four. Five six.")))
    assert(out(5L) === ("One two. Three four. Five six. Filler here.", 4L))
  }

  test("separator prevents cross-boundary false merges") {
    // ("ab","c","d") vs ("a","bc","d"): concatenations collide without a
    // separator; with U+001F they are distinct spans — nothing removed.
    val out = run(Seq(
      (1L, "ab. c. d."),
      (2L, "a. bc. d.")))
    assert(out(1L) === ("ab. c. d.", 3L))
    assert(out(2L) === ("a. bc. d.", 3L))
  }

  test("documents with fewer than three sentences pass through") {
    val out = run(Seq(
      (1L, "Only one here."),
      (2L, "Two now. Second one."),
      (3L, "")))
    assert(out(1L) === ("Only one here.", 1L))
    assert(out(2L) === ("Two now. Second one.", 2L))
    assert(out(3L) === ("", 0L))
  }

  test("identical whole documents: second keeps nothing once spans cover it") {
    val t = "Aa bb. Cc dd. Ee ff."
    val out = run(Seq((1L, t), (2L, t)))
    assert(out(1L) === ("Aa bb. Cc dd. Ee ff.", 3L))
    assert(out(2L) === ("", 0L))
  }
}
