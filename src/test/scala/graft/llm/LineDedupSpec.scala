package graft.llm

import graft.SparkTestBase

/** Line-level boilerplate dedup: frequency threshold, string-confirm
  * exactness, order-preserving reassembly, all-boilerplate docs kept as
  * empty rows, blank lines never counted.
  */
class LineDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "NAV\nunique one\nFOOTER"),
    (2L, "NAV\nunique two"),
    (3L, "NAV\nunique three\nFOOTER"),
    (4L, "unique four\nFOOTER"),
    (5L, "NAV\nFOOTER"), // all boilerplate
    (6L, "solo doc\n\nwith a blank line")
  ).toDF("doc_id", "text")

  test("frequentLines finds lines above the distinct-doc threshold, with counts") {
    val hot = LineDedup.frequentLines(corpus, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(hot == Map("NAV" -> 4L, "FOOTER" -> 4L))
  }

  test("a line repeated INSIDE one doc does not clear a distinct-doc threshold") {
    val df = Seq((1L, "dup\ndup\ndup"), (2L, "dup\nx"), (3L, "y")).toDF("doc_id", "text")
    val hot = LineDedup.frequentLines(df, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect()
    assert(hot.isEmpty) // 'dup' is in only 2 distinct docs
  }

  test("removeFrequentLines strips exactly the hot lines, preserving order and blanks") {
    val out = LineDedup.removeFrequentLines(corpus, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "unique one", 2L -> "unique two", 3L -> "unique three",
      4L -> "unique four",
      5L -> "", // all-boilerplate doc stays as an accounted empty row
      6L -> "solo doc\n\nwith a blank line"))
  }

  test("blank lines are preserved and never frequency-counted") {
    val df = Seq((1L, "a\n\nb"), (2L, "c\n\nd"), (3L, "e\n\nf")).toDF("doc_id", "text")
    assert(LineDedup.frequentLines(df, "doc_id", "text", minDocs = 2).count() == 0)
    val out = LineDedup.removeFrequentLines(df, "doc_id", "text", minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a\n\nb")
  }

  test("dedupLinesWithin keeps first occurrences in order; blanks all survive") {
    val df = Seq(
      (1L, "cookie banner\nreal content here\ncookie banner\nmore content\ncookie banner"),
      (2L, "a\n\nb\n\na"),       // blanks repeat but survive; second 'a' drops
      (3L, "only once"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLinesWithin(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "cookie banner\nreal content here\nmore content")
    assert(out(2L) == "a\n\nb\n")
    assert(out(3L) == "only once")
    assert(out(4L) == "")
  }
}
