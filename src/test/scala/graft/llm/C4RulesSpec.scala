package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Pins the C4 line-retention and document-drop semantics on hand-built
  * documents where every rule decision is computable by eye.
  */
class C4RulesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, Row] =
    C4Rules(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("fused kernel kept-lines equal the Column lineKeep filter") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      1L -> "This line has five good words.\nshort.\nno terminal punct here at all\nA quoted line of five words\"\nBang line with five words!",
      2L -> "", 3L -> "\n\n", 4L -> "   trailing spaces line of six words.   ",
      5L -> "héllo wörld 漢字 line of seven words?\ntab\tseparated line of five words.")
      .toDF("doc_id", "text")
    val old = docs.select(col("doc_id"),
        filter(split(col("text"), "\n"),
          l => C4Rules.lineKeep(l, 5)).as("kept"))
      .orderBy(col("doc_id")).collect().map(r => r.getSeq[String](1)).toSeq
    val neu = docs.select(col("doc_id"),
        graft.functions.TextKernels.c4KeptLines(col("text"), 5).as("kept"))
      .orderBy(col("doc_id")).collect().map(r => r.getSeq[String](1)).toSeq
    assert(neu == old)
  }

  test("line retention: terminal punctuation AND five words") {
    val doc = Seq(
      "This line has enough words and ends well.",   // kept
      "Too short.",                                   // < 5 words
      "This line has plenty of words but no period", // no terminal punct
      "Does this question count as a kept line?",     // kept (?)
      "He said it ends with a quote.\"",              // kept (")
      "Menu Home About Contact"                       // nav junk: no punct
    ).mkString("\n")
    val r = run(1L -> doc)(1L)
    assert(r.getAs[Long]("n_lines_kept") === 3L)
    val clean = r.getAs[String]("clean_text").split("\n")
    assert(clean.length === 3 && clean(0).endsWith("well."))
    assert(r.getAs[Boolean]("r_min_sentences") && r.getAs[Boolean]("keep"))
  }

  test("document drops: braces, lorem ipsum, javascript — on ORIGINAL text") {
    val base = Seq(
      "This is a perfectly normal first sentence here.",
      "And a second sentence with enough words too.",
      "Finally a third sentence to clear the floor.").mkString("\n")
    val r = run(
      1L -> base,
      2L -> (base + "\nfunction f() { return 1; }"),
      3L -> (base + "\nLorem Ipsum dolor sit amet."),
      4L -> (base + "\nPlease enable JavaScript to view this page."))
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("r_no_braces") && !r(2L).getAs[Boolean]("keep"))
    assert(!r(3L).getAs[Boolean]("r_no_lorem") && !r(3L).getAs[Boolean]("keep"))
    assert(!r(4L).getAs[Boolean]("r_no_javascript") && !r(4L).getAs[Boolean]("keep"))
  }

  test("a doc with fewer than three surviving sentences drops; empty clean text") {
    val r = run(1L -> "Just one proper sentence lives right here.\nnav bar junk")(1L)
    assert(!r.getAs[Boolean]("r_min_sentences") && !r.getAs[Boolean]("keep"))
    val none = run(2L -> "no lines survive this")(2L)
    assert(none.getAs[String]("clean_text") === "")
    assert(none.getAs[Long]("n_lines_kept") === 0L)
  }
}
