package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Pins each Gopher rule on a hand-built doc that violates exactly that
  * rule while a control doc passes all of them.
  */
class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val clean =
    "the quick brown fox jumps over that lazy dog and then runs " +
    "away with great speed because every good sentence must have " +
    "words of reasonable length that carry meaning through text " +
    "while keeping the overall structure sound and balanced here " +
    "with more plain words to clear the fifty word minimum easily now"

  private def rules(rows: (Long, String)*): Map[Long, Row] =
    GopherRules(rows.toDF("doc_id", "text"), minWords = 50)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("clean prose passes every rule") {
    val r = rules(1L -> clean)(1L)
    (2 to 9).foreach(i => assert(r.getBoolean(i), s"column $i should pass"))
  }

  test("each violation trips exactly its rule") {
    val shortDoc = "too few words here"
    val longWords = Seq.fill(60)("pneumonoultramicroscopic").mkString(" ")
    val hashy = clean + " " + Seq.fill(20)("#").mkString(" ")
    val bullets = Seq.fill(60)("• item").mkString("\n")
    val noAlpha = Seq.fill(60)("12345").mkString(" ")
    val noStop = Seq.fill(60)("zulu").mkString(" ")
    val r = rules(1L -> shortDoc, 2L -> longWords, 3L -> hashy,
      4L -> bullets, 5L -> noAlpha, 6L -> noStop)
    assert(!r(1L).getAs[Boolean]("r_word_count"))
    assert(!r(2L).getAs[Boolean]("r_mean_word_len"))
    assert(!r(3L).getAs[Boolean]("r_symbol_ratio"))
    assert(!r(4L).getAs[Boolean]("r_bullet_lines"))
    assert(!r(5L).getAs[Boolean]("r_alpha_words"))
    assert(!r(6L).getAs[Boolean]("r_stopwords"))
    r.values.foreach(row => assert(!row.getAs[Boolean]("keep")))
  }

  test("ellipsis line rule: over 30% of lines ending in ... fails") {
    val doc = (Seq.fill(4)("line ends here...") ++ Seq.fill(6)("a plain line"))
      .mkString("\n")
    val r = rules(1L -> doc)(1L)
    assert(!r.getAs[Boolean]("r_ellipsis_lines")) // 40% > 30%
    val ok = (Seq.fill(3)("line ends here...") ++ Seq.fill(7)("a plain line"))
      .mkString("\n")
    assert(rules(1L -> ok)(1L).getAs[Boolean]("r_ellipsis_lines")) // 30% ≤ 30%
  }
}
