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

  test("fused kernel stats equal the retired Column formulation") {
    import org.apache.spark.sql.functions._
    // The retired five-lambda staging, verbatim — the kernel's contract
    // is column-for-column equality to it on every tokenization edge.
    val docs = Seq(
      1L -> clean,
      2L -> "",
      3L -> "   ",
      4L -> "\tTabbed start and trailing tab\t",
      5L -> "• bullet one\n- bullet two\nplain line...\nlast",
      6L -> "The BE tO of AND that HAVE with the the",
      7L -> "héllo wörld 漢字 𝒜𝒜 mixed #tags and more...\n...",
      8L -> "no stop words at all just gibberish zz qq",
      9L -> "a\nb\nc...\n", 10L -> "...")
      .toDF("doc_id", "text")
    val text = col("text")
    val ts = TextAnalysis.tokensWs(text)
    val staged = docs.select(col("doc_id"), ts.as("__ws"),
      transform(ts, w => lower(w)).as("__lws"), split(text, "\n").as("__lines"))
    val old = staged.select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
        size(filter(col("__ws"), w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
        size(filter(array(GopherRules.Stopwords.map(lit(_)): _*),
          sw => array_contains(col("__lws"), sw))).cast("long").as("n_stop"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(filter(col("__lines"), l => l.endsWith("..."))).cast("long")
          .as("n_ell_lines"),
        size(filter(col("__lines"), l =>
          l.startsWith("•") || l.startsWith("- "))).cast("long")
          .as("n_bullet_lines"))
      .orderBy(col("doc_id")).collect().toSeq
    val neu = docs.select(col("doc_id"),
        graft.functions.TextKernels.gopherStats(text).as("__st"))
      .select(col("doc_id"), col("__st.n_words"), col("__st.sum_len"),
        col("__st.n_alpha"), col("__st.n_stop"), col("__st.n_lines"),
        col("__st.n_ell_lines"), col("__st.n_bullet_lines"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(neu == old)
  }

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
