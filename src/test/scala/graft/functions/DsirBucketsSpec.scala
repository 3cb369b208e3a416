package graft.functions

import graft.SparkTestBase
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._

/** DsirBuckets: the fused kernel must reproduce the retired Column
  * pipeline (explode(unigrams ++ bigrams) → fingerprint → pmod) value for
  * value AND in order, on every tokenization edge the Column primitives
  * produce — empty text, non-space whitespace (trim trims only spaces, so
  * split emits empty edge tokens), multi-codepoint characters.
  */
class DsirBucketsSpec extends SparkTestBase {

  private val texts = Seq(
    "", "   ", "a", "a b", "a  b\tc", "\tx y", "Hello WORLD",
    "Héllo wörld 漢字", "a b ", "a\nb", "𝒜 b", "one",
    "many tokens in a row here", "trailing tab\t", "\t", "UP low MiXeD")

  /** The retired Column formula, verbatim (kept here as the cross-check —
    * the kernel's only contract is bit-and-order equality to this). */
  private def oldBuckets(text: org.apache.spark.sql.Column, n: Long) = {
    val ts = TextAnalysis.tokensWs(lower(text))
    val bi = when(size(ts) >= 2,
      transform(sequence(lit(2), size(ts)), i =>
        concat(element_at(ts, i - 1), lit(" "), element_at(ts, i))))
      .otherwise(array().cast("array<string>"))
    (ts, bi)
  }

  test("kernel buckets equal the Column pipeline, value for value, in order") {
    val s = spark; import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val (ts, bi) = oldBuckets(col("text"), 64L)
    val old = df
      .select(col("id"), posexplode(concat(ts, bi)).as(Seq("pos", "g")))
      .select(col("id"), col("pos"),
        pmod(TextAnalysis.fingerprint(col("g")), lit(64L)).as("b"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val neu = df
      .select(col("id"), posexplode(
        TextKernels.dsirBuckets(col("text"), 64)).as(Seq("pos", "b")))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(neu == old)
  }

  test("null text yields zero rows, like the Column pipeline") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b"))).toDF("id", "text")
    val rows = df.select(col("id"),
      explode(TextKernels.dsirBuckets(col("text"), 64)).as("b")).collect()
    assert(rows.forall(_.getLong(0) == 2L) && rows.length == 3)
  }
}
