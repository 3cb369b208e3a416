package graft.functions

import graft.SparkTestBase
import graft.llm.{GopherRules, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the fused text kernels (finding 46): on ARBITRARY
  * unicode text — not just the crafted grids — each kernel must equal the
  * retired Column formulation it replaced. The generator mixes plain
  * words, whitespace variants (space/tab/newline — trim only strips
  * spaces, so these hit the empty-edge-token paths), multi-byte chars,
  * surrogate pairs, bullets and terminal punctuation.
  */
class TextKernelPropertiesSpec extends SparkTestBase {

  private def sampled[A](g: Gen[A], n: Int = 40): Seq[A] = {
    var seed = Seed(1337L)
    (0 until n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private val piece: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "\t", "\n", "  ", " \t\n"),
    Gen.oneOf("héllo", "wörld", "漢字", "𝒜𝒜", "•", "- ", "...", ".", "!",
      "?", "\"", "#", "the", "The", "BE", "to", "{", "lorem ipsum"))

  private val textGen: Gen[String] = for {
    k <- Gen.choose(0, 24)
    ps <- Gen.listOfN(k, piece)
  } yield ps.mkString

  test("DsirBuckets == retired Column pipeline on arbitrary text") {
    val s = spark; import s.implicits._
    val df = sampled(textGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val ts = TextAnalysis.tokensWs(lower(col("text")))
    val bi = when(size(ts) >= 2,
      transform(sequence(lit(2), size(ts)), i =>
        concat(element_at(ts, i - 1), lit(" "), element_at(ts, i))))
      .otherwise(array().cast("array<string>"))
    val old = df.select(col("id"), posexplode(concat(ts, bi)).as(Seq("p", "g")))
      .select(col("id"), col("p"),
        pmod(TextAnalysis.fingerprint(col("g")), lit(97L)).as("b"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val neu = df.select(col("id"),
        posexplode(TextKernels.dsirBuckets(col("text"), 97)).as(Seq("p", "b")))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(neu == old)
  }

  test("GopherStats == retired Column formulation on arbitrary text") {
    val s = spark; import s.implicits._
    val df = sampled(textGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val text = col("text")
    val ts = TextAnalysis.tokensWs(text)
    val staged = df.select(col("id"), ts.as("__ws"),
      transform(ts, w => lower(w)).as("__lws"), split(text, "\n").as("__lines"))
    val old = staged.select(col("id"),
        size(col("__ws")).cast("long"),
        aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w)),
        size(filter(col("__ws"), w => w.rlike("[A-Za-z]"))).cast("long"),
        size(filter(array(GopherRules.Stopwords.map(lit(_)): _*),
          sw => array_contains(col("__lws"), sw))).cast("long"),
        size(col("__lines")).cast("long"),
        size(filter(col("__lines"), l => l.endsWith("..."))).cast("long"),
        size(filter(col("__lines"), l =>
          l.startsWith("•") || l.startsWith("- "))).cast("long"))
      .orderBy(col("id")).collect().toSeq.map(_.toSeq)
    val neu = df.select(col("id"), TextKernels.gopherStats(text).as("__st"))
      .select(col("id"), col("__st.n_words"), col("__st.sum_len"),
        col("__st.n_alpha"), col("__st.n_stop"), col("__st.n_lines"),
        col("__st.n_ell_lines"), col("__st.n_bullet_lines"))
      .orderBy(col("id")).collect().toSeq.map(_.toSeq)
    assert(neu == old)
  }

  test("C4KeptLines == Column lineKeep filter on arbitrary text") {
    val s = spark; import s.implicits._
    val df = sampled(textGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // C4Rules.lineKeep, restated (it is private[llm]; C4RulesSpec pins the
    // kernel against the original directly).
    def lineKeep(l: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(split(trim(l), "\\s+")) >= 3
    val old = df.select(col("id"),
        filter(split(col("text"), "\n"), l => lineKeep(l)).as("k"))
      .orderBy(col("id")).collect().map(_.getSeq[String](1)).toSeq
    val neu = df.select(col("id"),
        TextKernels.c4KeptLines(col("text"), 3).as("k"))
      .orderBy(col("id")).collect().map(_.getSeq[String](1)).toSeq
    assert(neu == old)
  }
}
