package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher quality-rule gate (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", Appendix A) — the
  * rule set RefinedWeb and FineWeb start from: cheap structural checks that
  * together drop machine-generated and boilerplate pages before any model
  * gets involved. One pure-map pass; every rule a column.
  *
  * Exactness discipline: every ratio threshold is expressed as an INTEGER
  * cross-multiplication (`10·symbols ≤ n_words` instead of
  * `symbols/n_words ≤ 0.1`), so each rule is a boolean over integers —
  * bit-stable in any engine, no float division anywhere.
  *
  * Shape at scale: a single projection over the corpus — no shuffle, no
  * join, no aggregation; composes in front of the dedup/LM stages the way
  * the curation pipelines order their gates (cheap pure maps first).
  *
  * Word bounds are parameters (the paper's 50..100k): the driver corpus
  * documents are shorter than a web crawl's, so registered queries pin
  * bounds fitting the fixture while the operator keeps the paper defaults.
  */
object GopherRules {

  /** Gopher's stopword-presence list (Appendix A: "contains at least two
    * of the following English words").
    */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule columns + the conjunction:
    * `(idCol, n_words, r_word_count, r_mean_word_len, r_symbol_ratio,
    * r_ellipsis_lines, r_bullet_lines, r_alpha_words, r_stopwords, keep)`.
    */
  def apply(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Long = 50L,
      maxWords: Long = 100000L): DataFrame = {
    val text = col(textCol)
    // All per-token / per-line counts come from ONE codegen'd kernel call
    // per document (GopherStatsSpec pins equality to the retired Column
    // formulation). The former staging ran five interpreted lambda passes
    // over the token/line arrays per row — HOFs are CodegenFallback, and
    // interpreted eval at corpus scale is slow and JIT-profile-fragile
    // (PLANS.md finding 46).
    val staged = df.select(col(idCol), text,
      graft.functions.TextKernels.gopherStats(text).as("__st"))
    val nWords = col("__st.n_words")
    // Σ word lengths (integer) for the mean-word-length bounds [3, 10].
    val sumLen = col("__st.sum_len")
    // '#' occurrences + '...' occurrences (non-overlapping, like replace).
    val nHash = ((length(text) - length(replace(text, lit("#"), lit("")))))
      .cast("long")
    val nEllipsis = ((length(text) - length(replace(text, lit("..."), lit(""))))
      / lit(3)).cast("long")
    val nLines = col("__st.n_lines")
    val nEllipsisLines = col("__st.n_ell_lines")
    val nBulletLines = col("__st.n_bullet_lines")
    val nAlphaWords = col("__st.n_alpha")
    val nStop = col("__st.n_stop")
    staged.select(
        col(idCol),
        nWords.as("n_words"),
        (nWords >= minWords && nWords <= maxWords).as("r_word_count"),
        // 3 ≤ sumLen/n ≤ 10  ⇔  3n ≤ sumLen ∧ sumLen ≤ 10n (integers)
        (sumLen >= lit(3L) * nWords && sumLen <= lit(10L) * nWords)
          .as("r_mean_word_len"),
        // (hash + ellipsis)/words ≤ 0.1  ⇔  10·(hash+ellipsis) ≤ words
        (lit(10L) * (nHash + nEllipsis) <= nWords).as("r_symbol_ratio"),
        // ellipsis-terminated lines ≤ 30%  ⇔  10·count ≤ 3·lines
        (lit(10L) * nEllipsisLines <= lit(3L) * nLines).as("r_ellipsis_lines"),
        // bullet-led lines ≤ 90%  ⇔  10·count ≤ 9·lines
        (lit(10L) * nBulletLines <= lit(9L) * nLines).as("r_bullet_lines"),
        // words with an alphabetic char ≥ 80%  ⇔  5·count ≥ 4·words
        (lit(5L) * nAlphaWords >= lit(4L) * nWords).as("r_alpha_words"),
        (nStop >= 2L).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
        col("r_ellipsis_lines") && col("r_bullet_lines") &&
        col("r_alpha_words") && col("r_stopwords"))
  }
}
