package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring — TF-IDF and BM25 — as distributed Spark plans.
  *
  * Shape at scale: one explode of the token stream feeds BOTH the per-doc
  * term frequencies and (via a second aggregation on the term key) the
  * document frequencies; every aggregation is a hash aggregate with map-side
  * partials; the IDF table joins back on the term key the tf side already
  * hashes by (TF-IDF's full-vocabulary table is NOT broadcast-hinted — it
  * is unbounded at corpus scale; BM25's query-terms-only table is), and
  * per-doc TOP-N terms use row_number (no global sort). Nothing in the plan
  * materializes a vocabulary on the driver.
  *
  * Exactness for the oracle: cross-row sums are kept in INTEGER domain —
  * per-term scores are rounded to micro-units (×1e6, half-up) BEFORE the
  * per-doc sum, so partial-aggregation order cannot move the result (the
  * QueryUtil.round6 discipline, applied to sums).
  */
object Relevance {

  /** Lowercased whitespace tokens, empties dropped (split of a trimmed
    * string never yields empties, but stay defensive for raw input).
    */
  private def toks(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** `(id, term, tf)` — term frequency per document. One shuffle on
    * (id, term).
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** `(term, df)` — number of documents containing each term. Derived from
    * [[termFrequencies]] so the explode happens once in a shared plan.
    */
  def docFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-`k` TF-IDF terms per document: `(id, term, tfidf)` with
    * `tfidf = round(tf * ln(N / df), 6)`, ranked per doc by (tfidf desc,
    * term asc) — the rank key uses the ROUNDED score so any engine ranking
    * the same rounded values agrees.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // Persist: tf feeds BOTH the df aggregation and the scoring join —
    // without materialization Spark evaluates the explode+aggregate subtree
    // once per consumer (the dominant cost on a large corpus). persist()
    // rather than localCheckpoint(): lineage survives executor loss (a
    // checkpointed block lost to decommissioning fails the job outright),
    // and the shared InMemoryRelation gives the same single evaluation.
    // Release is the caller's (the returned frame is lazy); the harness
    // clears cache between queries.
    val tf = termFrequencies(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.select(col(idCol)).count().toDouble
    // NO broadcast hint: the IDF table is the full vocabulary — bounded
    // only by corpus size. Let AQE broadcast it when it measures small;
    // at 100 TB this is a shuffled equi-join on the term key (which the
    // tf side is already partitioned by from its aggregation).
    val idf = docFrequencies(tf)
      .withColumn("idf", log(lit(n) / col("df").cast("double")))
    val scored = tf.join(idf.select(col("term"), col("idf")), "term")
      .withColumn("tfidf", round(col("tf").cast("double") * col("idf"), 6))
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("id"), col("term"), col("tfidf"))
  }

  /** BM25 scores of every document against a literal bag-of-terms query:
    * `(id, score_micro)` where `score_micro` is the BM25 score in integer
    * micro-units (each per-term contribution rounded to 1e-6 half-up, THEN
    * summed — exact under any aggregation order).
    *
    * score(d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len_d/avglen)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — the standard Robertson/Okapi
    * form. Documents matching no query term are omitted.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val q = query.map(_.toLowerCase).distinct
    val tf = termFrequencies(docs, idCol, textCol)
    val lens = docs.select(col(idCol).as("id"),
      size(toks(col(textCol))).cast("double").as("len"))
    val n = docs.select(col(idCol)).count().toDouble
    // Integer token counts: the cross-doc sum is exact, so avglen is a
    // deterministic double on every engine.
    val avglen = lens.agg(sum(col("len"))).head().getDouble(0) / n
    // Persist: qTf feeds both its df aggregation and the scoring join
    // (same shared-subtree rule and same persist-over-checkpoint rationale
    // as tfidfTopK). The cached frame is tiny — only query-term rows.
    val qTf = tf.filter(col("term").isin(q: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idf = docFrequencies(qTf) // df of query terms only — tiny, broadcast
      .withColumn("idf",
        log(lit(1.0) + (lit(n) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
    qTf.join(broadcast(idf.select(col("term"), col("idf"))), "term")
      .join(lens, "id")
      .withColumn("contrib_micro",
        round(col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / lit(avglen)))
          * lit(1e6)).cast("long"))
      .groupBy(col("id"))
      .agg(sum(col("contrib_micro")).as("score_micro"))
  }
}
