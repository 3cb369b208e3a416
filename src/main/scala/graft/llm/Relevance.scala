package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring — TF-IDF and BM25 — as distributed Spark plans.
  *
  * Shape at scale: ONE fully-lazy plan per score — no driver-side actions
  * and no persisted state. TF-IDF's document frequencies ride the term key
  * as a count-over-window on the tf frame (same shuffle key, and the same
  * skew profile, as the aggregate+join it replaces — but no duplicate
  * evaluation of the explode subtree, hence nothing to cache and nothing
  * for a library consumer to unpersist; a hot term's group is buffered by
  * one WindowExec task — spillable, and inherent to keying on term).
  * BM25's df is a separate ≤|query|-row aggregate broadcast back in, so
  * the query-term tf frame never shuffles on the term key at all.
  * Corpus-level scalars (N, total token count) are
  * a one-row aggregate broadcast-crossJoined into the plan, so they ride
  * the final job's broadcast machinery instead of costing separate
  * collect() round-trips (cold-JVM scheduler+codegen latency per action is
  * what the round-6 driver bench measured on these queries). Per-doc TOP-N
  * terms use row_number (no global sort). Nothing in the plan materializes
  * a vocabulary on the driver.
  *
  * Exactness for the oracle: cross-row sums are kept in INTEGER domain —
  * per-term scores are rounded to micro-units (×1e6, half-up) BEFORE the
  * per-doc sum, so partial-aggregation order cannot move the result (the
  * QueryUtil.round6 discipline, applied to sums). The in-plan scalars are
  * integer counts, so n / avglen are bit-identical to the driver-computed
  * doubles they replace.
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

  /** One-row `(n, …)` corpus-count frame for broadcast into a scoring plan.
    * Counts are integers, so any double derived from them downstream is
    * deterministic across engines.
    */
  private def corpusN(docs: DataFrame, idCol: String): DataFrame =
    docs.select(col(idCol)).agg(count(lit(1)).as("__n"))

  /** Top-`k` TF-IDF terms per document: `(id, term, tfidf_micro)` with
    * `tfidf_micro = micro(tf · ln(N / df))` — the log is the fixed-point
    * integer kernel ([[graft.functions.FixedPointLog.lnNanoWideCol]]; the
    * N/df ratio reaches N, far past the narrow (0,2] domain) scaled by the
    * integer tf in nano-nats, THEN rounded to micro half-up, so both
    * engines produce the identical integer and the per-doc rank key cannot
    * sit on an engine-dependent rounding boundary (finding 37). Ranked per
    * doc by (tfidf_micro desc, term asc).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import graft.functions.FixedPointLog.{microOfNano, withLnNanoWide}
    val tf = termFrequencies(docs, idCol, textCol)
    // df as count-over-window on the term key: one evaluation of the
    // explode+aggregate subtree (nothing to persist), one shuffle on term —
    // exactly the shuffle the former df-aggregate+join pair performed, with
    // the same hot-term skew profile (a stopword's rows land in one
    // partition either way; counting them is O(partition), no driver state).
    val scored = withLnNanoWide(
        tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
          .crossJoin(broadcast(corpusN(docs, idCol))),
        col("__n"), col("df"), "__lnnd")
      .withColumn("tfidf_micro", microOfNano(col("tf") * col("__lnnd")))
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf_micro").desc, col("term"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("id"), col("term"), col("tfidf_micro"))
  }

  /** BM25 scores of every document against a literal bag-of-terms query:
    * `(id, score_micro)` where `score_micro` is the BM25 score in integer
    * micro-units (each per-term contribution rounded to 1e-6 half-up, THEN
    * summed — exact under any aggregation order).
    *
    * score(d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len_d/avglen)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — the standard Robertson/Okapi
    * form. Documents matching no query term are omitted.
    *
    * Exactness: k1 and b are rationals (defaults 6/5 and 3/4 — the classic
    * 1.2/0.75), which makes the whole saturation factor one integer
    * fraction; idf is `micro(ln((2N+2)/(2df+1)))` through the fixed-point
    * wide log (the algebraic collapse of the Robertson form — the ratio
    * reaches 2N). Each contribution is `round(idf_micro·N/D)` in
    * DECIMAL(38,0) integer cross-multiplication (HUGEINT in the oracle), so
    * no engine-native ln/division-of-doubles reaches a compared value
    * (finding 37). The micro-quantization of idf BEFORE the saturation
    * product costs < 1e-6·2.2 per contribution — far below ranking grain.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: Seq[String],
      k1Num: Long = 6L, k1Den: Long = 5L,
      bNum: Long = 3L, bDen: Long = 4L): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k1Num >= 0 && k1Den > 0, s"k1 must be a nonneg rational: $k1Num/$k1Den")
    require(bNum >= 0 && bDen > 0 && bNum <= bDen,
      s"b must be a rational in [0, 1]: $bNum/$bDen")
    import graft.functions.FixedPointLog.{idiv, microOfNano, withLnNanoWide}
    val q = query.map(_.toLowerCase).distinct
    // Query-term tf only: the isin filter runs BELOW the (id, term)
    // aggregation shuffle, so non-query tokens never leave the map side.
    val qTf = termFrequencies(docs, idCol, textCol)
      .filter(col("term").isin(q: _*))
    val lens = docs.select(col(idCol).as("id"),
      size(toks(col(textCol))).cast("long").as("len"))
    // Corpus scalars in ONE lazy one-row aggregate: N and the total token
    // count, kept as exact integers for the cross-multiplied saturation.
    val stats = docs.select(size(toks(col(textCol))).as("len"))
      .agg(count(lit(1)).as("__n"),
        sum(col("len")).cast("long").as("__sumlen"))
    // df of the (≤|query|) query terms, computed straight from the corpus
    // as its own tiny aggregate: the filter leaves ≤|query| distinct keys,
    // partial map-side counts combine before the exchange, so a stopword
    // query term never concentrates its rows in one task (a
    // count-over-window on qTf would buffer the whole term group in a
    // single WindowExec task — the 100 TB hotspot ADVICE r7 flagged — and
    // deriving df FROM qTf would either re-evaluate its aggregation or
    // need the persist VERDICT r6 flagged). Tokenization runs once more
    // here, but it is a pure codegen'd map — linear and parallel.
    val dfs = docs.select(
        explode(filter(array_distinct(toks(col(textCol))), t => t.isin(q: _*))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // 1 + (N−df+0.5)/(df+0.5) = (2N+2)/(2df+1): one wide fixed-point log.
    // Saturation as one integer fraction (num/den scaled by k1Den·bDen·
    // sumlen), contribution = round-half-up(idf_micro·num/den) in
    // DECIMAL(38,0) — ≤ ~10²⁶ at 100 TB corpus sizes, well inside 38
    // digits.
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    withLnNanoWide(
        qTf.join(broadcast(dfs), "term")
          .join(lens, "id")
          .crossJoin(broadcast(stats)),
        lit(2L) * col("__n") + lit(2L), lit(2L) * col("df") + lit(1L),
        "__idfln")
      .withColumn("__idfm", microOfNano(col("__idfln")))
      .withColumn("__num",
        dec(col("tf")) * lit((k1Num + k1Den) * bDen) * dec(col("__sumlen")))
      .withColumn("__den",
        dec(col("tf")) * lit(k1Den * bDen) * dec(col("__sumlen"))
          + lit(k1Num * (bDen - bNum)) * dec(col("__sumlen"))
          + lit(k1Num * bNum) * dec(col("len")) * dec(col("__n")))
      .withColumn("contrib_micro",
        idiv(lit(2L) * col("__idfm") * col("__num") + col("__den"),
          lit(2L) * col("__den")))
      .groupBy(col("id"))
      .agg(sum(col("contrib_micro")).as("score_micro"))
  }

  /** The [[toks]] tokenizer, published for judgment fixtures that must use
    * the EXACT relevance tokenization (membership tests etc.).
    */
  def tokens(text: Column): Column = toks(text)

  /** Ranking-quality metrics of a retrieval run against relevance
    * judgments — the eval harness behind retrieval / RAG training-data
    * work: recall@k, precision@k, MRR and nDCG@k per query.
    *
    * Inputs: `ranked` = (query_id, id, rank) with rank 1-based;
    * `judgments` = (query_id, id) relevant pairs (assumed distinct). Every
    * JUDGED query gets a result row — a ranker that returned nothing for a
    * query scores 0, it does not vanish from the report.
    *
    * Exactness (the integer micro-unit discipline): the nDCG gains
    * `round(1e6 / log2(rank+1))` for ranks 1..k are computed ONCE on the
    * JVM ([[dcgGainsMicro]]) and embedded as a literal lookup array in
    * BOTH engines' plans — no engine-native log2 reaches a compared value
    * (finding 37), and cross-row sums are integer-exact under any
    * aggregation order; recall/precision/MRR/nDCG ratios are exact integer
    * divisions (the `(a − a mod b)/b` Column idiom, IEEE-exact < 2⁵³).
    *
    * Shape at scale: the ranked frame is top-k per query (k rows/query by
    * construction), judgments join on (query_id, id), and every aggregate
    * is per-query with map-side combine — nothing buffers a query group.
    */
  /** Exact AUC of a scorer against binary labels — the Mann-Whitney
    * rank-sum form with full tie handling, entirely in integers: group
    * rows by (integer) score, give every member of a tie group twice its
    * AVERAGE ascending rank (`2·cumBefore + cnt + 1` — an integer even
    * when the average is half-integral), and
    *
    *   auc_micro = (R2_pos − n_pos·(n_pos+1)) · 10⁶ div (2·n_pos·n_neg)
    *
    * over DECIMAL(38,0) (rank sums reach n² long before 2⁶³ at corpus
    * scale). Scores must be integral (the round-6→micro lift upstream
    * ops use) — that is what makes tie groups engine-independent.
    *
    * Shape: the rank window runs over the DISTINCT-SCORE aggregate, not
    * the rows — micro scores bound it at ~10⁶ groups regardless of
    * corpus size — and the final ratio is a one-row reduce.
    * Output: one row `(n_pos, n_neg, auc_micro)`.
    */
  def aucMicro(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col(labelCol).cast("long")).as("__pos"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("__before", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__rank2", col("__before") * 2 + col("__cnt") + 1)
    ranked.agg(
        sum(col("__pos")).as("n_pos"),
        sum(col("__cnt") - col("__pos")).as("n_neg"),
        sum(col("__pos") * col("__rank2")).as("__r2pos"))
      .select(col("n_pos"), col("n_neg"),
        // AUC is undefined with a single label class — fail loudly rather
        // than emit a silent null a downstream `auc_micro >= thr` gate
        // would pass or fail by null semantics. (The registered oracle,
        // q_text_qmodel_auc, mirrors this guard with a DuckDB error()
        // CASE so both engines agree on the failure mode too.)
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("CAST((CAST(__r2pos AS DECIMAL(38,0)) - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) " +
            "* 1000000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
          .otherwise(raise_error(lit(
            "aucMicro: both label classes required (AUC is undefined with a single class)")))
          .as("auc_micro"))
  }

  /** nDCG gain table `round(1e6/log2(r+1))` for r = 1..k — computed ONCE
    * on the JVM and embedded as literals in both engines' plans, the
    * shared-lookup-table discipline of finding 37. */
  def dcgGainsMicro(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  def rankingMetrics(ranked: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    def exactDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val gains = dcgGainsMicro(k)
    def gainOf(rank: Column): Column =
      element_at(typedLit(gains), rank.cast("int"))
    val rel = judgments.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hit = ranked.filter(col("rank") <= k)
      .join(judgments, Seq("query_id", "id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits"), min(col("rank")).as("__fr"),
        sum(gainOf(col("rank"))).as("__dcg"))
    // Ideal DCG: the cumulative-gain table, also a JVM literal.
    val idcg = element_at(typedLit(gains.scanLeft(0L)(_ + _).tail),
      least(col("n_rel"), lit(k.toLong)).cast("int"))
    rel.join(hit, Seq("query_id"), "left")
      .na.fill(0L, Seq("hits", "__dcg"))
      .withColumn("recall_micro", exactDiv(col("hits") * 1000000L, col("n_rel")))
      .withColumn("precision_micro", exactDiv(col("hits") * 1000000L, lit(k.toLong)))
      .withColumn("mrr_micro",
        when(col("__fr").isNull, 0L)
          .otherwise(exactDiv(lit(1000000L), col("__fr"))))
      .withColumn("__idcg", idcg)
      .withColumn("ndcg_micro",
        when(col("__idcg") > 0L, exactDiv(col("__dcg") * 1000000L, col("__idcg")))
          .otherwise(lit(0L)))
      .select(col("query_id"), col("n_rel"), col("hits"), col("recall_micro"),
        col("precision_micro"), col("mrr_micro"), col("ndcg_micro"))
  }
}
