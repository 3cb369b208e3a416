package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive-Bayes text classifier — the supervised companion to
  * the heuristic [[TextAnalysis.langId]] and the hashed-logistic
  * [[QualityModel]]: the fastText-style bag-of-words linear classifier a
  * pipeline trains on labeled seed data (language ID from labeled
  * corpora, domain routing, quality tiers) and applies corpus-wide.
  *
  * Everything is relational — the model is a (label, word, weight)
  * DataFrame, not a driver artifact, so vocabulary size is unbounded
  * (the [[TextAnalysis.bigramBackoffScoreAgainst]] discipline: count
  * tables are token-keyed aggregates with map-side partials, scoring is
  * an equi-join back onto the token stream, nothing lands on the
  * driver).
  *
  * Exactness: every log term is an integer micro-nat computed by the
  * fixed-point integer log ([[graft.functions.FixedPointLog]] — same
  * steps in both engines, so no engine-native ln() reaches a compared
  * weight; PLANS.md finding 37) BEFORE any cross-row sum (the bm25/LM
  * discipline), so per-doc scores are exact integer sums —
  * order-independent, bit-reproducible, and the DuckDB oracle replays
  * them. Add-1 (Laplace) smoothing over the train vocabulary;
  * out-of-vocabulary tokens at apply time score the per-class unseen
  * weight ln(1/(total_c + V)).
  */
object NaiveBayes {

  /** Trained model, all lazy DataFrames:
    * `model`  — (label, __w, __wt) dense over train-vocab × classes;
    * `classes`— (label, __prior, __unseen) one row per class (tiny:
    *            broadcast at apply);
    * `vocab`  — (__w) the train vocabulary (the OOV membership probe).
    */
  final case class NbModel(model: DataFrame, classes: DataFrame, vocab: DataFrame)

  /** Fit on labeled text. Two token-keyed aggregations over the train
    * corpus; the dense (vocab × classes) weight table materializes the
    * smoothed log-probabilities.
    *
    * The sufficient statistic (the (label, word, count) table) and the
    * multi-consumer frames (vocab, classes) are `localCheckpoint`ed —
    * the LM count-table discipline, PLANS.md finding 14: classify
    * consumes them from several branches (in-vocab join, OOV anti-join,
    * prior join), and unmaterialized the whole training subtree
    * re-evaluates per consumer (measured: 28 driver jobs vs 15). The
    * dense weight table itself stays lazy — it has one consumer and
    * derives only from checkpointed frames.
    */
  def trainModel(train: DataFrame, labelCol: String, textCol: String): NbModel = {
    // ONE corpus pass reduces training text to its sufficient statistic —
    // the (label, word, count) table; every other frame derives from it,
    // so checkpointing it keeps the corpus scan out of all downstream
    // branches (the doc-count scans on `train` are column-pruned counts).
    val cw = train.select(col(labelCol).as("__l"),
        explode(TextAnalysis.tokensWs(lower(col(textCol)))).as("__w"))
      .groupBy(col("__l"), col("__w")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val ct = cw.groupBy(col("__l")).agg(sum(col("__c")).as("__t"))
    val vocab = cw.select(col("__w")).distinct().localCheckpoint()
    val nv = vocab.agg(count(lit(1)).as("__v"))
    val nd = train.groupBy(col(labelCol).as("__l")).agg(count(lit(1)).as("__nd"))
    val ntot = train.agg(count(lit(1)).as("__n"))
    import graft.functions.FixedPointLog.{lnNanoCol, microOfNano, withLnNano}
    val classes = ct.join(nd, "__l")
      .crossJoin(broadcast(ntot)).crossJoin(broadcast(nv))
      .select(col("__l"),
        microOfNano(lnNanoCol(col("__nd"), col("__n"))).as("__prior"),
        microOfNano(lnNanoCol(lit(1L), col("__t") + col("__v")))
          .as("__unseen"),
        col("__t"))
      .localCheckpoint()
    // The per-(class, word) weight log is one codegen'd kernel call per
    // model row (vocab×classes — PLANS.md finding 45).
    val model = withLnNano(
        vocab.crossJoin(classes.select(col("__l"), col("__t")))
          .join(cw, Seq("__l", "__w"), "left")
          .crossJoin(broadcast(nv)),
        coalesce(col("__c"), lit(0L)) + lit(1L), col("__t") + col("__v"),
        "__wtn")
      .select(col("__l"), col("__w"), microOfNano(col("__wtn")).as("__wt"))
    NbModel(model,
      classes.select(col("__l"), col("__prior"), col("__unseen")), vocab)
  }

  /** Classify: per doc, argmax over classes of
    * prior + Σ_tokens weight(token, class) — exact integer micro-nat
    * sums; ties break to the smallest label (deterministic, both
    * engines). Returns (idCol, pred, score_micro). An all-whitespace
    * document tokenizes to one empty-string token (the [[TextAnalysis
    * .tokensWs]] / DuckDB string_split_regex shared contract), so EVERY
    * document gets a prediction — an empty doc scores prior + unseen.
    *
    * Shape at scale: in-vocab tokens equi-join the weight table on the
    * token (C rows per token — C is the class count, a small constant);
    * OOV tokens cross the broadcast C-row class frame. One (doc, class)
    * aggregation, one per-doc window for the argmax.
    */
  def classify(df: DataFrame, idCol: String, textCol: String, m: NbModel): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokensWs(lower(col(textCol)))).as("__w"))
    val inv = toks.join(m.model, "__w")
      .select(col(idCol), col("__l"), col("__wt"))
    val oov = toks.join(m.vocab, Seq("__w"), "left_anti")
      .crossJoin(broadcast(m.classes))
      .select(col(idCol), col("__l"), col("__unseen").as("__wt"))
    val scores = inv.union(oov)
      .groupBy(col(idCol), col("__l"))
      .agg(sum(col("__wt")).as("__s"))
      .join(broadcast(m.classes.select(col("__l"), col("__prior"))), "__l")
      .select(col(idCol), col("__l"),
        (col("__s") + col("__prior")).as("score_micro"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("__l").asc)
    scores.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__l").as("pred"), col("score_micro"))
  }
}
