package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** Margin-based parallel-pair mining over two embedding sets (Artetxe &
  * Schwenk 2019, "Margin-based Parallel Corpus Mining with Multilingual
  * Sentence Embeddings" — the LASER/CCMatrix recipe): for each source
  * vector, score its best target candidate by the RATIO margin
  *
  *   margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)
  *
  * where avgK is the mean cosine of the vector's k nearest candidates on
  * the other side. The margin normalizes away hubness — a vector whose
  * neighborhood is uniformly close scores no pair highly, while a true
  * translation pair stands out from both sides' neighborhoods — which is
  * why raw-cosine thresholds underperform it for bitext mining.
  *
  * Spark shape, and why it scales (the [[SemDedup]] discipline):
  *   - both sides assign to IVF cells via the codegen'd argmin
  *     ([[Similarity.ivfCell]]) and candidates come from the cell
  *     EQUI-join — never |X|·|Y|. Work is Σ|cellX|·|cellY|; corpus-derived
  *     k ([[SemDedup.deriveK]] over the union size) keeps it linear;
  *   - the fat-cell guard reuses [[SemDedup.saltedCells]]: content-hash
  *     sub-buckets bound one degenerate cell, and identical vectors stay
  *     co-bucketed, so planted/true duplicates are never split;
  *   - top-k statistics and best-match selection are ONE window each over
  *     the candidate frame (partitioned by source / target id), then two
  *     slim joins — no second pass over the corpora;
  *   - the method's known miss (a true pair split across a cell boundary)
  *     is the paper's own approximate-kNN trade; raise k-probe by lowering
  *     cell count, or accept the bounded miss, same contract as SemDeDup.
  *
  * Determinism: ties in both windows break on ascending id; `avgK` is a
  * k-bounded mean of doubles summed in window order.
  */
object BitextMining {

  /** Mined pairs (src_id, tgt_id, cosine, margin ≥ threshold): the best
    * target per source under the ratio margin, both-side k-NN averages
    * from the shared cell-candidate frame.
    */
  def minePairs(
      x: DataFrame,
      y: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      k: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxCellSize: Int = SemDedup.DefaultMaxCellSize): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // Cell assignment ONCE over the tagged union — the O(k·dim)-literal
    // argmin is the expensive codegen class here, and salting each side
    // separately would evaluate (and Janino-compile) it once per consumer
    // per side. One pass, one compile, one checkpoint; the fat-cell guard
    // then counts cells over the UNION, which is the right bound anyway
    // (candidate work per cell is |cellX|·|cellY|).
    val tagged = x.select(lit(0).as("__side"), col(idCol).as("id"),
        col(embCol).as("emb"))
      .unionByName(y.select(lit(1).as("__side"), col(idCol).as("id"),
        col(embCol).as("emb")))
    // __nrm rides the checkpoint: cosine(x, y) re-folds both norms per
    // candidate PAIR in its inline form; materializing sqrt(dot(e,e)) once
    // per row here leaves the |cellX|·|cellY| pair stage ONE fold per
    // candidate (same double, same division tree — bit-identical cosines;
    // the SemDedup.pairsFromCells hoist, applied to the two-sided join).
    val assigned = tagged.select(col("__side"), col("id"), col("emb"),
        Similarity.ivfCell(col("emb"), centroids).as("cell"),
        sqrt(ArrayOps.dot(col("emb"), col("emb"))).as("__nrm"))
      .localCheckpoint()
    val salted = SemDedup.saltedCells(assigned, maxCellSize)
    val xc = salted.filter(col("__side") === 0)
      .select(col("id").as("src_id"), col("emb").as("__xe"),
        col("__nrm").as("__xn"), col("cell"), col("sub"))
    val yc = salted.filter(col("__side") === 1)
      .select(col("id").as("tgt_id"), col("emb").as("__ye"),
        col("__nrm").as("__yn"), col("cell"), col("sub"))
    // Candidate pairs with exact cosine — materialized once; consumed by
    // both window statistics and the best-match selection.
    val cand = xc.join(yc, Seq("cell", "sub"))
      .select(col("src_id"), col("tgt_id"),
        (ArrayOps.dot(col("__xe"), col("__ye")) /
          (col("__xn") * col("__yn"))).as("cos"))
      .localCheckpoint()
    val wSrc = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id"))
    val wTgt = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos").desc, col("src_id"))
    // One window pass serves both the k-NN average and the best match
    // (rank 1 row) — materialized because both consumers read it.
    val srcTop = cand.withColumn("__r", row_number().over(wSrc))
      .filter(col("__r") <= k)
      .localCheckpoint()
    val srcAvg = srcTop.groupBy(col("src_id")).agg(avg(col("cos")).as("__asrc"))
    val tgtAvg = cand.withColumn("__r", row_number().over(wTgt))
      .filter(col("__r") <= k)
      .groupBy(col("tgt_id")).agg(avg(col("cos")).as("__atgt"))
    srcTop.filter(col("__r") === 1)
      .join(srcAvg, "src_id")
      .join(tgtAvg, "tgt_id")
      .withColumn("margin", col("cos") / ((col("__asrc") + col("__atgt")) / 2))
      .filter(col("margin") >= threshold)
      .select(col("src_id"), col("tgt_id"), col("cos").as("cosine"),
        col("margin"))
  }
}
