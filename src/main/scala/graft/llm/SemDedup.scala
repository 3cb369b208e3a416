package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): k-means-cluster the embeddings, compare
  * pairs only WITHIN a cluster, and for each group of semantic near-dups
  * keep the single member least similar to its cluster centroid (the
  * "outlier" — the paper's choice, maximizing retained diversity).
  *
  * This catches what the lexical family (exact sha2, MinHash, SimHash,
  * n-gram Jaccard) cannot: paraphrases, translations-of-boilerplate, and
  * templated rewrites whose token overlap is low but whose meaning — and
  * training value — is duplicated.
  *
  * Spark shape, and why it scales:
  *   - the cluster assignment is the stored-IVF-cell machinery
  *     ([[Similarity.withIvfCell]]): a codegen'd argmin over k literal
  *     centroids, a pure map — write the cell once, partition by it, and
  *     the candidate join becomes co-located;
  *   - candidate pairs come from a self EQUI-join on the cell id — never
  *     all-pairs. Work is Σ|cell|²; k is the knob that bounds it (the paper
  *     uses k ≈ √n·c; at 100 TB you raise k, not executor memory);
  *   - grouping near-dups into components and anti-joining the drop set
  *     reuses the lexical pipeline's [[Dedup.nearDupComponents]] /
  *     keep-rows discipline — frames involved are O(candidates), far
  *     smaller than the corpus, and the corpus itself is touched only by
  *     the final `left_anti` on ids.
  *
  * Known method property (inherent to SemDeDup, not this implementation):
  * a near-dup pair split across a cluster boundary is not compared and
  * survives. The paper accepts this miss rate; raising k trades more misses
  * for less work, lowering k the reverse.
  */
object SemDedup {

  /** (id, emb, cell) projection with the stored cluster id. */
  private def withCell(df: DataFrame, centroids: Array[Array[Double]],
      idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(embCol).as("emb"),
      Similarity.ivfCell(col(embCol), centroids).as("cell"))

  /** Within-cluster semantic near-dup candidate pairs: self equi-join on
    * the cell id (`id_a < id_b` halves the matches), exact cosine on the
    * co-clustered candidates only. Output: (id_a, id_b, cosine ≥ threshold).
    */
  def cellPairs(
      df: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val cells = withCell(df, centroids, idCol, embCol)
    val a = cells.alias("a"); val b = cells.alias("b")
    a.join(b, col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ArrayOps.cosine(col("a.emb"), col("b.emb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Cosine of each row's embedding to its OWN cluster centroid — the
    * paper's keep-rule ranking. The k-row centroid frame broadcasts; the
    * join key is the already-stored cell id.
    */
  private def withCentroidCosine(cells: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val cframe = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "cvec")
    cells.join(broadcast(cframe), "cell")
      .withColumn("ccos", ArrayOps.cosine(col("emb"), col("cvec")))
      .drop("cvec")
  }

  /** The keep-rows step: drop every member of a semantic-dup component
    * except the one LEAST similar to its cluster centroid (ties by lowest
    * id, so identical vectors resolve deterministically). Rows with no
    * qualifying pair pass through untouched; only the (small) drop-id set
    * is shipped into the anti-join against the corpus.
    */
  def semDedup(
      df: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val cells = withCell(df, centroids, idCol, embCol)
    val pairs = cellPairs(df, centroids, threshold, idCol, embCol)
    val comps = Dedup.nearDupComponents(pairs) // (id, comp)
    // O(candidate nodes) frame with two consumers (representative pick +
    // drop join) — materialized so the cell-join subtree runs once.
    val ranked = withCentroidCosine(cells.join(comps, "id"), centroids)
      .localCheckpoint()
    val reps = ranked.groupBy(col("comp"))
      .agg(min_by(col("id"), struct(col("ccos"), col("id"))).as("rep"))
    val drop = ranked.join(reps, "comp")
      .filter(col("id") =!= col("rep"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }
}
