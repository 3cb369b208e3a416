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
  *     centroids, a pure map. [[semDedup]] computes it ONCE and
  *     `localCheckpoint`s the slim (id, emb, cell) projection, so the
  *     scan + O(k·dim)-per-row argmin is not re-run by the self-join's two
  *     sides and the ranking join (the materialized copy costs one write of
  *     the embeddings projection — the self-join's shuffle would have
  *     written comparable bytes anyway);
  *   - candidate pairs come from a self EQUI-join on the cell id — never
  *     all-pairs. Work is Σ|cell|²; k is the knob that bounds it. Derive it
  *     with [[deriveK]]: at a fixed target occupancy t, k = n/t keeps the
  *     pair work at n·t — LINEAR in corpus size (the paper's k ≈ √(n·c) is
  *     the same idea with t growing as √n; fixed t is the stricter bound);
  *   - a fat-cell guard: k-means makes no balance promise, and one
  *     degenerate cell (a boilerplate embedding attractor) would go
  *     quadratic alone. Cells beyond `maxCellSize` split into
  *     ceil(|cell|/maxCellSize) sub-buckets keyed by a CONTENT hash of the
  *     embedding (`xxhash64`), so byte-identical vectors always stay
  *     co-bucketed and exact duplicates are never missed; distinct
  *     near-dups split across sub-buckets of a fat cell are missed — the
  *     same bounded-miss trade the method already accepts at cluster
  *     boundaries, bought here for a hard O(maxCellSize²) per-bucket bound;
  *   - grouping near-dups into components and anti-joining the drop set
  *     reuses the lexical pipeline's [[Dedup.nearDupComponents]] /
  *     keep-rows discipline — frames involved are O(candidates), far
  *     smaller than the corpus, and the corpus itself is touched only by
  *     the final `left_anti` on ids.
  *
  * Known method property (inherent to SemDeDup, not this implementation):
  * a near-dup pair split across a cluster boundary is not compared and
  * survives. The paper accepts this miss rate; raising k trades more misses
  * for less work, lowering k the reverse. The fat-cell guard extends the
  * same contract to within-cell sub-buckets.
  */
object SemDedup {

  /** Default fat-cell guard: a cell at this size costs ~8M cosine pairs —
    * bounded seconds on one task — and real k-means cells at a sane k sit
    * far below it, so the guard only fires on degenerate skew.
    */
  val DefaultMaxCellSize: Int = 4096

  /** Corpus-derived cluster count: k = ⌈n / targetCellSize⌉, clamped.
    *
    * At fixed target occupancy t the within-cell pair work is
    * Σ|cell|² ≈ n·t — linear in n, so 100× the corpus means 100× the work,
    * not 10,000×. This is the scale-safe replacement for a caller-pinned
    * constant k (which at 100× data gives 100×-fat cells and quadratic
    * blowup).
    *
    * `kMax` defaults to 4096 because [[Similarity.ivfCell]] folds the
    * centroids in as codegen literals (cost and code size O(k·dim) per
    * row); past that, train with
    * [[Similarity.trainIvfCentroidsDistributed]] and assign through a
    * two-level quantizer instead of raising the clamp.
    */
  def deriveK(n: Long, targetCellSize: Int = 128,
      kMin: Int = 4, kMax: Int = 4096): Int = {
    require(targetCellSize > 0, s"targetCellSize must be positive: $targetCellSize")
    require(kMin >= 1 && kMax >= kMin, s"bad clamp [$kMin, $kMax]")
    val k = math.ceil(math.max(n, 0L).toDouble / targetCellSize)
    math.min(math.max(k, kMin.toDouble), kMax.toDouble).toInt
  }

  /** (id, emb, cell) projection with the stored cluster id. */
  private[llm] def withCell(df: DataFrame, centroids: Array[Array[Double]],
      idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(embCol).as("emb"),
      Similarity.ivfCell(col(embCol), centroids).as("cell"))

  /** The fat-cell guard: split any cell beyond `maxCellSize` members into
    * content-hash sub-buckets (see class doc). The per-cell counts frame is
    * k rows — broadcast, never shuffled against the corpus. Cells under the
    * cap get nsub = 1 → sub = 0, i.e. exactly the unguarded join key.
    */
  private[llm] def saltedCells(cells: DataFrame, maxCellSize: Int): DataFrame = {
    require(maxCellSize > 0, s"maxCellSize must be positive: $maxCellSize")
    val counts = cells.groupBy(col("cell")).agg(count(lit(1)).as("cell_n"))
    cells.join(broadcast(counts), "cell")
      .withColumn("sub",
        pmod(xxhash64(col("emb")),
          greatest(lit(1L), ceil(col("cell_n").cast("double") / maxCellSize)
            .cast("long"))).cast("int"))
      .drop("cell_n")
  }

  /** Within-(cell, sub-bucket) candidate pairs over a pre-assigned frame:
    * self equi-join (`id_a < id_b` halves the matches), exact cosine on the
    * co-bucketed candidates only.
    */
  private def pairsFromCells(cells: DataFrame, threshold: Double): DataFrame = {
    // Hoist each row's norm out of the pair loop: the inline
    // cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))) re-folds
    // both norms PER PAIR, and at target occupancy t each row joins ~t
    // partners — t× redundant fold work on the dominant stage (measured:
    // the pair-scoring job carried most of q_semdedup's corpus-scale
    // wall-clock). Each join side now folds n norms pre-shuffle (+8 bytes
    // a row) and the pair stage does ONE fold per candidate.
    // sqrt(dot(a,a)) is the same double computed per row or per pair and
    // the division tree is unchanged, so every cosine is bit-identical.
    val withNrm = cells.withColumn("__nrm",
      sqrt(ArrayOps.dot(col("emb"), col("emb"))))
    val a = withNrm.alias("a"); val b = withNrm.alias("b")
    a.join(b, col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (ArrayOps.dot(col("a.emb"), col("b.emb")) /
          (col("a.__nrm") * col("b.__nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Within-cluster semantic near-dup candidate pairs: self equi-join on
    * (cell id, fat-cell sub-bucket). Output: (id_a, id_b, cosine ≥
    * threshold). Standalone form — recomputes the cell assignment lazily;
    * [[semDedup]] materializes it once instead.
    */
  def cellPairs(
      df: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxCellSize: Int = DefaultMaxCellSize): DataFrame =
    pairsFromCells(
      saltedCells(withCell(df, centroids, idCol, embCol), maxCellSize),
      threshold)

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
      embCol: String = "embedding",
      maxCellSize: Int = DefaultMaxCellSize): DataFrame = {
    // Materialize the assignment once: consumed by the per-cell counts agg,
    // both self-join sides, and the ranking join — four otherwise-repeated
    // runs of the scan + O(k·dim) argmin.
    val cells = withCell(df, centroids, idCol, embCol).localCheckpoint()
    val salted = saltedCells(cells, maxCellSize)
    val pairs = pairsFromCells(salted, threshold)
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

  /** SSL-prototypes pruning (Sorscher et al. 2022, "Beyond neural scaling
    * laws"): drop the most PROTOTYPICAL `dropFraction` of each k-means
    * cell — the members closest to their centroid, i.e. the easy,
    * redundant examples — keeping the informative periphery. In the D4
    * recipe (Tirumala et al. 2023) this runs AFTER [[semDedup]]:
    * duplicates first, then prototypes ([[d4]] composes the two).
    *
    * Per cell, the `floor(dropFraction · |cell|)` members ranked first by
    * (centroid-cosine DESC, id ASC) are dropped — deterministic under
    * cosine ties, and a cell too small for its share (|cell| < 1/f)
    * drops nothing rather than rounding a member away.
    *
    * Shape at scale: cell assignment + centroid cosine are one codegen'd
    * map pass (k-row centroid frame broadcast); the ranking is ONE window
    * partitioned by cell — no pair work at all, unlike the dedup step, so
    * this prunes arbitrarily large corpora at shuffle-sort cost. The
    * window's per-cell sort is spill-backed; a degenerate fat cell costs
    * disk, not memory, and no guard is needed because nothing here is
    * quadratic.
    */
  def prunePrototypes(
      df: DataFrame,
      centroids: Array[Array[Double]],
      dropFraction: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(dropFraction >= 0.0 && dropFraction < 1.0,
      s"dropFraction must be in [0, 1): $dropFraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("ccos").desc, col("id"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    val drop = withCentroidCosine(withCell(df, centroids, idCol, embCol), centroids)
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(col("__rk") <= floor(col("__n") * lit(dropFraction)))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Cluster-capped sampling — anti-domination at embedding-cluster
    * granularity: keep at most `cap` documents per k-means cell,
    * best-first by `score` (ties to the lowest id). The semantic twin of
    * the per-registered-domain corpus cap (`q_url_domaincap`): a
    * topically-duplicated mega-cluster (mirror farms, template spam that
    * survives textual dedup) must not dominate the training mixture any
    * more than one domain may dominate a crawl.
    *
    * Scale shape: `row_number ≤ cap` over the cell partition — Spark
    * plans a WindowGroupLimit, so every partition keeps a bounded
    * per-cell top-k map-side and only survivors shuffle; cells is the
    * parallelism knob exactly as in the domain cap, and nothing about a
    * fat cell ever lands on one task unbounded.
    */
  def clusterCappedSample(
      df: DataFrame,
      centroids: Array[Array[Double]],
      cap: Int,
      score: Column,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    require(centroids.nonEmpty, "need a trained quantizer")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cell")).orderBy(score.desc, col(idCol))
    df.withColumn("__cell", Similarity.ivfCell(col(embCol), centroids))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__cell", "__rk")
  }

  /** D4 (Tirumala et al. 2023, "D4: Improving LLM Pretraining via Document
    * De-Duplication and Diversification"): [[semDedup]] then
    * [[prunePrototypes]] over the SAME clustering — remove semantic
    * near-duplicates, then thin the prototypical cores of what remains.
    */
  def d4(
      df: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      dropFraction: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxCellSize: Int = DefaultMaxCellSize): DataFrame =
    prunePrototypes(
      semDedup(df, centroids, threshold, idCol, embCol, maxCellSize),
      centroids, dropFraction, idCol, embCol)
}
