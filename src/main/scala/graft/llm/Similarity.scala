package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** Similarity search over an embedding column (`Array[Float]`): brute-force
  * cosine top-k as the correctness baseline, random-hyperplane LSH bucketing
  * as the scale path (candidates come from a groupBy/join on the bucket key —
  * no cartesian product).
  */
object Similarity {

  /** Cosine of each row's embedding against one literal query vector —
    * a broadcast-free map-only scan (the literal folds into codegen).
    */
  def cosineToQuery(emb: Column, query: Array[Double]): Column = {
    val q = array(query.map(lit(_)).toIndexedSeq: _*)
    ArrayOps.cosine(emb, q)
  }

  /** Brute-force top-k by cosine: one scan + a global top-k (Spark's
    * `orderBy.limit` runs per-partition top-k then merges k·p rows on the
    * driver — no full sort shuffle). O(n·d) work: the right baseline, and
    * the exact answer LSH variants are measured against.
    */
  def bruteForceTopK(
      df: DataFrame,
      query: Array[Double],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    df.select(col(idCol), cosineToQuery(col(embCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic random hyperplanes (driver-side, seeded). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit j = sign(v · h_j), packed into a
    * long. Collision probability 1 − θ/π per bit (Charikar 2002) — vectors
    * with high cosine land in the same bucket.
    */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val pl = array(p.map(lit(_)).toIndexedSeq: _*)
      when(ArrayOps.dot(emb, pl) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Precompute the LSH bucket as a stored column. At scale this is written
    * once (and the table bucketed/partitioned by it) so ANN queries prune
    * I/O instead of recomputing n·planes dot products per query.
    */
  def withLshBucket(
      df: DataFrame,
      planes: Array[Array[Double]],
      embCol: String = "embedding",
      bucketCol: String = "lsh_bucket"): DataFrame =
    df.withColumn(bucketCol, lshBucket(col(embCol), planes))

  /** The driver-side bucket of a query vector (bit j = sign(q · h_j)). */
  def queryBucket(query: Array[Double], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (p, j) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << j else 0L
    }.sum

  /** ANN top-k over a frame that already carries a [[withLshBucket]] column:
    * restrict the exact cosine scan to buckets within `probeHamming` of the
    * query's bucket (multi-probe LSH), then rank candidates by exact cosine.
    * With the bucket stored (and the table partitioned by it) the filter is
    * partition pruning, not a scan.
    */
  def annTopKBucketed(
      df: DataFrame,
      query: Array[Double],
      planes: Array[Array[Double]],
      k: Int,
      probeHamming: Int = 1,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      bucketCol: String = "lsh_bucket"): DataFrame = {
    val qBucket = queryBucket(query, planes)
    df.filter(bit_count(col(bucketCol).bitwiseXOR(lit(qBucket))) <= probeHamming)
      .select(col(idCol), cosineToQuery(col(embCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k computing the bucket on the fly (no stored column): correct
    * but pays an O(n·planes) pass — prefer [[annTopKBucketed]] over a
    * [[withLshBucket]]-prepared table at scale.
    */
  def annTopK(
      df: DataFrame,
      query: Array[Double],
      planes: Array[Array[Double]],
      k: Int,
      probeHamming: Int = 1,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    annTopKBucketed(withLshBucket(df, planes, embCol), query, planes, k,
      probeHamming, idCol, embCol)

  /** All-pairs near-duplicate candidates by embedding cosine: bucket join on
    * the LSH key (equi-join, shuffle O(n)), exact cosine on candidates only.
    */
  def cosineNearDupCandidates(
      df: DataFrame,
      planes: Array[Array[Double]],
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      lshBucket(col(embCol), planes).as("bucket"))
    val a = bucketed.alias("a"); val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ArrayOps.cosine(col("a.emb"), col("b.emb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
