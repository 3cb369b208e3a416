package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the shuffle-killer for selective joins at
  * 100 TB scale.
  *
  * A fact⋈dim join where the dim side keeps only a small fraction of fact
  * rows still shuffles EVERY fact row under sort-merge. Pruning the fact side
  * first with a Bloom filter of the dim keys cuts the shuffled volume to
  * (selectivity + fpp) of the input at the cost of one tiny aggregation on
  * the dim side. This is the same mechanism as Spark's AQE runtime filter
  * (`InjectRuntimeFilter`), exposed as an explicit operator so a pipeline can
  * apply it where the optimizer's heuristics decline (e.g. a pre-filtered
  * dim computed in the same job, or a filter reused across several queries).
  *
  * Mechanics: the filter is BUILT distributed — Catalyst's
  * `BloomFilterAggregate` over `xxhash64(key)` with map-side partial
  * aggregation, so only per-partition bitsets (not keys) reach the driver —
  * and APPLIED as a codegen'd `BloomFilterMightContain` against an embedded
  * literal bitset (~1.2 MB for 1M keys at 1% fpp; Spark broadcasts task
  * binaries, so executors pay the bitset once, not per task).
  *
  * Correctness contract: `prunedJoin` returns EXACTLY the plain inner
  * equi-join — Bloom filters have no false negatives, and the exact join
  * that follows removes the false positives. That identity is the oracle for
  * `q_join_bloom` and is pinned by JoinOpsSpec.
  */
object BloomPrune {

  /** Distributed Bloom-filter build over `dim`'s `key` column: returns the
    * serialized bitset, or None when `dim` is empty / all-null (no filter —
    * callers treat that as "prune everything", matching the empty join).
    */
  def buildFilter(dim: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    // Same sizing rule as guava/Spark BloomFilter.optimalNumOfBits.
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = dim.select(GraftColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Codegen'd membership probe of `key` against a built filter. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(new BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(key)))))

  /** `big ⋈ dim` on `bigKey = dimKey`, with the big side Bloom-pruned before
    * the join. Result is exactly the plain inner equi-join; the win is the
    * shuffle/scan volume on the big side. `expectedItems` should bound the
    * dim-side distinct key count (overestimating only wastes bits).
    */
  def prunedJoin(big: DataFrame, dim: DataFrame, bigKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    buildFilter(dim, dim(dimKey), expectedItems, fpp) match {
      case None => big.filter(lit(false)).join(dim, big(bigKey) === dim(dimKey))
      case Some(bf) =>
        big.filter(mightContain(bf, big(bigKey)))
          .join(dim, big(bigKey) === dim(dimKey))
    }

  /** Bloom semi-join: big-side rows whose key is (probably) in `dim`, then
    * exactly — the pruned probe feeds a left-semi join so output rows carry
    * only big-side columns and each at most once. Equals the plain
    * left-semi join.
    */
  def semiJoin(big: DataFrame, dim: DataFrame, bigKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    buildFilter(dim, dim(dimKey), expectedItems, fpp) match {
      case None => big.filter(lit(false))
      case Some(bf) =>
        big.filter(mightContain(bf, big(bigKey)))
          .join(dim, big(bigKey) === dim(dimKey), "left_semi")
    }
}
