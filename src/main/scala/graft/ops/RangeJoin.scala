package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — points matched to `[lo, hi]` intervals
  * without the cartesian product a naive non-equi join plans.
  *
  * Spark turns `p.join(i, p("x") >= i("lo") && p("x") <= i("hi"))` into
  * BroadcastNestedLoopJoin (every point × every interval) — O(N·M) work that
  * is the canonical 100 TB scale-killer. The standard fix (used by interval
  * libraries on every engine) is bucketization: chop the domain into
  * fixed-width buckets, explode each interval onto the buckets it overlaps,
  * map each point to its single bucket, equi-join on bucket (+ any caller
  * equi keys), and re-check the exact predicate. Work becomes
  * O(N + M·span/width + |candidate pairs|), shuffled on the bucket key —
  * fully parallel, skew-handled by AQE like any other equi-join.
  *
  * `bucketWidth` trades explode factor (intervals spanning many buckets)
  * against candidate false positives (many intervals sharing a bucket);
  * a width near the median interval length is a good default.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row with
    * `lo <= pt <= hi` (and equality on `equiKeys`, present in both inputs).
    * `pt` and `lo`/`hi` must be numeric (cast timestamps to epoch first).
    * Output: all columns of `points`, then all columns of `intervals` minus
    * the equi keys. Exactly the rows of the naive non-equi inner join.
    */
  def pointInInterval(points: DataFrame, pt: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketWidth: Double, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points
      .withColumn("__pt", pt.cast("double"))
      .withColumn("__bkt", floor(col("__pt") / bucketWidth).cast("long"))
    // sequence() explodes an interval onto every bucket it overlaps
    // (floor(lo/w)..floor(hi/w)); degenerate hi<lo intervals get no buckets
    // and vanish, matching the non-equi join.
    val i = intervals
      .withColumn("__lo", lo.cast("double"))
      .withColumn("__hi", hi.cast("double"))
      .filter(col("__hi") >= col("__lo"))
      .withColumn("__bkt", explode(sequence(
        floor(col("__lo") / bucketWidth).cast("long"),
        floor(col("__hi") / bucketWidth).cast("long"))))
    p.join(i, equiKeys :+ "__bkt")
      .filter(col("__pt") >= col("__lo") && col("__pt") <= col("__hi"))
      .drop("__pt", "__bkt", "__lo", "__hi")
  }

  /** Interval×interval OVERLAP join: every `(a, b)` pair with
    * `a.lo <= b.hi && b.lo <= a.hi` (closed intervals; plus equality on
    * `equiKeys`). Same bucketization as [[pointInInterval]], both sides
    * exploded — and NO distinct to dedupe multi-bucket pairs: a pair is
    * emitted only at its canonical bucket, `floor(max(a.lo, b.lo)/width)`,
    * which overlapping intervals always share (max(lo) ≤ min(hi) lies in
    * both bucket ranges) — a pure filter where a dedupe would be a second
    * shuffle over the candidate set. Output: columns of `a`, then `b`
    * minus the equi keys; exactly the naive non-equi inner join's rows.
    */
  def intervalOverlap(a: DataFrame, alo: Column, ahi: Column,
      b: DataFrame, blo: Column, bhi: Column,
      bucketWidth: Double, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, lo: Column, hi: Column, p: String): DataFrame =
      df.withColumn(s"__${p}lo", lo.cast("double"))
        .withColumn(s"__${p}hi", hi.cast("double"))
        .filter(col(s"__${p}hi") >= col(s"__${p}lo"))
        .withColumn("__bkt", explode(sequence(
          floor(col(s"__${p}lo") / bucketWidth).cast("long"),
          floor(col(s"__${p}hi") / bucketWidth).cast("long"))))
    buckets(a, alo, ahi, "a").join(buckets(b, blo, bhi, "b"), equiKeys :+ "__bkt")
      .filter(col("__alo") <= col("__bhi") && col("__blo") <= col("__ahi"))
      .filter(col("__bkt") ===
        floor(greatest(col("__alo"), col("__blo")) / bucketWidth).cast("long"))
      .drop("__bkt", "__alo", "__ahi", "__blo", "__bhi")
  }
}
