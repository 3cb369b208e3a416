package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout clustering — the
  * data-skipping layout for queries that filter on TWO columns at once
  * (Delta/Iceberg `OPTIMIZE ZORDER BY` shape; Morton 1966).
  *
  * A single-column sort ([[LayoutWriter.writeGloballySorted]]) prunes
  * range filters on THAT column only; a 2-D box filter on a
  * single-sorted layout still scans every file of the matching x-range
  * regardless of y. Interleaving the bits of both (rank-bucketized)
  * dimensions makes file locality track 2-D proximity: a box touching
  * 1/16 of the value grid touches ~1/16 of the z-bucket directories.
  *
  * Shape: values → fixed-width rank buckets (integer arithmetic off the
  * corpus min/max — deterministic, SQL-replayable) → bit-interleaved
  * z-value → the top `bucketBits` bits name the partition directory.
  * Everything is `functions._` Column arithmetic inside one codegen'd
  * projection — no kernel needed, and the DuckDB oracle replays the
  * exact integers. Directory pruning happens at PLAN time: the reader
  * turns a 2-D box into the list of intersecting z-buckets driver-side
  * (O(grid cells) enumeration over the sub-grid — fine for the ≤2¹⁶
  * cells a directory layout wants; the BIGMIN z-range decomposition
  * exists for finer grids) and pushes `zb IN (…)` into the scan.
  *
  * At 100 TB: one shuffle to cluster (repartition on zb), then every
  * recurring box query reads only intersecting directories, and parquet
  * row-group min/max stats prune further because rows are z-sorted
  * WITHIN each directory.
  */
object ZOrderLayout {

  /** Layout metadata the reader needs (the write-side min/max that fix
    * the bucket grid). A production deployment persists this next to the
    * data; here it returns to the caller, and [[bucketsForBox]] consumes
    * it.
    */
  final case class ZMeta(minX: Long, maxX: Long, minY: Long, maxY: Long,
      bits: Int, bucketBits: Int)

  /** Exact integer division for non-negative `a`: Spark's Column `/` is
    * DOUBLE division, so divide out the remainder first — a double ratio
    * of two exact integers that IS an integer (< 2^53) is IEEE-exact.
    */
  private def idiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Fixed-width rank bucket of `v` in [0, 2^bits): integer arithmetic
    * only — `least` guards the max value landing exactly on 2^bits.
    */
  def bucketize(v: Column, minV: Long, maxV: Long, bits: Int): Column =
    least(lit((1L << bits) - 1),
      idiv((v.cast("long") - minV) * (1L << bits), maxV - minV + 1L))

  private def bucketizeL(v: Long, minV: Long, maxV: Long, bits: Int): Long =
    math.min((1L << bits) - 1, ((v - minV) * (1L << bits)) / (maxV - minV + 1L))

  /** Morton interleave of two bucket ids: x on even bit positions, y on
    * odd. Plain shift/mask Column arithmetic — codegen'd, oracle-exact.
    */
  def zValue(bx: Column, by: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1,16]")
    (0 until bits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(by, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  private def zValueL(bx: Long, by: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((bx >> i) & 1L) << (2 * i)
      z |= ((by >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Write `df` z-order-clustered on (`xCol`, `yCol`): one directory per
    * z-bucket (top `bucketBits` bits of the 2·bits-bit z-value), rows
    * z-sorted within each directory. Returns the grid metadata.
    *
    * The z-value rides along as a data column (`__z`) — it IS the layout
    * artifact (row-group stats on it are what make the within-directory
    * sort prune).
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int = 4, bucketBits: Int = 4): ZMeta = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      "bucketBits must be in [1, 2*bits]")
    val mm = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    require(!mm.isNullAt(0), s"cannot z-order an empty frame: $path")
    val meta = ZMeta(mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3),
      bits, bucketBits)
    val z = zValue(
      bucketize(col(xCol), meta.minX, meta.maxX, bits),
      bucketize(col(yCol), meta.minY, meta.maxY, bits), bits)
    df.withColumn("__z", z)
      .withColumn("zb", shiftright(col("__z"), 2 * bits - bucketBits))
      .repartition(col("zb"))
      .sortWithinPartitions(col("zb"), col("__z"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("zb")
      .parquet(path)
    meta
  }

  /** The z-bucket directories a 2-D box can touch: bucketize the box
    * corners (bucketize is monotone, so the box maps to a bucket-space
    * rectangle), enumerate the sub-grid, project each cell to its
    * directory. Driver-side O(sub-grid) — the plan-time pruning list.
    */
  def bucketsForBox(meta: ZMeta, x1: Long, x2: Long, y1: Long, y2: Long): Seq[Long] = {
    require(x1 <= x2 && y1 <= y2, "degenerate box")
    val shift = 2 * meta.bits - meta.bucketBits
    val bx1 = bucketizeL(math.max(x1, meta.minX), meta.minX, meta.maxX, meta.bits)
    val bx2 = bucketizeL(math.min(x2, meta.maxX), meta.minX, meta.maxX, meta.bits)
    val by1 = bucketizeL(math.max(y1, meta.minY), meta.minY, meta.maxY, meta.bits)
    val by2 = bucketizeL(math.min(y2, meta.maxY), meta.minY, meta.maxY, meta.bits)
    (for {
      bx <- bx1 to bx2
      by <- by1 to by2
    } yield zValueL(bx, by, meta.bits) >> shift).distinct.sorted
  }

  /** Read the box back through the pruned layout: `zb IN (buckets)` is a
    * PLAN-time partition-directory filter (only intersecting directories
    * are listed/scanned), the exact box predicate keeps correctness.
    */
  def readBox(spark: SparkSession, path: String, meta: ZMeta,
      xCol: String, yCol: String,
      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    val buckets = bucketsForBox(meta, x1, x2, y1, y2)
    spark.read.parquet(path)
      .filter(col("zb").cast("long").isin(buckets: _*))
      .filter(col(xCol).between(x1, x2) && col(yCol).between(y1, y2))
  }
}
