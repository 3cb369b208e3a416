package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("zorder").toString

  test("bucket list is COMPLETE: every box row's directory is listed") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1L)
    val df = (0 until 2000).map(_ =>
      (rnd.nextInt(977).toLong + 10, rnd.nextInt(313).toLong + 5, 1L))
      .toDF("x", "y", "v")
    val out = tmp() + "/t"
    val meta = ZOrderLayout.writeZOrdered(df, out, "x", "y", bits = 4, bucketBits = 4)
    // Several boxes, incl. degenerate-thin and full-range.
    val boxes = Seq((10L, 200L, 5L, 317L), (500L, 501L, 100L, 300L),
      (10L, 986L, 5L, 317L), (986L, 986L, 317L, 317L))
    boxes.foreach { case (x1, x2, y1, y2) =>
      val bl = ZOrderLayout.bucketsForBox(meta, x1, x2, y1, y2).toSet
      val inBox = s.read.parquet(out)
        .filter(col("x").between(x1, x2) && col("y").between(y1, y2))
        .select(col("zb").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(inBox.subsetOf(bl), s"box=($x1,$x2,$y1,$y2) missing=${inBox.diff(bl)}")
      // And readBox returns exactly the plain-filter rows.
      val n1 = ZOrderLayout.readBox(s, out, meta, "x", "y", x1, x2, y1, y2).count()
      val n2 = s.read.parquet(out)
        .filter(col("x").between(x1, x2) && col("y").between(y1, y2)).count()
      assert(n1 === n2)
    }
  }

  test("a small box prunes most directories; a full box lists all present") {
    val s = spark
    import s.implicits._
    val df = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y, 1L))
      .toDF("x", "y", "v")
    val out = tmp() + "/grid"
    val meta = ZOrderLayout.writeZOrdered(df, out, "x", "y", bits = 4, bucketBits = 4)
    // Quarter-quarter corner box → 2 bucket-bits of x and y each halve:
    // 16 buckets total, the corner box intersects exactly 1.
    val bl = ZOrderLayout.bucketsForBox(meta, 0, 15, 0, 15)
    assert(bl.size === 1)
    val all = ZOrderLayout.bucketsForBox(meta, 0, 63, 0, 63)
    assert(all.size === 16)
    // Physical proof: the pruned read touches only the listed directories.
    val files = ZOrderLayout.readBox(s, out, meta, "x", "y", 0, 15, 0, 15)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains(s"zb=${bl.head}")))
  }

  test("rows are z-sorted within each directory (row-group clustering)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val df = (0 until 3000).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong, 1L))
      .toDF("x", "y", "v")
    val out = tmp() + "/srt"
    ZOrderLayout.writeZOrdered(df, out, "x", "y", bits = 4, bucketBits = 2)
    val perFile = s.read.parquet(out)
      .select(input_file_name().as("f"), col("__z"))
      .groupBy(col("f"))
      .agg(collect_list(col("__z")).as("zs"))
      .collect()
    perFile.foreach { r =>
      val zs = r.getSeq[Long](1)
      assert(zs === zs.sorted, s"unsorted z in ${r.getString(0)}")
    }
  }

  test("bucketize edges: max value stays in the top bucket; constant column") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 5L), (1023L, 5L), (512L, 5L)).toDF("x", "y")
    val out = tmp() + "/edge"
    val meta = ZOrderLayout.writeZOrdered(df, out, "x", "y", bits = 4, bucketBits = 4)
    assert(meta.minY === 5L && meta.maxY === 5L) // constant y: range 1, all bucket 0
    val zb = s.read.parquet(out).select(col("x"), col("zb").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // y bucket 0 everywhere → zb carries only x's top bits (even z slots).
    assert(zb(0L) === 0L)
    assert(zb(1023L) === ZOrderLayout.bucketsForBox(meta, 1023, 1023, 5, 5).head)
  }

  test("empty frame fails loudly") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[(Long, Long)].toDF("x", "y")
    intercept[IllegalArgumentException](
      ZOrderLayout.writeZOrdered(df, tmp() + "/e", "x", "y"))
  }
}
