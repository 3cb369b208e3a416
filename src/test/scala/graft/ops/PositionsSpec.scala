package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Positions.withPos must equal `row_number() OVER (PARTITION BY FILE_ID
  * ORDER BY ROWIDX) - 1` for every (file, order) layout — including bucket
  * boundaries, sparse/filtered ROWIDX values and constant FILE_ID (the case
  * whose plain-window form degenerates to a single partition).
  */
class PositionsSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("__exp",
      (row_number().over(Window.partitionBy(col("FILE_ID")).orderBy(col("ROWIDX"))) - 1)
        .cast("long"))

  private def check(rows: Seq[(String, Long)], bucketWidth: Long): Unit = {
    val df = rows.toDF("FILE_ID", "ROWIDX")
    val got = Positions.withPos(df, bucketWidth = bucketWidth)
    val joined = reference(got).collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("__pos") == r.getAs[Long]("__exp"),
        s"row $r: __pos != expected")
    }
    assert(got.columns.toSet == Set("FILE_ID", "ROWIDX", "__pos"))
  }

  test("matches per-file row_number on multi-file sparse indices") {
    val rows = for {
      f <- Seq("a", "b", "c")
      i <- 0L until 50L
      if (i + f.length) % 3 != 0 // sparse: filtered positions
    } yield (f, i * 7) // non-dense order values
    check(rows, bucketWidth = 16)
  }

  test("matches on constant FILE_ID across bucket boundaries") {
    check((0L until 200L).map(i => ("only", i)), bucketWidth = 32)
  }

  test("matches when a file is smaller than one bucket") {
    check(Seq(("x", 5L), ("x", 1L), ("y", 0L)), bucketWidth = 1024)
  }
}
