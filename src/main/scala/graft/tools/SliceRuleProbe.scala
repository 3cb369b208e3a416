package graft.tools

import java.io.FileOutputStream
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.sdfits.SdfitsFormat
import graft.sources.sdfits.SdfitsFormat.ColSpec

/** Scratch probe: does SdfitsSliceRule fire through the REAL injected
  * optimizer (spark.sql.extensions=graft.GraftExtensions) for the
  * filtered + pruned-projection shape? Run in its own JVM via
  * tools/run_main.sh graft.tools.SliceRuleProbe.
  */
object SliceRuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = Files.createTempDirectory("graft-slice-probe").toFile
    val out = new FileOutputStream(s"$d/a.fits")
    try SdfitsFormat.write(out,
      headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
      history = Seq("DATAMODE HIRES / data resolution mode"),
      cols = Seq(ColSpec("ROWIDX", 1, 'K'), ColSpec("DATA", 6, 'D'),
        ColSpec("IFNUM", 1, 'J'), ColSpec("CALSTATE", 1, 'J')),
      rows = (0 until 40).iterator.map(i =>
        Seq[Any](i.toLong, Array.tabulate(6)(c => i * 10.0 + c), i % 3, i % 2)),
      nRows = 40)
    finally out.close()

    def check(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"== $tag: pushed=${plan.contains("PushedChannelRange")}")
      println(df.queryExecution.optimizedPlan.toString.linesIterator.take(6).mkString("\n"))
    }

    val r = spark.read.format("sdfits").load(d.getAbsolutePath)
    // shape A: bare projection, all columns referenced
    check("A select-only")(r.select(col("ROWIDX"), slice(col("DATA"), 2, 2).as("d")))
    // shape B: filter + projection, IFNUM and CALSTATE unreferenced ->
    // ColumnPruning interposes a Project under the Filter
    check("B filter+select, unreferenced cols")(
      r.filter(col("CALSTATE") === 1)
        .select(col("ROWIDX"), slice(col("DATA"), 2, 2).as("d")))
    // shape C: filter only on a projected col
    check("C filter on projected col")(
      r.filter(col("ROWIDX") > 5)
        .select(col("ROWIDX"), slice(col("DATA"), 2, 2).as("d")))
    spark.stop()
  }
}
