package graft.plans

import java.io.FileOutputStream
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftRegistrar
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.sdfits.SdfitsFormat
import graft.sources.sdfits.SdfitsFormat.ColSpec

/** The channel-slice rewrite: `slice($"DATA", a, n)` over an sdfits
  * relation becomes the connector's `channels` option (scan decodes only
  * the sliced bytes), value-identical to the unrewritten plan. The rule is
  * applied MANUALLY to the analyzed plan here (executed via the
  * GraftRegistrar.ofRows bridge): in production it's injected through
  * `spark.sql.extensions=graft.GraftExtensions` into the
  * operator-optimization batch, which runs before V2ScanRelationPushDown —
  * the shared spec session can't swap extensions after the fact, and the
  * transformation is the thing under test.
  */
class SdfitsSliceRuleSpec extends SparkTestBase {
  import spark.implicits._

  private val cols = Seq(
    ColSpec("ROWIDX", 1, 'K'),
    ColSpec("DATA", 6, 'D'),
    ColSpec("IFNUM", 1, 'J'))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-sdfits-slice").toFile
    val out = new FileOutputStream(s"$d/a.fits")
    try SdfitsFormat.write(out,
      headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
      history = Seq("DATAMODE HIRES / data resolution mode"),
      cols = cols,
      rows = (0 until 40).iterator.map(i =>
        Seq[Any](i.toLong, Array.tabulate(6)(c => i * 10.0 + c), i % 3)),
      nRows = 40)
    finally out.close()
    d.getAbsolutePath
  }

  private def applied(df: DataFrame): DataFrame =
    GraftRegistrar.ofRows(spark,
      SdfitsSliceRule(df.queryExecution.analyzed))

  private def pushed(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("PushedChannelRange")

  test("rewrites slice() into the channels option with identical values") {
    val base = spark.read.format("sdfits").load(dir)
      .select($"ROWIDX", slice($"DATA", 3, 2).as("d"))
    val got = applied(base)
    assert(pushed(got), got.queryExecution.executedPlan.toString)
    assert(got.queryExecution.executedPlan.toString.contains("[2:2]"))
    val expect = base.as[(Long, Seq[Double])].collect().toMap
    assert(got.as[(Long, Seq[Double])].collect().toMap == expect)
    assert(expect(7L) == Seq(72.0, 73.0))
  }

  test("rewrites under a scalar filter; repeated identical slices both rewrite") {
    val base = spark.read.format("sdfits").load(dir)
      .filter($"IFNUM" === 1)
      .select($"ROWIDX", element_at(slice($"DATA", 2, 3), 1).as("c1"),
        element_at(slice($"DATA", 2, 3), 3).as("c3"))
    val got = applied(base)
    assert(pushed(got))
    assert(got.as[(Long, Double, Double)].collect().toSet ==
      base.as[(Long, Double, Double)].collect().toSet)
  }

  test("clamped past-the-end slices stay value-identical after the rewrite") {
    val base = spark.read.format("sdfits").load(dir)
      .select($"ROWIDX", slice($"DATA", 5, 9).as("d"))
    val got = applied(base)
    assert(pushed(got))
    assert(got.as[(Long, Seq[Double])].collect().toMap ==
      base.as[(Long, Seq[Double])].collect().toMap)
    assert(got.select(size($"d")).as[Int].collect().forall(_ == 2))
  }

  test("skips when the vector is also used unsliced, sliced twice differently, or filtered on") {
    val df = spark.read.format("sdfits").load(dir)
    // unsliced companion use needs the full vector
    val mixed = df.select(slice($"DATA", 2, 2).as("d"), size($"DATA").as("n"))
    assert(!pushed(applied(mixed)))
    assert(applied(mixed).select($"n").as[Int].head() == 6)
    // two different ranges cannot share one pushed range
    val two = df.select(slice($"DATA", 1, 2).as("a"), slice($"DATA", 3, 2).as("b"))
    assert(!pushed(applied(two)))
    // a filter on the vector itself needs full decode
    val filt = df.filter(element_at($"DATA", 6) > 100.0)
      .select(slice($"DATA", 1, 2).as("d"))
    assert(!pushed(applied(filt)))
    assert(applied(filt).count() == filt.count())
    // dynamic (non-literal) slice bounds cannot push
    val dyn = df.select(slice($"DATA", $"IFNUM" + 1, lit(2)).as("d"))
    assert(!pushed(applied(dyn)))
  }

  // Two vector columns: the pushed option slices EVERY vector column the
  // scan decodes, so a sibling vector's bare use must block the rewrite
  // even when the slice itself is clean — and two siblings sliced with the
  // SAME range may share one pushed range.
  private val cols2 = Seq(
    ColSpec("ROWIDX", 1, 'K'),
    ColSpec("DATA", 6, 'D'),
    ColSpec("WEIGHTS", 6, 'E'),
    ColSpec("IFNUM", 1, 'J'))

  private lazy val dir2: String = {
    val d = Files.createTempDirectory("graft-sdfits-slice2").toFile
    val out = new FileOutputStream(s"$d/a.fits")
    try SdfitsFormat.write(out,
      headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
      history = Seq("DATAMODE HIRES / data resolution mode"),
      cols = cols2,
      rows = (0 until 40).iterator.map(i =>
        Seq[Any](i.toLong, Array.tabulate(6)(c => i * 10.0 + c),
          Array.tabulate(6)(c => (i + c).toFloat), i % 3)),
      nRows = 40)
    finally out.close()
    d.getAbsolutePath
  }

  test("skips when a SIBLING vector column is projected whole") {
    val df = spark.read.format("sdfits").load(dir2)
    val mixed = df.select($"ROWIDX", slice($"DATA", 2, 2).as("d"), $"WEIGHTS")
    val got = applied(mixed)
    assert(!pushed(got))
    // and the sibling vector survives un-sliced
    assert(got.select(size($"WEIGHTS")).as[Int].collect().forall(_ == 6))
    assert(got.as[(Long, Seq[Double], Seq[Float])].collect().toSet ==
      mixed.as[(Long, Seq[Double], Seq[Float])].collect().toSet)
  }

  test("two sibling vectors sliced with the same range share one pushed range") {
    val base = spark.read.format("sdfits").load(dir2)
      .select($"ROWIDX", slice($"DATA", 3, 2).as("d"), slice($"WEIGHTS", 3, 2).as("w"))
    val got = applied(base)
    assert(pushed(got), got.queryExecution.executedPlan.toString)
    assert(got.as[(Long, Seq[Double], Seq[Float])].collect().toSet ==
      base.as[(Long, Seq[Double], Seq[Float])].collect().toSet)
  }

  test("two sibling vectors sliced with DIFFERENT ranges cannot push") {
    val df = spark.read.format("sdfits").load(dir2)
    val two = df.select(slice($"DATA", 1, 2).as("d"), slice($"WEIGHTS", 3, 2).as("w"))
    val got = applied(two)
    assert(!pushed(got))
    assert(got.as[(Seq[Double], Seq[Float])].collect().toSet ==
      two.as[(Seq[Double], Seq[Float])].collect().toSet)
  }

  test("idempotent: a relation that already carries channels is left alone") {
    val base = spark.read.format("sdfits").option("channels", "1:3").load(dir)
      .select($"ROWIDX", slice($"DATA", 2, 1).as("d"))
    // slice now addresses the ALREADY-sliced vector; rewriting again would
    // double-apply the offset
    val got = applied(base)
    assert(got.as[(Long, Seq[Double])].collect().toMap ==
      base.as[(Long, Seq[Double])].collect().toMap)
  }
}
