package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.sdfits.{Sdfits, SdfitsFormat}
import graft.sources.sdfits.SdfitsFormat.{ColSpec, SdfitsVerificationException}

/** SDFITS DataSource V2: FITS-layout round trip, per-file partitioning,
  * column pruning, structural verification (END-card corruption analog,
  * ref file_corruption.py:15-34), header parse into the typed record.
  */
class SdfitsSpec extends SparkTestBase {
  import spark.implicits._

  private val cols = Seq(
    ColSpec("ROWIDX", 1, 'K'),
    ColSpec("DATE_OBS", 23, 'A'),
    ColSpec("DATA", 4, 'D'),
    ColSpec("IFNUM", 1, 'J'),
    ColSpec("CALSTATE", 1, 'J'),
    ColSpec("ELEVATIO", 1, 'D'),
    ColSpec("OBSMODE", 12, 'A'))

  private def rowsFor(fileTag: Int, n: Int): Seq[Seq[Any]] =
    (0 until n).map { i =>
      Seq[Any](
        i.toLong,
        f"2024-01-01T00:00:${i % 60}%02d.000",
        Array(1.0 * i + fileTag, 2.0 * i, 3.0 * i, 0.5 * i),
        fileTag,
        i % 2,
        45.5 + i,
        if (i < n / 2) "onoff:on" else "onoff:off")
    }

  private def writeObs(path: String, fileTag: Int, n: Int): Unit = {
    val out = new FileOutputStream(path)
    try SdfitsFormat.write(out,
      headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
      history = Seq(
        "DATAMODE HIRES / data resolution mode",
        "START,STOP channels  0_3",
        "HIRES bands  1355, 1435"),
      cols = cols, rows = rowsFor(fileTag, n).iterator, nRows = n)
    finally out.close()
  }

  test("round trip: values, vector column, per-file partitions, directory read") {
    val dir = Files.createTempDirectory("graft-sdfits").toFile
    writeObs(s"$dir/a.fits", fileTag = 1, n = 40)
    writeObs(s"$dir/b.fits", fileTag = 2, n = 25)
    val df = spark.read.format("sdfits").load(dir.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 2, "one input partition per file")
    assert(df.count() == 65)
    // typed round trip of a specific row
    val r = df.filter($"IFNUM" === 1 && $"ROWIDX" === 3L)
      .select($"DATE_OBS", $"DATA", $"CALSTATE", $"ELEVATIO", $"OBSMODE")
      .head()
    assert(r.getString(0) == "2024-01-01T00:00:03.000")
    assert(r.getSeq[Double](1) == Seq(4.0, 6.0, 9.0, 1.5))
    assert(r.getInt(2) == 1 && r.getDouble(3) == 48.5 && r.getString(4) == "onoff:on")
    // integer-valued sums are exact: cross-file aggregation over the cube
    val s = df.select(element_at($"DATA", 2).as("c2")).agg(sum($"c2")).head().getDouble(0)
    assert(s == 2.0 * ((0 until 40).sum + (0 until 25).sum))
  }

  test("column pruning reaches the reader: flag-only scan decodes without DATA") {
    val dir = Files.createTempDirectory("graft-sdfits-prune").toFile
    writeObs(s"$dir/a.fits", fileTag = 1, n = 10)
    val df = spark.read.format("sdfits").load(s"$dir/a.fits")
      .select($"ROWIDX", $"CALSTATE")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ROWIDX"), scan)
    assert(!df.queryExecution.optimizedPlan.schema.fieldNames.contains("DATA"),
      "pruned plan must not carry DATA")
    assert(df.as[(Long, Int)].collect().toSeq == (0 until 10).map(i => (i.toLong, i % 2)))
  }

  test("structural verification rejects an END-stripped file (corruption analog)") {
    val dir = Files.createTempDirectory("graft-sdfits-corrupt").toFile
    val good = s"$dir/obs.fits"
    writeObs(good, fileTag = 1, n = 12)
    val bytes = Files.readAllBytes(new java.io.File(good).toPath)
    // sanity: the intact file opens
    SdfitsFormat.open(bytes)
    val corrupted = SdfitsFormat.corruptStripEnd(bytes)
    val bad = s"$dir/obs_corrupted.fits"
    Files.write(new java.io.File(bad).toPath, corrupted)
    intercept[SdfitsVerificationException] {
      SdfitsFormat.open(corrupted)
    }
    val e = intercept[Exception] {
      spark.read.format("sdfits").load(bad).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[SdfitsVerificationException]),
      s"expected a verification rejection, got $e")
  }

  test("schema drift across files fails loudly (strict-merge semantics)") {
    val dir = Files.createTempDirectory("graft-sdfits-drift").toFile
    writeObs(s"$dir/a.fits", fileTag = 1, n = 5)
    val out = new FileOutputStream(s"$dir/b.fits")
    try SdfitsFormat.write(out,
      headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
      history = Nil,
      cols = Seq(ColSpec("ROWIDX", 1, 'K'), ColSpec("DATA", 8, 'D')),
      rows = (0 until 3).iterator.map(i => Seq[Any](i.toLong, Array.fill(8)(1.0))),
      nRows = 3)
    finally out.close()
    val e = intercept[Exception] {
      spark.read.format("sdfits").load(dir.getAbsolutePath).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[SdfitsVerificationException] &&
      c.getMessage.contains("does not match")), s"got $e")
  }

  test("header reads into the typed record: DATE, OBSMODE, bands, channel range") {
    val dir = Files.createTempDirectory("graft-sdfits-hdr").toFile
    val p = s"$dir/obs.fits"
    writeObs(p, fileTag = 1, n = 4)
    val h = Sdfits.readHeader(p)
    assert(h.date == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(h.obsmode == "onoff" && h.obsfreq == 1400.0 && h.obsbw == 80.0)
    val fr = graft.model.HeaderRecord.frequencyRange(h, ifnum = 0)
    assert(fr.channelCount == 4)
    assert(fr.low == 1315.0 && fr.high == 1395.0) // HIRES: 1355 ± 80/2
  }

  test("byte-level write sanity: block-aligned, card grammar, in-memory round trip") {
    val bos = new ByteArrayOutputStream()
    SdfitsFormat.write(bos,
      headerValues = Seq("OBSFREQ" -> "1.5"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "tracking"),
      history = Seq("DATAMODE LOWRES / x"),
      cols = Seq(ColSpec("A", 1, 'J'), ColSpec("S", 5, 'A'), ColSpec("V", 2, 'E')),
      rows = Iterator(Seq[Any](7, "hi", Array(1.5f, -2.5f))),
      nRows = 1)
    val b = bos.toByteArray
    assert(b.length % SdfitsFormat.BLOCK == 0, "FITS files are 2880-byte aligned")
    val (primary, table) = SdfitsFormat.open(b)
    assert(primary.value("OBSMODE").contains("tracking"))
    assert(primary.history == Seq("DATAMODE LOWRES / x"))
    assert(table.nRows == 1 && table.rowBytes == 4 + 5 + 8)
    assert(SdfitsFormat.decodeCell(b, table, 0, table.cols(0), 0) == 7)
    assert(SdfitsFormat.decodeCell(b, table, 0, table.cols(1), 4) == "hi")
    assert(SdfitsFormat.decodeCell(b, table, 0, table.cols(2), 9)
      .asInstanceOf[Array[Float]].toSeq == Seq(1.5f, -2.5f))
  }
}
