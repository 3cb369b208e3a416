package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkTestBase

/** The `spark.read.format("warc")` DSv2 surface: schema, mixed plain/gzip
  * listings, reader-level payload pruning, and the onfault contract.
  */
class WarcConnectorSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int, tag: String): Array[Byte] =
    Warc.encodeFile((0 until n).map { i =>
      (s"http://ex.com/$tag/$i", "2026-08-13T00:00:00Z", s"payload $tag $i".getBytes(UTF_8))
    })

  private def mkGz(n: Int, tag: String): Array[Byte] =
    Warc.encodeFileGz((0 until n).map { i =>
      (s"http://ex.com/$tag/$i", "2026-08-13T00:00:00Z", s"payload $tag $i".getBytes(UTF_8))
    })

  private lazy val dir: String = {
    val d = Files.createTempDirectory("warc-dsv2").toFile
    Files.write(new java.io.File(d, "a.warc").toPath, mk(3, "a"))
    Files.write(new java.io.File(d, "b.warc.gz").toPath, mkGz(2, "b"))
    Files.write(new java.io.File(d, "ignore.txt").toPath, "x".getBytes(UTF_8))
    d.getAbsolutePath
  }

  test("reads a mixed plain/gzip directory with the fixed record schema") {
    val df = spark.read.format("warc").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("file", "record_idx", "warc_type",
      "target_uri", "warc_date", "content_length", "payload"))
    val rows = df.selectExpr("file", "target_uri", "cast(payload as string) as text")
      .as[(String, String, String)].collect().sortBy(_._2)
    assert(rows.length == 5)
    assert(rows.count(_._1.endsWith("a.warc")) == 3)
    assert(rows.count(_._1.endsWith("b.warc.gz")) == 2)
    assert(rows.map(_._2).toSeq == Seq("http://ex.com/a/0", "http://ex.com/a/1",
      "http://ex.com/a/2", "http://ex.com/b/0", "http://ex.com/b/1"))
    rows.foreach { case (_, uri, text) =>
      assert(text == "payload " + uri.split("/").takeRight(2).mkString(" "))
    }
  }

  test("payload pruning reaches the reader: unprojected payload is not read") {
    val df = spark.read.format("warc").load(dir)
      .select($"target_uri", $"content_length")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BatchScan") && !plan.contains("payload"),
      s"payload survived pruning:\n$plan")
    // content_length is still the true payload size even though the bytes
    // were skipped, not buffered
    val got = df.as[(String, Long)].collect().toMap
    assert(got("http://ex.com/a/0") == "payload a 0".length.toLong)
  }

  test("onfault=fail (default) aborts with file/offset/reason; skip salvages") {
    val d = Files.createTempDirectory("warc-dsv2-bad").toFile
    Files.write(new java.io.File(d, "good.warc").toPath, mk(2, "g"))
    val cut = mk(3, "bad")
    Files.write(new java.io.File(d, "bad.warc").toPath,
      java.util.Arrays.copyOf(cut, cut.length - 7))
    val path = d.getAbsolutePath

    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").load(path).count()
    }
    assert(e.getMessage.contains("corrupt") || Option(e.getCause).exists(
      _.getMessage.contains("corrupt")))

    val salvaged = spark.read.format("warc").option("onfault", "skip").load(path)
      .select($"target_uri").as[String].collect().sorted.toSeq
    assert(salvaged == Seq("http://ex.com/bad/0", "http://ex.com/bad/1",
      "http://ex.com/g/0", "http://ex.com/g/1"))
  }

  test("single-file path and empty-directory failure") {
    val one = spark.read.format("warc").load(s"$dir/a.warc")
    assert(one.count() == 3)
    val empty = Files.createTempDirectory("warc-dsv2-empty").toFile.getAbsolutePath
    val e = intercept[Exception] {
      spark.read.format("warc").load(empty).count()
    }
    assert(e.getMessage.contains("no input files") ||
      Option(e.getCause).exists(_.getMessage.contains("no input files")))
  }
}
