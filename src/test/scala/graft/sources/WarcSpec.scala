package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkTestBase

/** WARC ingestion: encode→parse round trip, fault quarantine (truncation,
  * bad magic, bad length, missing delimiter), file-parallel reader.
  */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def mkFile(n: Int, tag: String = "r"): Array[Byte] =
    Warc.encodeFile((0 until n).map { i =>
      (s"http://ex.com/$tag/$i", "2026-08-13T00:00:00Z", s"payload $tag $i".getBytes(UTF_8))
    })

  test("encode → parseStream round-trips every record in order") {
    val bytes = mkFile(5)
    val parsed = Warc.parseStream(new ByteArrayInputStream(bytes), 7L).toSeq
    assert(parsed.length == 5 && parsed.forall(_.isRight))
    parsed.zipWithIndex.foreach { case (Right(r), i) =>
      assert(r.file_id == 7L && r.record_idx == i)
      assert(r.warc_type == "response")
      assert(r.target_uri == s"http://ex.com/r/$i")
      assert(r.content_length == s"payload r $i".length)
      assert(new String(r.payload, UTF_8) == s"payload r $i")
    case _ => fail()
    }
  }

  test("truncated final payload keeps prior records and quarantines with offset") {
    val bytes = mkFile(3)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 7) // removes 2 CRLF + 3 payload bytes
    val parsed = Warc.parseStream(new ByteArrayInputStream(cut), 1L).toSeq
    assert(parsed.count(_.isRight) == 2)
    val Left(q) = parsed.last
    assert(q.records_ok == 2 && q.reason == "truncated_payload")
    assert(q.byte_offset == cut.length) // fault at EOF
  }

  test("bad magic, bad content-length, and missing delimiter each quarantine") {
    val good = new String(mkFile(1), UTF_8)
    val cases = Seq(
      good.replace("WARC/1.0", "JUNK/1.0") -> "bad_magic",
      good.replace("Content-Length: 11", "Content-Length: nope") -> "bad_content_length",
      good.replaceFirst("\r\n\r\n$", "XY\r\n") -> "missing_record_delimiter")
    cases.foreach { case (s, want) =>
      val parsed = Warc.parseStream(new ByteArrayInputStream(s.getBytes(UTF_8)), 0L).toSeq
      assert(parsed.lastOption.exists(_.left.exists(_.reason == want)), s"want $want")
    }
  }

  test("a quarantine stops the file: nothing after the fault is fabricated") {
    // two good records, then garbage, then bytes that LOOK like a record
    val out = new java.io.ByteArrayOutputStream()
    out.write(mkFile(2))
    out.write("GARBAGE".getBytes(UTF_8))
    out.write(mkFile(1, "after"))
    val parsed = Warc.parseStream(new ByteArrayInputStream(out.toByteArray), 0L).toSeq
    assert(parsed.count(_.isRight) == 2)
    assert(parsed.last.left.exists(_.reason == "bad_magic"))
    assert(parsed.length == 3) // no records parsed past the fault
  }

  test("parseBytesKernel splits good records from quarantined files") {
    val files = Seq(
      (0L, mkFile(3, "a")),
      (1L, java.util.Arrays.copyOf(mkFile(2, "b"), 10)), // cut mid version line
      (2L, mkFile(1, "c")))
    val df = files.toDF("file_id", "payload")
    val (recs, quar) = Warc.parseBytesKernel(df)
    val r = recs.collect().map(x => (x.file_id, x.record_idx, x.target_uri)).sorted
    assert(r.toSeq == Seq((0L, 0, "http://ex.com/a/0"), (0L, 1, "http://ex.com/a/1"),
      (0L, 2, "http://ex.com/a/2"), (2L, 0, "http://ex.com/c/0")))
    val q = quar.collect()
    assert(q.length == 1 && q.head.file_id == 1L && q.head.records_ok == 0)
    assert(q.head.reason == "eof_in_header")
  }

  test("readFiles streams every .warc under a dir, one task per file") {
    val dir = Files.createTempDirectory("graft-warc").toFile
    Files.write(new java.io.File(dir, "m0.warc").toPath, mkFile(4, "x"))
    Files.write(new java.io.File(dir, "m1.warc").toPath, mkFile(2, "y"))
    Files.write(new java.io.File(dir, "skip.txt").toPath, "not warc".getBytes(UTF_8))
    val (recs, quar, names) = Warc.readFiles(spark, dir.getAbsolutePath)
    assert(names.size == 2 && names(0L).endsWith("m0.warc") && names(1L).endsWith("m1.warc"))
    val counts = recs.groupByKey(_.file_id).count().collect().toMap
    assert(counts == Map(0L -> 4L, 1L -> 2L))
    assert(quar.count() == 0)
  }
}
