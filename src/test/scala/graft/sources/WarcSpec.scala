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

  // ------------------------------------------------------------ gzip chain

  private def mkFileGz(n: Int, tag: String = "g"): Array[Byte] =
    Warc.encodeFileGz((0 until n).map { i =>
      (s"http://ex.com/$tag/$i", "2026-08-13T00:00:00Z", s"payload $tag $i".getBytes(UTF_8))
    })

  private def gzMembers(n: Int, tag: String = "g"): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val rec = new java.io.ByteArrayOutputStream()
      Warc.encodeRecord(rec, "response", s"http://ex.com/$tag/$i",
        "2026-08-13T00:00:00Z", s"payload $tag $i".getBytes(UTF_8))
      Warc.gzipMember(rec.toByteArray)
    }

  test("gz: member-per-record encode sniffs and round-trips via parseBytesKernel") {
    val (recs, quar) = Warc.parseBytesKernel(Seq((0L, mkFileGz(5))).toDF("file_id", "payload"))
    assert(quar.count() == 0)
    val r = recs.collect().sortBy(_.record_idx)
    assert(r.length == 5)
    r.zipWithIndex.foreach { case (rec, i) =>
      assert(rec.target_uri == s"http://ex.com/g/$i")
      assert(new String(rec.payload, UTF_8) == s"payload g $i")
    }
  }

  test("gz: optional header fields (FNAME/FEXTRA/FCOMMENT/FHCRC) are skipped") {
    val plain = gzMembers(1).head
    // rebuild the member with every optional field set: fixed header with
    // FLG = FHCRC|FEXTRA|FNAME|FCOMMENT, then the original deflate
    // body+trailer (offset 10 of the GZIPOutputStream member)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, (0x02 | 0x04 | 0x08 | 0x10).toByte,
      0, 0, 0, 0, 0, 0))
    out.write(Array[Byte](3, 0, 1, 2, 3))          // FEXTRA: len 3 LE + payload
    out.write("name.warc".getBytes(UTF_8)); out.write(0) // FNAME
    out.write("a comment".getBytes(UTF_8)); out.write(0) // FCOMMENT
    out.write(Array[Byte](0x42, 0x24))             // FHCRC (not validated)
    out.write(plain, 10, plain.length - 10)
    val parsed = Warc.parseStream(
      new GzipChainStream(new ByteArrayInputStream(out.toByteArray)), 0L).toSeq
    assert(parsed.length == 1 && parsed.head.isRight)
    assert(parsed.head.exists(r => new String(r.payload, UTF_8) == "payload g 0"))
  }

  test("gz: corrupt middle member quarantines instead of silently truncating") {
    // THE GZIPInputStream hazard: garbage where member 2's header should
    // be reads as clean EOF there; the chain decoder must fault instead.
    val members = gzMembers(3)
    val bytes = members(0) ++ members(1) ++ members(2)
    bytes(members(0).length) = 'X'.toByte // stomp member 1's magic
    val parsed = Warc.parseStream(
      new GzipChainStream(new ByteArrayInputStream(bytes)), 0L).toSeq
    assert(parsed.count(_.isRight) == 1)
    assert(parsed.last.left.exists(q => q.reason == "bad_gzip" && q.records_ok == 1))
  }

  test("gz: truncated tail and corrupt CRC trailer both quarantine") {
    val whole = mkFileGz(3)
    // cut inside the last member's 8-byte trailer: all three records
    // decompress, the chain faults validating the trailer. (A cut further
    // left lands mid-deflate and surfaces as truncated_payload /
    // truncated_gzip depending on which parser read hits it — both
    // quarantine; this cut point is the deterministic one.)
    val cut = java.util.Arrays.copyOf(whole, whole.length - 2)
    val p1 = Warc.parseStream(new GzipChainStream(new ByteArrayInputStream(cut)), 0L).toSeq
    assert(p1.count(_.isRight) == 3)
    assert(p1.last.left.exists(q => q.reason == "truncated_gzip" && q.records_ok == 3))

    val crcFlip = whole.clone()
    crcFlip(whole.length - 6) = (crcFlip(whole.length - 6) ^ 0x55).toByte // CRC32 byte
    val p2 = Warc.parseStream(new GzipChainStream(new ByteArrayInputStream(crcFlip)), 0L).toSeq
    assert(p2.count(_.isRight) == 3) // the record itself parsed before the trailer check
    assert(p2.last.left.exists(_.reason == "bad_gzip"))
  }

  test("gz: readFiles mixes .warc and .warc.gz in one listing") {
    val dir = Files.createTempDirectory("graft-warc-gz").toFile
    Files.write(new java.io.File(dir, "m0.warc").toPath, mkFile(3, "p"))
    Files.write(new java.io.File(dir, "m1.warc.gz").toPath, mkFileGz(2, "q"))
    val (recs, quar, names) = Warc.readFiles(spark, dir.getAbsolutePath)
    assert(names.size == 2)
    val counts = recs.groupByKey(_.file_id).count().collect().toMap
    assert(counts == Map(0L -> 3L, 1L -> 2L))
    assert(quar.count() == 0)
  }

  test("writeShards: parallel one-file-per-key sink round-trips through both readers") {
    val dir = Files.createTempDirectory("graft-warc-shards").toFile.getAbsolutePath
    val rows = (0 until 20).map { i =>
      (s"shard ${i % 3}", s"http://ex.com/d/$i", "2026-08-13T00:00:00Z",
        s"body $i".getBytes(UTF_8), i)
    }
    val df = rows.toDF("k", "target_uri", "warc_date", "payload", "ord")
    val manifest = Warc.writeShards(df, "k", Seq("ord"), dir, gzip = true)
      .as[(String, String, Long)].collect().sortBy(_._1)
    // keys "shard 0"/"shard 1"/"shard 2" sanitize distinctly → no suffix
    assert(manifest.map(_._1).toSeq == Seq("shard 0", "shard 1", "shard 2"))
    assert(manifest.forall(m => m._2.endsWith(".warc.gz") && m._3 == (if (m._1 == "shard 0") 7 else if (m._1 == "shard 1") 7 else 6)))
    // read back via the file reader: all 20 records, in-shard order by ord
    val (recs, quar, _) = Warc.readFiles(spark, dir)
    assert(quar.count() == 0)
    val got = recs.collect()
    assert(got.length == 20)
    assert(got.map(_.target_uri).toSet == rows.map(_._2).toSet)
    got.groupBy(_.file_id).values.foreach { fileRecs =>
      val ords = fileRecs.sortBy(_.record_idx)
        .map(_.target_uri.split("/").last.toInt).toSeq
      assert(ords == ords.sorted, "in-shard record order follows sortCols")
    }
    // and via the DSv2 connector
    assert(spark.read.format("warc").load(dir).count() == 20)
    // sanitization collision: "a b" and "a_b" get distinct hashed names
    val coll = Seq(("a b", "u1", "d", "x".getBytes(UTF_8), 0),
        ("a_b", "u2", "d", "y".getBytes(UTF_8), 0))
      .toDF("k", "target_uri", "warc_date", "payload", "ord")
    val dir2 = Files.createTempDirectory("graft-warc-coll").toFile.getAbsolutePath
    val m2 = Warc.writeShards(coll, "k", Seq("ord"), dir2, gzip = false)
      .as[(String, String, Long)].collect()
    assert(m2.map(_._2).distinct.length == 2)
    val (r2, _, _) = Warc.readFiles(spark, dir2)
    assert(r2.collect().map(_.target_uri).sorted.toSeq == Seq("u1", "u2"))
    // null shard keys are rejected up front, not mid-write
    val bad = Seq((Option.empty[String], "u", "d", "z".getBytes(UTF_8), 0))
      .toDF("k", "target_uri", "warc_date", "payload", "ord")
    val e = intercept[IllegalArgumentException] {
      Warc.writeShards(bad, "k", Seq("ord"), dir2)
    }
    assert(e.getMessage.contains("null"))
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

  test("WET/WAT layers: type filter, text decode, corrupt-JSON surfacing") {
    import org.apache.spark.sql.types._
    val bytes = Warc.encodeFileOfTypes(Seq(
      ("warcinfo", "wet:0", "2026-08-13T00:00:00Z", "software: graft".getBytes(UTF_8)),
      ("conversion", "http://ex.com/a/1", "2026-08-13T00:00:00Z", "hello text".getBytes(UTF_8)),
      ("request", "http://ex.com/a/1", "2026-08-13T00:00:00Z", "GET /".getBytes(UTF_8)),
      ("metadata", "http://ex.com/a/1", "2026-08-13T00:00:00Z",
        """{"uri":"http://ex.com/a/1","n_words":2}""".getBytes(UTF_8)),
      ("metadata", "http://ex.com/a/2", "2026-08-13T00:00:00Z", "{broken".getBytes(UTF_8))))
    val recs = Warc.parseStream(new ByteArrayInputStream(bytes), 0L)
      .collect { case Right(r) => r }.toSeq.toDS().toDF()
    val wet = Warc.wetText(recs).collect()
    assert(wet.length === 1)
    assert(wet(0).getAs[String]("text") === "hello text")
    val schema = StructType(Seq(
      StructField("uri", StringType), StructField("n_words", LongType)))
    val wat = Warc.watMetadata(recs, schema)
      .selectExpr("target_uri", "meta.uri IS NOT NULL AS ok", "meta.n_words")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(wat === Map("http://ex.com/a/1" -> true, "http://ex.com/a/2" -> false))
  }
}
