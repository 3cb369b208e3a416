package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.sources.Warc

/** Streaming WARC ingestion: the stateless parse/quarantine split applied
  * to file blobs arriving as a stream — stream output must equal batch
  * output, and faults must reach the quarantine side mid-stream.
  */
class StreamingWarcSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int, tag: String, gz: Boolean = false): Array[Byte] = {
    val recs = (0 until n).map { i =>
      (s"http://ex.com/$tag/$i", "2026-08-13T00:00:00Z", s"payload $tag $i".getBytes(UTF_8))
    }
    if (gz) Warc.encodeFileGz(recs) else Warc.encodeFile(recs)
  }

  test("streamed blobs split identically to batch, including gzip and faults") {
    implicit val sqlCtx = spark.sqlContext
    val blobs = Seq(
      ("crawl/a.warc", mk(3, "a")),
      ("crawl/b.warc.gz", mk(2, "b", gz = true)),
      ("crawl/bad.warc", java.util.Arrays.copyOf(mk(2, "x"), 10)))

    val input = MemoryStream[(String, Array[Byte])]
    val (goodS, badS) = Warc.parseFilesKernel(input.toDS().toDF("path", "content"))
    val q1 = goodS.toDF().writeStream.format("memory").queryName("warc_good")
      .outputMode("append").start()
    val q2 = badS.toDF().writeStream.format("memory").queryName("warc_bad")
      .outputMode("append").start()
    try {
      input.addData(blobs.take(1): _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.table("warc_good").count() == 3) // first file visible already
      input.addData(blobs.drop(1): _*)
      q1.processAllAvailable(); q2.processAllAvailable()

      val streamedGood = spark.table("warc_good")
        .selectExpr("file_id", "target_uri", "cast(payload as string)")
        .as[(Long, String, String)].collect().toSet
      val streamedBad = spark.table("warc_bad")
        .selectExpr("file_id", "records_ok", "reason")
        .as[(Long, Int, String)].collect().toSet

      val (goodB, badB) = Warc.parseFilesKernel(blobs.toDF("path", "content"))
      val batchGood = goodB.toDF()
        .selectExpr("file_id", "target_uri", "cast(payload as string)")
        .as[(Long, String, String)].collect().toSet
      val batchBad = badB.toDF().selectExpr("file_id", "records_ok", "reason")
        .as[(Long, Int, String)].collect().toSet

      assert(streamedGood == batchGood && streamedGood.size == 5)
      assert(streamedBad == batchBad && streamedBad.size == 1)
      assert(streamedBad.head._3 == "eof_in_header")
    } finally { q1.stop(); q2.stop() }
  }

  test("binaryFile is a live streaming source for a WARC landing directory") {
    val dir = Files.createTempDirectory("warc-stream").toFile
    Files.write(new java.io.File(dir, "w0.warc").toPath, mk(2, "s0"))
    val files = spark.readStream.format("binaryFile")
      .schema("path string, modificationTime timestamp, length long, content binary")
      .load(dir.getAbsolutePath)
    val (good, _) = Warc.parseFilesKernel(files)
    val q = good.toDF().writeStream.format("memory").queryName("warc_fs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_fs").count() == 2)
      // a new file landing in the directory flows through the same query
      Files.write(new java.io.File(dir, "w1.warc.gz").toPath, mk(3, "s1", gz = true))
      q.processAllAvailable()
      assert(spark.table("warc_fs").count() == 5)
    } finally q.stop()
  }
}
