package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.llm.Dedup

/** Streaming dedup: exact dedup across micro-batches with watermark-bounded
  * state, and stream-vs-stored-corpus near-dup detection, both driven
  * through real micro-batches via MemoryStream.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 00:$m:00")

  test("exact dedup keeps first arrival per content hash across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.exactDedupWithinWatermark(
        input.toDS().toDF("doc_id", "ts", "text"), "ts", "10 minutes")
      .select($"doc_id")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData((1L, ts("01"), "alpha body"), (2L, ts("01"), "beta body"))
      q.processAllAvailable()
      input.addData((3L, ts("02"), "alpha body"), (4L, ts("03"), "gamma body"))
      q.processAllAvailable()
      val kept = spark.table("sdedup").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L)) // doc 3 is a duplicate of doc 1's content
    } finally q.stop()
  }

  test("stream near-dup gate flags collisions against the stored corpus signatures") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "completely different content about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus)

    // Stateless default: one row per colliding band — consumers read a set.
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupAgainstCorpus(
        input.toDS().toDF("doc_id", "text"), sigs)
      .filter($"est_jaccard" >= 0.5)
      .writeStream.format("memory").queryName("sneardup").outputMode("append").start()
    try {
      input.addData(
        (100L, "the quick brown fox jumps over the lazy dog and runs far away house"),
        (200L, "entirely novel text with no overlap to anything stored before now"))
      q.processAllAvailable()
      val hits = spark.table("sneardup")
        .select($"stream_id", $"corpus_id").as[(Long, Long)].collect().toSet
      assert(hits == Set((100L, 1L))) // near-dup flagged, novel doc passes
    } finally q.stop()
  }

  test("stream near-dup gate with tsCol collapses band collisions via watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus)

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.nearDupAgainstCorpus(
        input.toDS().toDF("doc_id", "ts", "text"), sigs,
        tsCol = Some("ts"), watermark = "10 minutes")
      .filter($"est_jaccard" >= 0.5)
      .writeStream.format("memory").queryName("sneardup_wm").outputMode("append").start()
    try {
      input.addData(
        (100L, ts("01"), "the quick brown fox jumps over the lazy dog and runs far away house"))
      q.processAllAvailable()
      val rows = spark.table("sneardup_wm")
        .select($"stream_id", $"corpus_id").as[(Long, Long)].collect().toSeq
      assert(rows == Seq((100L, 1L))) // exactly ONE row despite multi-band collisions
    } finally q.stop()
  }
}
