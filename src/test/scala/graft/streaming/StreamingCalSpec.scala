package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.StreamingCal.{CalRow, SpikeSegment}

/** §2.10 streaming extensions: the incremental diode-spike segmenter
  * (flatMapGroupsWithState) and the watermarked windowed A2 spectra —
  * exercised through real micro-batches via MemoryStream.
  */
class StreamingCalSpec extends SparkTestBase {
  import spark.implicits._

  test("spike segments emit once per completed diode run, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CalRow]
    val q = StreamingCal.spikeSegments(input.toDS())
      .writeStream.format("memory").queryName("segs").outputMode("append").start()
    try {
      input.addData(CalRow("f", 0, 1, 0), CalRow("f", 1, 1, 0))
      q.processAllAvailable()
      assert(spark.table("segs").count() == 0) // spike still open

      input.addData(CalRow("f", 2, 0, 1), CalRow("f", 3, 1, 0))
      q.processAllAvailable()
      assert(spark.table("segs").as[SpikeSegment].collect().toSeq ==
        Seq(SpikeSegment("f", 0, 1, 2))) // first run closed; second still open

      input.addData(CalRow("f", 4, 0, 1), CalRow("g", 0, 1, 0), CalRow("g", 1, 0, 1))
      q.processAllAvailable()
      assert(spark.table("segs").as[SpikeSegment].collect().toSet ==
        Set(SpikeSegment("f", 0, 1, 2), SpikeSegment("f", 3, 3, 1), SpikeSegment("g", 0, 0, 1)))
    } finally q.stop()
  }

  test("windowed spectra: vector sums per event-time window, late data past watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 00:$m:00")
    val input = MemoryStream[(java.sql.Timestamp, Seq[Double])]
    val q = StreamingCal.windowedSpectra(input.toDS().toDF("ts", "DATA"),
        "ts", "10 minutes", "5 minutes")
      .selectExpr("window.start AS ws", "spectrum")
      .writeStream.format("memory").queryName("spec").outputMode("append").start()
    try {
      input.addData((ts("01"), Seq(1.0, 2.0)), (ts("02"), Seq(3.0, 4.0)), (ts("11"), Seq(10.0, 10.0)))
      q.processAllAvailable()
      // advance the watermark past both windows
      input.addData((ts("30"), Seq(0.0, 0.0)))
      q.processAllAvailable()
      val rows = spark.table("spec").as[(java.sql.Timestamp, Seq[Double])].collect().toMap
      assert(rows(ts("00")) == Seq(4.0, 6.0))
      assert(rows(ts("10")) == Seq(10.0, 10.0))
    } finally q.stop()
  }

  test("session counts: gap-separated sessions close as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 00:$m:00")
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingCal.sessionCounts(input.toDS().toDF("user", "ts"),
        "user", "ts", gap = "5 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user a: events at 00 and 02 (one session), then 20 (a second);
      // user b: one event at 01.
      input.addData(("a", ts("00")), ("a", ts("02")), ("b", ts("01")))
      q.processAllAvailable()
      input.addData(("a", ts("20")))
      q.processAllAvailable()
      input.addData(("a", ts("40"))) // watermark passes session 2's end
      q.processAllAvailable()
      val rows = spark.table("sess")
        .as[(String, java.sql.Timestamp, Long)].collect().toSet
      assert(rows == Set(
        ("a", ts("00"), 2L), // 00+02 merged: 5-min gap bridges them
        ("b", ts("01"), 1L),
        ("a", ts("20"), 1L)))
    } finally q.stop()
  }
}
