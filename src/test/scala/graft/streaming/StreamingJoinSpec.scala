package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase

/** Stream-stream watermarked join: micro-batched output must equal the
  * batch join on the same data, and rows arriving after the watermark
  * passes their horizon must be dropped from state (no late match).
  */
class StreamingJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)

  test("micro-batched join == batch join on identical inputs") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingJoin.joinWithin(
      clicks.toDF().toDF("user_id", "click_ts"),
      buys.toDF().toDF("user_id", "buy_ts"),
      "user_id", "click_ts", "buy_ts",
      within = "30 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      // Batch 1: user 1 clicks at 00 and 40; user 2 clicks at 05.
      clicks.addData((1L, ts(0)), (1L, ts(40)), (2L, ts(5)))
      // Batch 2: purchases — user 1 at 10 (matches click 00) and 55
      // (matches click 40); user 2 at 50 (no click within 30 min).
      buys.addData((1L, ts(10)), (1L, ts(55)), (2L, ts(50)))
      q.processAllAvailable()

      val streamRows = spark.table("ssj")
        .select($"user_id", $"click_ts", $"buy_ts")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      val batchRows = StreamingJoin.joinWithin(
          Seq((1L, ts(0)), (1L, ts(40)), (2L, ts(5))).toDF("user_id", "click_ts"),
          Seq((1L, ts(10)), (1L, ts(55)), (2L, ts(50))).toDF("user_id", "buy_ts"),
          "user_id", "click_ts", "buy_ts", "30 minutes", "10 minutes")
        .select($"user_id", $"click_ts", $"buy_ts")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      assert(streamRows === batchRows)
      assert(streamRows === Set((1L, ts(0), ts(10)), (1L, ts(40), ts(55))))
    } finally q.stop()
  }

  test("a left row older than watermark + horizon stops matching (state evicted)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingJoin.joinWithin(
      clicks.toDF().toDF("user_id", "click_ts"),
      buys.toDF().toDF("user_id", "buy_ts"),
      "user_id", "click_ts", "buy_ts",
      within = "10 minutes", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_late")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)))
      buys.addData((9L, ts(0))) // unrelated user; advances nothing yet
      q.processAllAvailable()
      // Push BOTH watermarks far past the click's ts + within + delay.
      clicks.addData((8L, ts(120)))
      buys.addData((9L, ts(120)))
      q.processAllAvailable()
      // This purchase WOULD match click(1, 00) inside the 10-min horizon,
      // but arrives after the watermark evicted that click's state.
      buys.addData((1L, ts(8)))
      q.processAllAvailable()
      assert(spark.table("ssj_late").count() === 0)
    } finally q.stop()
  }

  test("batch twin on the shared definition matches a plain SQL interval join") {
    val clicks = Seq((1L, ts(0)), (2L, ts(3)), (2L, ts(90))).toDF("user_id", "click_ts")
    val buys = Seq((1L, ts(20)), (2L, ts(4)), (2L, ts(95)), (3L, ts(1))).toDF("user_id", "buy_ts")
    val got = StreamingJoin.joinWithin(clicks, buys, "user_id",
        "click_ts", "buy_ts", "30 minutes", "1 hour")
      .select($"user_id", $"click_ts", $"buy_ts")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(got === Set((1L, ts(0), ts(20)), (2L, ts(3), ts(4)), (2L, ts(90), ts(95))))
  }
}
