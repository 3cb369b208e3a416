package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import StreamingFunnel.FunnelEvent

/** Streaming ordered-funnel tracker: completions across micro-batches must
  * equal the batch query's conditional minima on the same (time-ordered)
  * events, emitted exactly once per user.
  */
class StreamingFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val events = Seq(
    // user 1 converts across THREE micro-batch boundaries
    FunnelEvent(1L, "view", 100L), FunnelEvent(1L, "view", 150L),
    FunnelEvent(1L, "click", 200L),
    FunnelEvent(1L, "purchase", 300L),
    // user 2: click BEFORE any view must not count; converts later
    FunnelEvent(2L, "click", 90L), FunnelEvent(2L, "view", 100L),
    FunnelEvent(2L, "click", 110L), FunnelEvent(2L, "purchase", 120L),
    // user 3: never clicks → no completion
    FunnelEvent(3L, "view", 50L), FunnelEvent(3L, "purchase", 60L),
    // user 4: second purchase must not re-emit
    FunnelEvent(4L, "view", 10L), FunnelEvent(4L, "click", 20L),
    FunnelEvent(4L, "purchase", 30L), FunnelEvent(4L, "purchase", 40L))

  private def batchTruth: Set[(Long, Long, Long, Long)] = {
    val e = events.toDS().toDF("user_id", "event_type", "us")
    val s1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val s2 = e.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"us" > $"t1").groupBy($"user_id").agg(min($"us").as("t2"))
    val s3 = e.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"us" > $"t2").groupBy($"user_id").agg(min($"us").as("t3"))
    s1.join(s2, "user_id").join(s3, "user_id")
      .select($"user_id", $"t1", $"t2", $"t3")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("completions across micro-batches equal the batch conditional minima") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.completions(input.toDS())
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    try {
      // per-user time-ordered delivery, split across three batches
      input.addData(events.filter(_.us <= 100L): _*); q.processAllAvailable()
      input.addData(events.filter(e => e.us > 100L && e.us <= 200L): _*); q.processAllAvailable()
      input.addData(events.filter(_.us > 200L): _*); q.processAllAvailable()
      val got = spark.table("sfunnel")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == batchTruth, s"stream $got vs batch $batchTruth")
      assert(got.map(_._1) == Set(1L, 2L, 4L))
      // exactly one completion per converting user
      assert(spark.table("sfunnel").count() == 3L)
    } finally q.stop()
  }
}
