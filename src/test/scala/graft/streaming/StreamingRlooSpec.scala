package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.llm.Conversations

/** The streaming RLOO twin must converge to EXACTLY the batch operator's
  * advantages (same DECIMAL(38,0) truncation, same null/has_baseline
  * contract for solo prompts) regardless of which micro-batch carried
  * which response — the collect_list complete-mode shape recomputes every
  * prompt from its final response set each batch.
  */
class StreamingRlooSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = ((0 until 60).map { i =>
    (s"p${i % 10}", i.toLong, (((i * 37) % 20) - 10).toLong * 1000000L)
  } :+ (("solo", 999L, 7000000L))).toSeq

  private def runStream(chunk: Int): Set[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val table = s"rloo_spec_$chunk"
    val q = StreamingRloo.advantages(
        input.toDS().toDF("prompt", "id", "reward_micro"))
      .writeStream.format("memory").queryName(table).outputMode("complete")
      .start()
    try rows.grouped(chunk).foreach { g => input.addData(g); q.processAllAvailable() }
    finally q.stop()
    val out = spark.table(table).collect()
      .map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    spark.catalog.dropTempView(table)
    out
  }

  test("stream output equals the batch operator under any chunking") {
    val batch = Conversations.rlooAdvantages(
        rows.toDF("prompt", "id", "reward_micro"), "prompt", "id", "reward_micro")
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    assert(batch.size == rows.size)
    // solo prompt surfaces with null advantage in BOTH engines
    assert(batch.exists(s => s.startsWith("solo|") && s.contains("|null|false")))
    assert(runStream(5) == batch)
    assert(runStream(64) == batch)
  }

  test("null rewards refuse loudly in the stream too") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Long])]
    val q = StreamingRloo.advantages(
        input.toDS().toDF("prompt", "id", "reward_micro"))
      .writeStream.format("memory").queryName("rloo_spec_bad")
      .outputMode("complete").start()
    try {
      input.addData(Seq(("p", 1L, Some(3L)), ("p", 2L, None)))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(12).exists(t => Option(t.getMessage).exists(_.contains("reward_micro"))))
    } finally q.stop()
    spark.catalog.dropTempView("rloo_spec_bad")
  }
}
