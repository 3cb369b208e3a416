package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.llm.{Redaction, TextAnalysis}

/** The curation GATES (language ID, quality score, redaction, token
  * counts) are stateless column expressions, so the same code runs
  * unchanged over micro-batches — this spec drives them through a real
  * MemoryStream and pins stream output == batch output, the property that
  * lets one curation definition serve both the backfill and the live
  * ingest path.
  */
class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over that lazy dog and runs far away in a field of green grass"),
    (2L, "der hund ist nicht zu klein und das haus ist ein traum der die das und wieder einmal hier"),
    (3L, "write to alice@example.net or ping 10.1.2.3 about the meaning of it all and that is that"),
    (4L, "!!!! ???? ,,,, ;;;;")
  )

  private def gates(df: org.apache.spark.sql.DataFrame) =
    df.select(
      $"doc_id",
      TextAnalysis.langId($"text").as("lang"),
      TextAnalysis.qualityScore($"text").as("quality"),
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      Redaction.redactText($"text").as("redacted"))

  test("stateless curation gates produce identical rows in streaming and batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = gates(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scur").outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("scur")
        .as[(Long, String, Double, Int, String)].collect().toSet
      val batch = gates(docs.toDF("doc_id", "text"))
        .as[(Long, String, Double, Int, String)].collect().toSet
      assert(streamed == batch)
      val byId = streamed.map(r => r._1 -> r).toMap
      assert(byId(1L)._2 == "en" && byId(2L)._2 == "de")
      assert(byId(3L)._5.contains("[EMAIL]") && byId(3L)._5.contains("[IP]"))
      assert(byId(4L)._3 < 0.5) // junk scores low
    } finally q.stop()
  }

  test("markdown strip + span corruption are stateless stream maps; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    def stage(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Packing.spanCorruption(
        df.select($"doc_id", TextAnalysis.markdownToText(
          concat(lit("# Head\n**"), $"text",
            lit("**\n```\ndrop me\n```\nsee [docs](http://x.com)"))).as("text")))
    val input = MemoryStream[(Long, String)]
    val q = stage(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("smd").outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("smd")
        .as[(Long, Long, Long, String, String)].collect().toSet
      val batch = stage(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, String, String)].collect().toSet
      assert(streamed == batch)
      val byId = streamed.map(r => r._1 -> r).toMap
      // markdown ran before corruption: fence content gone everywhere
      assert(!byId(1L)._4.contains("drop me") && !byId(1L)._5.contains("drop me"))
      assert(byId(1L)._3 >= 1L, "long docs must actually mask")
    } finally q.stop()
  }
}
