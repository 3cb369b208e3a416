package graft.llm

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkTestBase

/** Mojibake repair: the closed cp1252 double-encoding table, the repair
  * chain, and the report shape.
  */
class EncodingRepairSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val cp1252 = Charset.forName("windows-1252")
  private def moji(s: String): String = new String(s.getBytes(UTF_8), cp1252)

  private def fix(text: String): String =
    Seq(text).toDF("text")
      .select(EncodingRepair.fixMojibake($"text")).as[String].head()

  test("every table entry round-trips: corrupting the target yields the pattern") {
    EncodingRepair.Repairs.foreach { case (pattern, target) =>
      assert(moji(target) == pattern, s"table pattern for '$target' is stale")
      assert(fix(pattern) == target)
    }
  }

  test("hand fixtures: classic litter sequences repair in context") {
    assert(fix("CafÃ© au lait") == "Café au lait")
    assert(fix(moji("don’t stop — ever…")) == "don’t stop — ever…")
    assert(fix(moji("€49 für Müller")) == "€49 für Müller")
    // ” (U+201D) is deliberately OUTSIDE the table: its mojibake crosses
    // cp1252's unmapped 0x9D, so its litter passes through untouched.
    assert(fix(moji("”")) == moji("”"))
  }

  test("clean text passes through identical and unflagged") {
    val ascii = "plain ascii text, no litter 123"
    assert(fix(ascii) == ascii)
    val rows = EncodingRepair.report(
        Seq((1L, ascii), (2L, "CafÃ©")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Boolean, String)].collect()
    assert(rows === Array((1L, false, ascii), (2L, true, "Café")))
  }

  test("idempotent: repairing repaired text changes nothing") {
    val once = fix(moji("déjà vu — “fin"))
    assert(once == "déjà vu — “fin")
    assert(fix(once) == once)
  }

  test("streaming twin: the repair report streams like batch (pure map)") {
    // The chain is stateless codegen'd replaces, so the SAME report
    // definition serves the backfill and the live-ingest path — the
    // StreamingQualityGates contract, extended to the encoding pass.
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "clean ascii"), (2L, moji("naïve – “quote”")),
      (3L, "CafÃ© â€” rue de l'Ã©glise"))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = EncodingRepair.report(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("fixenc")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("fixenc")
        .as[(Long, Boolean, String)].collect().toSet
      val batch = EncodingRepair.report(rows.toDF("doc_id", "text"),
        "doc_id", "text").as[(Long, Boolean, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed.map(r => r._1 -> r._2) ===
        Set(1L -> false, 2L -> true, 3L -> true))
    } finally q.stop()
  }
}
