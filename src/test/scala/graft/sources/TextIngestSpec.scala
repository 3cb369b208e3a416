package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** JSONL ingestion with quarantine: good/bad split, raw-line preservation,
  * missing-field leniency vs parse-failure strictness.
  */
class TextIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("good rows parse, malformed lines quarantine with their raw bytes") {
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    val f = new java.io.File(dir, "corpus.jsonl")
    Files.write(f.toPath, Seq(
      """{"id": 1, "text": "hello"}""",
      """{broken json""",
      """{"id": 2, "text": "world"}""",
      """not json at all""",
      """{"id": 3}""" // parses; missing field is null, NOT quarantined
    ).mkString("\n").getBytes("UTF-8"))
    val (good, bad) = TextIngest.readJsonl(spark, f.getAbsolutePath, schema)
    assert(good.schema.fieldNames.toSeq == Seq("id", "text"))
    val rows = good.as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, Some("hello")), (2L, Some("world")), (3L, None)))
    val q = bad.as[String].collect().toSet
    assert(q == Set("{broken json", "not json at all"),
      "quarantine must keep the raw line for replay")
  }

  test("streaming ingest: arriving files split into good rows and quarantine") {
    val dir = Files.createTempDirectory("graft-jsonl-stream").toFile
    Files.write(new java.io.File(dir, "batch1.jsonl").toPath, Seq(
      """{"id": 1, "text": "alpha"}""",
      """}{ mangled""",
      """{"id": 2, "text": "beta"}"""
    ).mkString("\n").getBytes("UTF-8"))
    val (good, bad) = TextIngest.readJsonlStream(spark, dir.getAbsolutePath, schema)
    assert(good.isStreaming && bad.isStreaming)
    val q1 = good.writeStream.format("memory").queryName("ti_good").start()
    val q2 = bad.writeStream.format("memory").queryName("ti_bad").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val g = spark.table("ti_good").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(g == Seq((1L, "alpha"), (2L, "beta")))
      assert(spark.table("ti_bad").as[String].collect().toSeq == Seq("}{ mangled"))
      // a second file arrives: only its rows append
      Files.write(new java.io.File(dir, "batch2.jsonl").toPath,
        """{"id": 3, "text": "gamma"}""".getBytes("UTF-8"))
      q1.processAllAvailable()
      assert(spark.table("ti_good").count() == 3)
    } finally { q1.stop(); q2.stop() }
  }

  test("csv: good rows parse, wrong arity and untypeable fields quarantine") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csvingest")
    val f = dir.resolve("part.csv").toFile
    java.nio.file.Files.write(f.toPath,
      ("1,en,100\n" +
       "notanumber,de,50\n" +   // untypeable id → quarantine
       "2,fr\n" +               // wrong arity → quarantine
       "3,es,75\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    val (good, bad) = TextIngest.readCsv(spark, f.getAbsolutePath, schema)
    val g = good.orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(g == Seq((1L, "en", 100L), (3L, "es", 75L)))
    val b = bad.as[String].collect().toSet
    assert(b == Set("notanumber,de,50", "2,fr"))
  }

  test("schema may not claim the corrupt-record column") {
    val dir = Files.createTempDirectory("graft-jsonl-clash").toFile
    val f = new java.io.File(dir, "x.jsonl")
    Files.write(f.toPath, "{}".getBytes("UTF-8"))
    val clash = StructType(Seq(StructField(TextIngest.CorruptCol, StringType)))
    intercept[IllegalArgumentException] {
      TextIngest.readJsonl(spark, f.getAbsolutePath, clash)
    }
  }
}
