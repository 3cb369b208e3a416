package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("schema_evo").toString

  test("added columns backfill NULL on pre-revision files") {
    val out = tmp()
    Seq((1L, 10L), (2L, 20L)).toDF("id", "len")
      .write.parquet(out + "/rev=1")
    Seq((3L, 30L, "en"), (4L, 40L, "de")).toDF("id", "len", "lang")
      .write.parquet(out + "/rev=2")
    val merged = SchemaEvolution.readMerged(spark, out)
    assert(merged.columns.toSet === Set("id", "len", "lang", "rev"))
    val langs = merged.select($"id", $"lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(langs === Map(1L -> None, 2L -> None, 3L -> Some("en"), 4L -> Some("de")))
  }

  test("an incompatible type change fails loudly with the column named") {
    val out = tmp()
    Seq((1L, 10L)).toDF("id", "len").write.parquet(out + "/rev=1")
    Seq((2L, "not a number")).toDF("id", "len").write.parquet(out + "/rev=2")
    val e = intercept[IllegalStateException](
      SchemaEvolution.readMerged(spark, out).collect())
    assert(e.getMessage.contains("incompatible column-type change"))
    assert(e.getMessage.toLowerCase.contains("len"))
  }

  test("revision report counts rows and added-column coverage per revision") {
    val out = tmp()
    Seq((1L, 10L), (2L, 20L), (5L, 50L)).toDF("id", "len")
      .write.parquet(out + "/rev=1")
    Seq((3L, 30L, "en"), (4L, 40L, null.asInstanceOf[String]))
      .toDF("id", "len", "lang").write.parquet(out + "/rev=2")
    val rep = SchemaEvolution.revisionReport(
        SchemaEvolution.readMerged(spark, out), "rev", Seq("lang"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rep === Map(1 -> ((3L, 0L)), 2 -> ((2L, 1L))))
  }
}
