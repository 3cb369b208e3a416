package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the `Tables.events` timestamp normalization across corpus
  * revisions: the TIMESTAMP_NTZ (plain MICROS, no UTC flag) branch must
  * yield the instant type with epoch-microsecond values unchanged — the
  * INT64-NANOS branch is exercised by every suite reading the driver
  * corpus through SparkTestBase.
  */
class TablesSpec extends SparkTestBase {

  test("TIMESTAMP_NTZ events normalize to TimestampType with exact unix_micros") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("tables_ntz").toString
    val micros = Seq(0L, 1700000000000001L, 915148800000000L)
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("us").as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val read = Tables.events(s, dir)
    assert(read.schema("ts").dataType === TimestampType)
    val got = read.select(unix_micros(col("ts")).as("us")).as[Long]
      .collect().sorted
    assert(got === micros.sorted.toArray)
  }

  test("events refuses a non-UTC session loudly") {
    val s = spark
    val prev = s.conf.get("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](
        Tables.events(s, "/root/testdata/sf0.001"))
      assert(e.getMessage.contains("UTC"))
    } finally s.conf.set("spark.sql.session.timeZone", prev)
  }
}
