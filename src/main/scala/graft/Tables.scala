package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver corpus (TESTDATA.md) and any staged
  * output. One file per table: `{dir}/{name}.parquet`.
  *
  * Scale note: `spark.read.parquet` is a DataSource V2 scan — filter pushdown
  * and column pruning reach the parquet reader, so callers should express
  * predicates/projections on the returned DataFrame rather than collecting.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` ships with INT64 TIMESTAMP(NANOS) — a parquet type Spark 4
    * refuses outright ([PARQUET_TYPE_ILLEGAL]). Sessions that read it must
    * set `spark.sql.legacy.parquet.nanosAsLong=true` AT BUILD TIME (Verify,
    * Bench and the test harness all do) so the nanos arrive as a long; this
    * loader then truncates to microseconds, which matches DuckDB's
    * `epoch_us` truncation on the same column, so oracle comparisons on
    * derived integer times are exact. The conf is required at session build
    * rather than set here: a mid-session `conf.set` would silently change
    * the behavior of every other parquet read (round-2 verdict finding #6).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events.parquet")
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (df.schema("ts").dataType == TimestampNTZType)
      // Corpus revisions ship plain TIMESTAMP(MICROS) with no UTC flag;
      // Spark 4 infers TIMESTAMP_NTZ, which unix_micros/window reject.
      // The session timezone is pinned UTC, so the NTZ→LTZ cast maps each
      // wall-clock to the same instant DuckDB's naive read uses — derived
      // epoch-microsecond comparisons stay exact.
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }
}
