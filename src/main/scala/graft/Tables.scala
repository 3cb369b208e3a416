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

  /** `events` ships as INT64 TIMESTAMP(NANOS) in some corpus revisions — a
    * parquet type Spark 4 refuses outright ([PARQUET_TYPE_ILLEGAL]) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` is set AT BUILD TIME
    * (Verify, Bench and the test harness all do) so the nanos arrive as a
    * long; this loader then truncates to microseconds, which matches
    * DuckDB's `epoch_us` truncation on the same column, so oracle
    * comparisons on derived integer times are exact. MICROS-revision
    * corpora read fine without the conf, so it is NOT required up front —
    * a NANOS read that fails for lack of it is rethrown with the fix
    * spelled out. The conf must come from session build rather than a
    * `conf.set` here: a mid-session set would silently change the behavior
    * of every other parquet read (round-2 verdict finding #6).
    *
    * The session timezone must be UTC: both normalizations below target the
    * instant type, and the NANOS div-1000 long as well as the NTZ
    * wall-clock only map to DuckDB's naive epoch values when no zone offset
    * intervenes. Asserted here rather than assumed, so a future non-UTC
    * session fails loudly instead of silently shifting every derived
    * epoch-microsecond value (round-9 advice).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.session.timeZone", "") == "UTC",
      "set spark.sql.session.timeZone=UTC at session build to read events.parquet " +
        "(instant normalization below is only DuckDB-exact under UTC)")
    def mentionsNanos(t: Throwable): Boolean = {
      var cur = t
      while (cur != null) {
        if (String.valueOf(cur.getMessage).contains("PARQUET_TYPE_ILLEGAL")) return true
        cur = cur.getCause
      }
      false
    }
    val df =
      try load(spark, dir, "events")
      catch {
        // Walk the cause chain: Spark may surface the schema-conversion
        // failure wrapped in a SparkException whose own message lacks the
        // error class, and the remediation hint must not be lost.
        case e: Throwable
            if mentionsNanos(e) &&
              spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true" =>
          throw new IllegalStateException(
            "events.parquet carries INT64 TIMESTAMP(NANOS); set " +
              "spark.sql.legacy.parquet.nanosAsLong=true at session build to read it", e)
      }
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
