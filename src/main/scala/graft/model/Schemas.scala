package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the SDFITS-shaped observation data model
  * (SURVEY.md §1; ref validate.py:18-23 — header + binary table with one
  * fixed-length float vector column `DATA` per integration sample).
  *
  * Schemas are fixed/declared (SDFITS convention), never inferred: readers
  * pass [[observation]] to `spark.read.schema(...)` with FAILFAST so a
  * corrupt file fails the structural check up front (S2 — the Spark analog
  * of `hdul.verify('exception')`, ref validate.py:20).
  */
object Schemas {

  /** Column names whose values must be non-negative (F4, ref validate.py:56-57). */
  val nonNegativeColumns: Seq[String] = Seq(
    "DURATION", "EXPOSURE", "TSYS", "TCAL", "LST", "ELEVATIO", "TAMBIENT",
    "PRESSURE", "HUMIDITY", "RESTFREQ", "FREQRES", "TRGTLONG", "MJD", "UTSECS")

  /** One row per integration sample (ref §1.2 effective schema). `ROWIDX`
    * pins ingest order — the reference relies on file row order (SURVEY §2.6);
    * a distributed engine must carry the order explicitly.
    */
  val observation: StructType = StructType(Seq(
    StructField("FILE_ID", StringType, nullable = false),
    StructField("ROWIDX", LongType, nullable = false),
    StructField("DATE_OBS", TimestampType, nullable = true),
    StructField("DATA", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("IFNUM", IntegerType, nullable = true),
    StructField("PLNUM", IntegerType, nullable = true),
    StructField("CALSTATE", IntegerType, nullable = true),
    StructField("SWPVALID", IntegerType, nullable = true),
    StructField("OBSMODE", StringType, nullable = true)
  ) ++ nonNegativeColumns.map(StructField(_, DoubleType, nullable = true)))

  /** Per-file header sidecar (ref §1.1: `hdul[0].header`). */
  val header: StructType = StructType(Seq(
    StructField("FILE_ID", StringType, nullable = false),
    StructField("DATE", TimestampType, nullable = true),
    StructField("OBSMODE", StringType, nullable = true),
    StructField("OBSFREQ", DoubleType, nullable = true),
    StructField("OBSBW", DoubleType, nullable = true),
    StructField("HISTORY_RAW", ArrayType(StringType), nullable = true)
  ))
}
