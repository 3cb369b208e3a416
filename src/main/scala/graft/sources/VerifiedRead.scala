package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** S2 — structural verification on read (ref validate.py:20
  * `hdul.verify('exception')`): the Spark analog enforces the DECLARED schema
  * against the file's actual footer schema and rejects the file up front.
  *
  * Parquet is self-describing, so unlike CSV/JSON a wrong `.schema(...)`
  * hint only fails lazily at scan time; the eager footer comparison here
  * makes corruption (a dropped/retyped column — the S4 fixture) fail fast at
  * plan time, matching the reference's verify-on-open semantics.
  */
object VerifiedRead {

  final case class SchemaViolation(msg: String) extends RuntimeException(msg)

  private def shape(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.sql))

  /** Read `path` asserting its schema matches `expected` (names in order +
    * types; nullability is not part of the reference's dtype check — same
    * policy as U1's merge validation).
    */
  def parquet(spark: SparkSession, path: String, expected: StructType): DataFrame = {
    val df = spark.read.parquet(path)
    if (shape(df.schema) != shape(expected))
      throw SchemaViolation(
        s"Schema verification failed for $path: expected ${shape(expected)}, found ${shape(df.schema)}")
    df
  }
}
