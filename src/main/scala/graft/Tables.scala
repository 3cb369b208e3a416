package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
