package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import graft.model.HeaderRecord

/** S4 — corruption-injection fixture writer (ref file_corruption.py:15-34):
  * the reference deletes the FITS `END` card and writes `*_corrupted` so the
  * S2 verify step can be shown to reject it. The Parquet analog breaks the
  * declared schema on purpose — dropping a required column or retyping one —
  * and writes to the same `{base}_corrupted` staged name (C11).
  */
object Corruption {

  /** Write a copy of `df` with `dropColumn` removed (schema-breaking). */
  def writeDroppedColumn(df: DataFrame, basePath: String, dropColumn: String): String = {
    val out = HeaderRecord.stagedPath(basePath, "corrupted")
    df.drop(dropColumn).write.mode(SaveMode.Overwrite).parquet(out)
    out
  }

  /** Write a copy of `df` with `column` cast to string (dtype-breaking). */
  def writeRetypedColumn(df: DataFrame, basePath: String, column: String): String = {
    val out = HeaderRecord.stagedPath(basePath, "corrupted")
    df.withColumn(column, col(column).cast("string"))
      .write.mode(SaveMode.Overwrite).parquet(out)
    out
  }
}
